package graft.util

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** The one place directory listing/walking happens: `Files.list` and
  * `Files.walk` hold an open directory fd until the STREAM is closed —
  * exhausting the iterator is not enough — and a long-lived session
  * leaking one fd per call exhausts the process limit. Every call site
  * in this repo goes through these helpers so the convention is
  * structural, not copy-pasted.
  */
private[graft] object Dirs {

  /** Run `f` over the entries of `p`, closing the stream afterwards. */
  def listDir[A](p: Path)(f: Iterator[Path] => A): A = {
    val s = Files.list(p)
    try f(s.iterator.asScala) finally s.close()
  }

  /** Delete `p` recursively (children before parents); no-op when
    * absent. */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      val all = try s.iterator.asScala.toSeq finally s.close()
      all.reverse.foreach(f => Files.deleteIfExists(f))
    }
}
