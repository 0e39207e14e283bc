package graft.streaming.bus

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._

import graft.engine.LHJson

/** A file-backed, partitioned, offset-addressed message bus with the
  * same integration surface as Kafka: named topics, dense per-partition
  * offsets, at-least-once producers, and a Structured Streaming
  * connector resolved BY NAME at runtime ([[BusDataSource]], format
  * `"graft-bus"`) whose offsets serialize in Kafka's exact JSON shape
  * (`{"topic":{"0":123}}`).
  *
  * WHY THIS EXISTS: the reference's entire transport is Kafka
  * (scheduler/SchedulerTopology.java:62-127), and the production wiring
  * here ([[graft.streaming.Scheduler.kafkaEventSource]]) is
  * `format("kafka")` — but this build environment has no Kafka
  * artifacts at all (zero egress; no kafka-clients, no spark-sql-kafka,
  * no embeddable broker), so that wiring cannot be executed in tests.
  * The bus makes the SAME code path executable: a connector looked up
  * through `DataSourceRegister` (the mechanism that resolves
  * `format("kafka")`), per-partition offset maps flowing through
  * checkpoints and progress in Kafka's JSON shape, a dynamic-topic
  * sink, and redelivery semantics. Swapping `graft-bus` → `kafka` plus
  * the bootstrap option is the ONLY difference between the e2e test
  * topology and the production one.
  *
  * Record layout: `<root>/<topic>/<partition>/<offset%020d>.rec`, one
  * JSON record per file, claimed under a JVM-wide per-partition lock
  * and published by atomic rename — readers never observe a partial
  * record, and offsets stay dense. (A multi-process deployment would
  * claim offsets with an O_EXCL create; irrelevant for the single-JVM
  * local-mode scope. At cluster scale you would not use this bus — you
  * would use Kafka.)
  */
object GraftBus {

  /** JVM-wide lock object per partition directory. */
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]
  private def lockFor(dir: Path): Object =
    locks.computeIfAbsent(dir.toString, _ => new Object)

  /** Per-partition next-offset cache: one directory listing at first
    * touch, then an in-memory counter bumped under the producer lock.
    * Without it every append re-lists the partition directory, making
    * a topic's producer cost O(records²) in file-system metadata ops —
    * the dominant term once a bench pushes tens of thousands of
    * records. Offsets stay dense (counter == published record count;
    * records are immutable and never deleted), and a fresh JVM re-derives
    * the counter from the same listing. */
  private val nextOffsets =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]

  private def partitionDir(root: String, topic: String, partition: Int): Path =
    Paths.get(root, topic, partition.toString)

  private def recName(offset: Long): String = f"$offset%020d.rec"

  /** Next unclaimed offset = number of records (offsets are dense). */
  def nextOffset(root: String, topic: String, partition: Int): Long = {
    val dir = partitionDir(root, topic, partition)
    val cached = nextOffsets.get(dir.toString)
    if (cached != null) cached.get()
    else if (!Files.isDirectory(dir)) 0L
    else counterFor(dir).get()
  }

  /** `Files.list` holds an open directory fd until the stream is
    * CLOSED — a polling consumer leaking one per call exhausts the fd
    * limit in seconds. Every listing goes through here. */
  private def listDir[A](dir: Path)(f: Iterator[Path] => A): A = {
    val s = Files.list(dir)
    try f(s.iterator.asScala) finally s.close()
  }

  private def counterFor(dir: Path): java.util.concurrent.atomic.AtomicLong =
    nextOffsets.computeIfAbsent(dir.toString, _ => {
      val n =
        if (!Files.isDirectory(dir)) 0L
        else listDir(dir)(_.count(_.getFileName.toString.endsWith(".rec")).toLong)
      new java.util.concurrent.atomic.AtomicLong(n)
    })

  /** Topics currently present under the root. */
  def topics(root: String): Seq[String] = {
    val r = Paths.get(root)
    if (!Files.isDirectory(r)) Nil
    else listDir(r)(_.filter(Files.isDirectory(_))
      .map(_.getFileName.toString).toSeq).sorted
  }

  /** Partition ids present for a topic (created lazily by producers). */
  def partitions(root: String, topic: String): Seq[Int] = {
    val t = Paths.get(root, topic)
    if (!Files.isDirectory(t)) Nil
    else listDir(t)(_.filter(Files.isDirectory(_))
      .flatMap(p => p.getFileName.toString.toIntOption).toSeq).sorted
  }

  /** Read records [from, until) of one partition. */
  def read(root: String, topic: String, partition: Int,
      from: Long, until: Long): Seq[BusRecord] =
    (from until until).map { off =>
      val f = partitionDir(root, topic, partition).resolve(recName(off))
      val o = LHJson.parse(
        new String(Files.readAllBytes(f), StandardCharsets.UTF_8))
        .asInstanceOf[ListMap[String, Any]]
      BusRecord(topic, partition, off,
        o.getOrElse("key", "").asInstanceOf[String],
        o.getOrElse("value", "").asInstanceOf[String],
        o.get("ts").map(_.toString.toLong).getOrElse(0L))
    }

  /** At-least-once producer append; returns (partition, offset) — the
    * RecordMetadata a Kafka producer would hand to the read-your-writes
    * barrier. `partition < 0` routes by key hash (Kafka's default
    * partitioner shape). */
  def send(root: String, topic: String, key: String, value: String,
      numPartitions: Int = 1, partition: Int = -1): (Int, Long) = {
    val p =
      if (partition >= 0) partition
      else math.floorMod(key.hashCode, math.max(numPartitions, 1))
    val dir = partitionDir(root, topic, p)
    Files.createDirectories(dir)
    val rec = LHJson.render(ListMap(
      "key" -> key, "value" -> value,
      "ts" -> System.currentTimeMillis()))
    lockFor(dir).synchronized {
      val counter = counterFor(dir)
      val off = counter.get()
      val tmp = Files.createTempFile(dir, ".claim-", ".tmp")
      Files.write(tmp, rec.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, dir.resolve(recName(off)),
        StandardCopyOption.ATOMIC_MOVE)
      // publish-then-increment: a reader that sees offset n+1 can
      // already read record n
      counter.incrementAndGet()
      (p, off)
    }
  }
}

/** One consumed record (the consumer-facing shape of the Kafka record:
  * topic/partition/offset coordinates + key/value payload). */
case class BusRecord(
    topic: String, partition: Int, offset: Long,
    key: String, value: String, timestampMs: Long)
