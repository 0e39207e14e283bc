package graft.operators

/** Shared plain-Scala synchronous LPA replay: per round every node
  * adopts the most frequent label among neighbors + self, ties toward
  * the smallest label — the exact update [[Graph.labelCommunities]]
  * declares relationally. One replay, used by both BatchR16Spec and
  * BatchR17Spec, so a tie-break or self-vote change can never leave
  * the two specs pinning different semantics. */
object LpaReplay {
  def apply(und: Set[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val nodes = und.flatMap(e => Seq(e._1, e._2))
    // adjacency once, O(edges) — not a full edge-set scan per node
    // per round
    val adj = und.toSeq.groupBy(_._1)
      .map { case (a, es) => a -> es.map(_._2) }
      .withDefaultValue(Seq.empty[Long])
    var lbl = nodes.map(n => n -> n).toMap
    (1 to rounds).foreach { _ =>
      lbl = nodes.map { n =>
        val votes = adj(n).map(lbl)
        val tally = (votes :+ lbl(n)).groupBy(identity)
          .map { case (l, v) => (l, v.size.toLong) }
        n -> tally.toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    lbl
  }
}
