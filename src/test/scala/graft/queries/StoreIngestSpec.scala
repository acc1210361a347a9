package graft.queries

import graft.SparkSpec

/** The store-served ingest flagship (d92) around what the DuckDB
  * oracle gate cannot see: the funnel's structural invariants (a
  * screen can only shrink the batch), that the mid-sequence takedown
  * STRICTLY widens the near-dup survivor set (the planted partner
  * doc 1 is %3==1 at every scale, so its incoming twin doc 0 flips
  * phases by construction), and that re-invocation is idempotent
  * even though the query initializes and then mutates two durable
  * stores (init must reset both or a second run double-counts and
  * double-bands). */
class StoreIngestSpec extends SparkSpec {

  private def funnel() = graft.SparkEntry
    .queries("d92_store_ingest")(spark, sf0001).collect()
    .map(r => (r.getAs[String]("phase"), r.getAs[Int]("stage_idx")) ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("id_checksum"))).toMap

  test("store ingest: funnel shape, monotone doc counts, and the " +
    "takedown's strict stage-2 widening") {
    val f = funnel()
    assert(f.size == 10)
    for (p <- Seq("committed", "retracted")) {
      // each screen stage can only drop docs; the line screen (3)
      // keeps doc count and can only shrink chars
      val n = (0 to 4).map(i => f((p, i))._1)
      assert(n == n.sorted.reverse, s"$p n_docs not monotone: $n")
      assert(f((p, 3))._1 == f((p, 2))._1)
      assert(f((p, 3))._2 <= f((p, 2))._2)
      // exact dedup drops at least the %500==5 template clone
      assert(f((p, 1))._1 < f((p, 0))._1)
      // the near-dup screen drops at least the planted doc 0 in the
      // committed phase
      assert(f((p, 2))._1 < f((p, 1))._1 || p == "retracted")
    }
    // the takedown strips existing near-dup partners (doc 1 is
    // %3==1), so the retracted serve flags STRICTLY fewer incoming
    // docs: stage 2 widens, and the freed docs carry chars through
    // the line screen
    assert(f(("retracted", 2))._1 > f(("committed", 2))._1)
    assert(f(("retracted", 3))._2 > f(("committed", 3))._2)
    // the incoming batch itself is phase-invariant
    assert(f(("retracted", 0)) == f(("committed", 0)))
    assert(f(("retracted", 1)) == f(("committed", 1)))
  }

  test("store ingest: re-invocation is idempotent (both stores " +
    "re-initialize; the tombstone batch does not compound)") {
    val first = funnel()
    val second = funnel()
    assert(first == second)
  }
}
