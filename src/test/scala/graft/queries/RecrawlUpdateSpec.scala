package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The recrawl-update sweep (d91) around what the DuckDB oracle gate
  * cannot see: that the update_in/update_out flip is EXACTLY the
  * planted token postings changing hands (the oracle pins the
  * values; this pins the mechanism — the stale token leaves every
  * served artifact, the fresh one arrives, and nothing else about
  * the update changes index cardinality), and that re-invocation is
  * idempotent even though the query persists a scratch IVF-PQ layout
  * and then removes from and appends to it. */
class RecrawlUpdateSpec extends SparkSpec {

  test("recrawl update: the planted tokens change hands and the " +
    "index cardinality is invariant") {
    val rows = graft.SparkEntry.queries("d91_recrawl_update")(
      spark, sf0001).collect()
    assert(rows.length == 9)
    def row(a: String) = rows.find(_.getAs[String]("artifact") == a).get
    val nUpd = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") % 10 === 4).count()
    assert(nUpd >= 1)
    // the stale token: one posting per updated doc before, gone after
    val out = row("update_out")
    assert(out.getAs[Long]("rows_before") == nUpd)
    assert(out.getAs[Long]("mass_before") == nUpd)
    assert(out.getAs[Long]("rows_after") == 0L)
    assert(out.getAs[Long]("mass_after") == 0L)
    // the fresh token: absent before, one posting per updated doc after
    val in = row("update_in")
    assert(in.getAs[Long]("rows_before") == 0L)
    assert(in.getAs[Long]("rows_after") == nUpd)
    assert(in.getAs[Long]("mass_after") == nUpd)
    // an update never changes how many vectors the layout serves —
    // remove_ids + add keeps exactly one code row set per id
    val pq = row("ivfpq_codes")
    assert(pq.getAs[Long]("rows_before") == pq.getAs[Long]("rows_after"))
    assert(pq.getAs[Long]("mass_before") == pq.getAs[Long]("mass_after"))
    // same invariance for the band table (retract-old + re-band-new
    // keeps exactly 64 band rows per doc); content change is proven
    // by the oracle-gated lifecycle queries, not cardinality
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    val lsh = row("lsh_bands")
    assert(lsh.getAs[Long]("rows_before") == 64L * nDocs)
    assert(lsh.getAs[Long]("rows_after") == 64L * nDocs)
    assert(lsh.getAs[Long]("mass_before") == nDocs)
    assert(lsh.getAs[Long]("mass_after") == nDocs)
  }

  test("recrawl update: re-invocation is idempotent (the persisted " +
    "layout resets; remove + add do not compound)") {
    val first = graft.SparkEntry.queries("d91_recrawl_update")(
      spark, sf0001).collect().toSeq
    val second = graft.SparkEntry.queries("d91_recrawl_update")(
      spark, sf0001).collect().toSeq
    assert(first == second)
  }
}
