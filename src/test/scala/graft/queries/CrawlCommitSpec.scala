package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The crawl-commit sweep (d90) around what the DuckDB oracle gate
  * cannot see: that the delta_screen flip is EXACTLY the planted
  * banner (the oracle pins the values; this pins the mechanism), and
  * that re-invocation is idempotent even though the query persists a
  * scratch IVF-PQ layout and then appends to it (the static-overwrite
  * persist must reset the layout, or a second run double-adds). */
class CrawlCommitSpec extends SparkSpec {

  private val banner =
    "seasonal promotion banner from the newly committed crawl"

  test("crawl commit: the delta_screen flip is exactly the banner " +
    "lines the merge pushed over the threshold") {
    val rows = graft.SparkEntry.queries("d90_crawl_commit")(
      spark, sf0001).collect()
    assert(rows.length == 8)
    val scr = rows.find(_.getAs[String]("artifact") == "delta_screen").get
    // one banner line per % 10 == 8 doc in the incoming batch; all of
    // them survive the pre-commit screen (existing count = 2 < 3) and
    // drop under the merged one
    val nBanner = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") % 10 === 8).count()
    assert(nBanner >= 1)
    assert(scr.getAs[Long]("rows_before") - scr.getAs[Long]("rows_after")
      == nBanner)
    assert(scr.getAs[Long]("mass_before") - scr.getAs[Long]("mass_after")
      == nBanner * banner.length)
  }

  test("crawl commit: re-invocation is idempotent (the persisted " +
    "layout resets; the add does not compound)") {
    val first = graft.SparkEntry.queries("d90_crawl_commit")(
      spark, sf0001).collect().toSeq
    val second = graft.SparkEntry.queries("d90_crawl_commit")(
      spark, sf0001).collect().toSeq
    assert(first == second)
  }
}
