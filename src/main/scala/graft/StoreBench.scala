package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the snapshot-store RETRACTION DISCOVERY cost the
  * id→batch manifest exists to remove: finding which batch
  * partitions hold the retracted ids by scanning the id column of
  * EVERY store partition (the manifest-less fallback) vs probing
  * the doc-count-sized manifest. Times the exact two expressions
  * [[graft.operators.Incremental.retractFromSnapshotStore]] runs —
  * semi-join on the ids, distinct batch values, collect — over a
  * real tf-snapshot store built from the given dataset, 3 reps
  * each, medians reported. Prints one JSON line (the Bench
  * convention).
  *
  * Usage: runMain graft.StoreBench <sfDir> [label]
  */
object StoreBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val label = if (args.length > 1) args(1) else sfDir
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val dir = s"/tmp/graft_storebench_${System.nanoTime()}/s"
    val I = graft.operators.Incremental
    val S = graft.operators.Search
    // two crawl eras, as the store queries build it — manifested, so
    // BOTH discovery paths exist against the same layout
    I.initSnapshotStore(
      S.tfSnapshot(docs.filter(col("doc_id") % 2 === 0), "doc_id",
        "text"), dir, manifestIdCol = Some("doc_id"))
    I.commitSnapshotBatch(
      S.tfSnapshot(docs.filter(col("doc_id") % 2 =!= 0), "doc_id",
        "text"), dir, 1L, manifestIdCol = Some("doc_id"))
    val ids = docs.filter(col("doc_id") % 10 === 3).select("doc_id")
      .localCheckpoint(true)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    // the manifest-less fallback: id column over EVERY partition
    def scanDiscovery(): Unit =
      spark.read.parquet(dir).join(ids, Seq("doc_id"), "left_semi")
        .select("batch").distinct().collect()
    // the manifested path: one probe of the doc-count-sized manifest
    def manifestDiscovery(): Unit =
      spark.read.parquet(dir + "__manifest")
        .join(ids, Seq("doc_id"), "left_semi")
        .select("batch").distinct().collect()
    val storeRows = spark.read.parquet(dir).count()
    val manifestRows = spark.read.parquet(dir + "__manifest").count()
    val scan = (1 to 3).map(_ => time(scanDiscovery()))
    val probe = (1 to 3).map(_ => time(manifestDiscovery()))
    // Locale.ROOT, the Bench convention: a comma-decimal default
    // locale would emit invalid JSON
    def n(x: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, x)
    def arr(xs: Seq[Double]) = xs.map(n).mkString("[", ",", "]")
    println(
      s"""{"metric":"store_discovery","unit":"sec","sf":"$label",""" +
        s""""store_rows":$storeRows,"manifest_rows":$manifestRows,""" +
        s""""scan_median":${n(median(scan))},""" +
        s""""scan_runs":${arr(scan)},""" +
        s""""manifest_median":${n(median(probe))},""" +
        s""""manifest_runs":${arr(probe)}}""")
    spark.stop()
  }
}
