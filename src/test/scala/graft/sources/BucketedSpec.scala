package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketedSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(f: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def ab(prefix: String): (String, String) = {
    val a = spark.range(0, 1000).select(col("id").as("k"),
      (col("id") * 2).as("va"))
    val b = spark.range(0, 1000).select(col("id").as("k"),
      (col("id") * 3).as("vb"))
    Bucketed.writeBucketed(a, s"${prefix}_a", "k", buckets = 4, Seq("k"))
    Bucketed.writeBucketed(b, s"${prefix}_b", "k", buckets = 4, Seq("k"))
    (s"${prefix}_a", s"${prefix}_b")
  }

  test("bucketed co-located join runs with no key shuffle") {
    val (ta, tb) = ab("bjoin")
    // disable broadcast so the join actually exercises the clustering
    // (at real scale neither side of a fact-fact join broadcasts —
    // that asymmetry is why the bucketed layout exists)
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table(ta).join(spark.table(tb), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      // identical bucket clustering on both sides: the join needs NO
      // exchange at all — this is the whole point of the layout
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(joined.count() == 1000L)
      val r = joined.filter(col("k") === 7).collect().head
      assert(r.getAs[Long]("va") == 14L && r.getAs[Long]("vb") == 21L)
    }
  }

  test("bucket pruning: a key-equality filter reads one bucket") {
    val (ta, _) = ab("bprune")
    // autoBucketedScan drops the bucketed layout when the planner sees
    // no join/agg to feed; force it so the filter prunes buckets
    withConf(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
      val one = spark.table(ta).filter(col("k") === 42)
      val p = one.queryExecution.executedPlan.toString
      assert(p.contains("SelectedBucketsCount: 1 out of 4"), p)
      assert(one.count() == 1L)
    }
  }

  test("writeBucketed survives a stale warehouse directory") {
    // a REAL stale dir: files on disk under the table's warehouse
    // location with NO catalog entry (what a dead session leaves
    // behind — DROP TABLE can't see it, saveAsTable refuses over it)
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "bstale_t")
    spark.range(3).write.mode("overwrite").parquet(loc.toString)
    spark.sql("DROP TABLE IF EXISTS bstale_t") // no-op: not in catalog
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(loc), "precondition: stale dir exists, uncatalogued")

    val a = spark.range(0, 10).select(col("id").as("k"), col("id").as("va"))
    Bucketed.writeBucketed(a, "bstale_t", "k", buckets = 2)
    assert(spark.table("bstale_t").count() == 10L)
  }
}
