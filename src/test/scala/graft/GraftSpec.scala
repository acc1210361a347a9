package graft

import org.apache.spark.sql.functions._

class GraftSpec extends SparkSpec {
  import spark.implicits._

  test("dedupNearExact keeps one canonical doc per near-dup cluster") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "a totally unrelated piece of text goes right here"))
      .toDF("doc_id", "text")
    val out = Graft.dedupNearExact(docs, "doc_id", "text", k = 3, theta = 0.7)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(1L, 3L)) // 2 deduped against keeper 1
  }

  test("facade pass-throughs: kMeans, dsirScores, asofJoin tolerance") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val km = Graft.kMeans(emb, "vec_id", "embedding", k = 3, iters = 1)
    assert(km.columns.toSeq == Seq("vec_id", "cluster") && km.count() > 0)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val ds = Graft.dsirScores(docs, "doc_id", "text", col("lang") === "en")
    assert(ds.columns.contains("score_micros") && ds.count() > 0)
    // tolerance reaches the operator through the facade: a build row
    // 100 units older than the probe nulls out at tolerance 50
    val probe = Seq((1L, 1000L)).toDF("k", "ts")
    val build = Seq((1L, 900L, "x")).toDF("k", "ts", "v")
    val hit = Graft.asofJoin(probe, build, "k", "ts", "v", Seq("v"))
      .collect().head
    assert(hit.getAs[String]("asof_v") == "x")
    val miss = Graft.asofJoin(probe, build, "k", "ts", "v", Seq("v"),
      tolerance = 50L).collect().head
    assert(miss.isNullAt(miss.fieldIndex("asof_v")))
  }

  test("install registers SQL functions and the optimizer rule") {
    Graft.install(spark)
    val u = spark.sql(
      "SELECT uuid5('6ba7b810-9dad-11d1-80b4-00c04fd430c8', 'python.org')")
      .collect().head.getString(0)
    assert(u == "886313e1-3b8a-5372-9b90-0c9aee199e5d")
    assert(spark.experimental.extraOptimizations
      .contains(graft.plans.CollapseRedundantArrayOps))
  }
}
