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
