package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "good clean fluent prose here", true),
    (2L, "good fluent writing clean style", true),
    (3L, "clean prose style good here", true),
    (4L, "zzz spam junk qqq xxx", false),
    (5L, "spam zzz qqq junk noise", false),
    (6L, "", false)) // token-less: must score exactly 1/2, pred false
    .toDF("doc_id", "text", "lbl")

  test("lrQualityScores separates a separable corpus in two steps") {
    val out = QualityModel.lrQualityScores(docs, "doc_id", "text",
        label = col("lbl"), dims = 64, steps = 2, eta = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // positive-token docs score above 1/2, negative below
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id)._2 > 500000L && out(id)._3, s"doc $id should pass")
    }
    Seq(4L, 5L).foreach { id =>
      assert(out(id)._2 < 500000L && !out(id)._3, s"doc $id should fail")
    }
    // no evidence -> sigma(0) = 1/2 exactly, strict > keeps nothing
    assert(out(6L) == ((0L, 500000L, false)))
  }

  test("lrQualityScores is invariant under repartitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      QualityModel.lrQualityScores(df, "doc_id", "text",
        label = col("lbl"), dims = 64, steps = 2, eta = 0.5)
        .collect().map(_.toSeq).toSet
    assert(run(docs) == run(docs.repartition(7)))
  }
}
