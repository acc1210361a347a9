package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("mergeRollups over any batch split equals the full recompute") {
    val rows = Seq(
      ("a", 1L, 10L), ("a", 2L, 5L), ("a", 3L, 7L),
      ("b", 4L, 2L), ("b", 5L, 9L), ("c", 6L, 4L))
      .toDF("k", "id", "v")
    def agg(df: org.apache.spark.sql.DataFrame) = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"),
        min("v").as("lo"), max("v").as("hi"))
    val full = agg(rows).collect().map(_.toSeq).toSet
    // a 3-way split on id, including an empty partial for key 'c'
    val merged = Incremental.mergeRollups(
        Seq(agg(rows.filter(col("id") <= 2)),
          agg(rows.filter(col("id") > 2 && col("id") <= 4)),
          agg(rows.filter(col("id") > 4))),
        Seq("k"),
        Seq("n" -> "sum", "s" -> "sum", "lo" -> "min", "hi" -> "max"))
      .collect().map(_.toSeq).toSet
    assert(merged == full)
  }

  test("mergeRollups rejects non-mergeable aggregate names") {
    val p = Seq(("a", 1L)).toDF("k", "n")
    intercept[IllegalArgumentException] {
      Incremental.mergeRollups(Seq(p), Seq("k"), Seq("n" -> "avg"))
        .collect()
    }
  }
}
