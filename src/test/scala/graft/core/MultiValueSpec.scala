package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultiValueSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("c").select(MultiValue.normalize(col("c")))
      .collect().head.getString(0)

  test("dedupe preserves first-seen order (tm_polars.py:69 semantics)") {
    assert(norm("b\\\\a\\\\b\\\\c\\\\a") == "b\\\\a\\\\c")
  }

  test("tokens are trimmed and empties dropped") {
    assert(norm(" b \\\\\\\\ a ") == "b\\\\a")
  }

  test("all-empty input normalizes to null") {
    val r = Seq(" \\\\ ").toDF("c").select(MultiValue.normalize(col("c")))
      .collect().head
    assert(r.isNullAt(0))
    val n = Seq((null: String)).toDF("c")
      .select(MultiValue.normalize(col("c"))).collect().head
    assert(n.isNullAt(0))
  }

  test("single value round-trips unchanged") {
    assert(norm("Beethoven") == "Beethoven")
  }

  test("isMulti flags only delimiter-bearing cells (candidate filter)") {
    val r = Seq("a\\\\b", "a", null).toDF("c")
      .select(MultiValue.isMulti(col("c"))).collect()
    assert(r(0).getBoolean(0))
    assert(!r(1).getBoolean(0))
    assert(!r(2).getBoolean(0)) // null-safe: false, not null
  }

  test("tokenCount counts non-empty tokens") {
    val r = Seq("a\\\\b\\\\b", "", "x").toDF("c")
      .select(MultiValue.tokenCount(col("c"))).collect()
    assert(r.map(_.getInt(0)).toSeq == Seq(3, 0, 1))
  }
}
