package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some("a"), Some(1.25)),
    (Some(2L), Some("a"), Some(-0.4)),
    (Some(2L), None, Some(10.0)),
    (None, Some("b"), None))
    .toDF("k", "s", "v")

  test("profile: one row per column with counts and canonical min/max") {
    val p = Profile.profile(df, Seq("k", "s", "v")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.size == 3)
    val k = p("k")
    assert(k.getLong(1) == 4L && k.getLong(2) == 1L && k.getLong(3) == 2L)
    assert(k.getString(4) == "1" && k.getString(5) == "2")
    val s = p("s")
    assert(s.getLong(2) == 1L && s.getLong(3) == 2L)
    assert(s.getString(4) == "a" && s.getString(5) == "b")
    // doubles canonicalize to integer cents
    val v = p("v")
    assert(v.getString(4) == "-40" && v.getString(5) == "1000")
  }

  test("profile: approx mode swaps in HLL distinct counts") {
    val p = Profile.profile(df, Seq("k"), approx = true).collect().head
    // HLL is exact at this cardinality; the point is the code path runs
    assert(p.getLong(3) == 2L)
  }
}
