package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExprsSpec extends SparkSpec {
  import spark.implicits._

  private def one(in: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String = {
    val r = Seq(in).toDF("c").select(f(col("c"))).collect().head
    if (r.isNullAt(0)) null else r.get(0).toString
  }

  test("albumRoot collapses trailing disc folders, case-insensitive") {
    assert(one("/m/Album/cd 1", Exprs.albumRoot) == "/m/Album")
    assert(one("/m/Album/Disc02", Exprs.albumRoot) == "/m/Album")
    assert(one("/m/Album/CD 003", Exprs.albumRoot) == "/m/Album")
    assert(one("/m/Album", Exprs.albumRoot) == "/m/Album")
    assert(one("/m/cdx/take 1", Exprs.albumRoot) == "/m/cdx/take 1")
  }

  test("dirname/basename mirror rsplit('/', 1)") {
    assert(one("/a/b/c.flac", Exprs.dirname) == "/a/b")
    assert(one("/a/b/c.flac", Exprs.basename) == "c.flac")
    assert(one("noslash", Exprs.dirname) == "")
    assert(one("noslash", Exprs.basename) == "noslash")
  }

  test("md5Valid rejects null/empty/zeroes with hyphens stripped") {
    val cases = Seq(
      (null: String) -> false, "" -> false, "0" -> false,
      "0000-0000" -> false, "d41d8cd98f00b204e9800998ecf8427e" -> true)
    cases.foreach { case (in, want) =>
      val got = Seq(in).toDF("c").select(Exprs.md5Valid(col("c")))
        .collect().head.getBoolean(0)
      assert(got == want, s"md5Valid($in)")
    }
  }

  test("normBlank trims and maps empty to null") {
    assert(one("  x  ", Exprs.normBlank) == "x")
    assert(one("   ", Exprs.normBlank) == null)
  }

  test("cents is exact on 2-decimal money") {
    val r = Seq(499978.59, 0.01, 1013.7).toDF("c")
      .select(Exprs.cents(col("c"))).collect().map(_.getLong(0))
    assert(r.toSeq == Seq(49997859L, 1L, 101370L))
  }

  test("safeDiv yields null on zero denominator") {
    val df = Seq((1.0, 0.0), (4.0, 2.0)).toDF("n", "d")
      .select(Exprs.safeDiv(col("n"), col("d"))).collect()
    assert(df(0).isNullAt(0))
    assert(df(1).getDouble(0) == 2.0)
  }

  test("changed is the null-safe inequality") {
    val df = Seq(("a", "a"), ("a", "b"), (null, null), ("a", null))
      .toDF("o", "n").select(Exprs.changed(col("o"), col("n"))).collect()
    assert(df.map(_.getBoolean(0)).toSeq == Seq(false, true, false, true))
  }
}
