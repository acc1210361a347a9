package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val orig = Seq(
    (1L, "aa  bb", "x"),
    (2L, "clean", "y"),
    (3L, null: String, "z"))
    .toDF("id", "t", "u")

  private def transform(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("t", regexp_replace(col("t"), " +", " "))
      .withColumn("u", upper(col("u")))

  test("diffAndLog emits one changelog row per changed field") {
    val (rows, log) = Cdc.diffAndLog(orig, transform(orig), "id",
      Seq("t", "u"), "s1")
    val entries = log.orderBy("key", "column").collect()
    // id=1: t and u change; id=2: u changes; id=3: u changes (t null-safe)
    assert(entries.length == 4)
    val first = entries.head
    assert(first.getLong(0) == 1L && first.getString(1) == "t")
    assert(first.getString(2) == "aa  bb" && first.getString(3) == "aa bb")
    assert(entries.forall(_.getString(4) == "s1"))
  }

  test("__sqlmodded counts changed fields per row") {
    val (rows, _) = Cdc.diffAndLog(orig, transform(orig), "id",
      Seq("t", "u"), "s1")
    val m = rows.collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(m == Map(1L -> 2, 2L -> 1, 3L -> 1))
  }

  test("null-safe: null -> null is not a change") {
    val (_, log) = Cdc.diffAndLog(orig, transform(orig), "id",
      Seq("t", "u"), "s1")
    assert(log.filter(col("key") === 3 && col("column") === "t").count() == 0)
  }

  test("idempotence: re-running the transform yields zero changes (SURVEY §5.7)") {
    val next = transform(orig)
    val (rows2, log2) = Cdc.diffAndLog(next, transform(next), "id",
      Seq("t", "u"), "s1")
    assert(log2.count() == 0)
    assert(rows2.count() == 0)
  }

  test("summarize classifies add/delete/modify") {
    val next = orig
      .withColumn("t", when(col("id") === 2, lit(null)).otherwise(col("t")))
      .withColumn("u", when(col("id") === 3, lit("new")).otherwise(col("u")))
    val (_, log) = Cdc.diffAndLog(orig, next, "id", Seq("t", "u"), "s2")
    val s = Cdc.summarize(log).collect()
      .map(r => (r.getString(1), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSet
    // t: 1 delete (id=2); u: 1 modify (id=3, z->new)
    assert(s == Set(("t", 0L, 1L, 0L), ("u", 0L, 0L, 1L)))
  }

  test("logNoops keeps old==new entries; summarize counts them apart") {
    val next = orig
      .withColumn("u", when(col("id") === 1, lit("X")).otherwise(col("u")))
    val (_, log) = Cdc.diffAndLog(orig, next, "id", Seq("t", "u"), "s3",
      logNoops = true)
    assert(log.count() == 6) // 3 rows x 2 fields, unchanged included
    // t: all three entries are no-ops; u: one change (id=1), two no-ops
    val byCol = Cdc.summarize(log).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getLong(7))))
      .toMap
    assert(byCol("t") == ((0L, 0L, 3L)))
    assert(byCol("u") == ((1L, 1L, 2L)))
  }
}
