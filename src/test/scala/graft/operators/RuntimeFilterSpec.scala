package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def fact = Seq(
    (1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"), (4L, 10L, "d"),
    (5L, 99L, "e"), (6L, 40L, "f"), (7L, 20L, "g"))
    .toDF("id", "k", "v")

  private def dim = Seq((10L, "x"), (20L, "y"), (40L, "z"))
    .toDF("dk", "dv")

  test("bloomSemiJoin row-identical to the plain semi-join") {
    val got = RuntimeFilter.bloomSemiJoin(fact, dim, "k", "dk",
        expectedItems = 100)
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    val want = fact.join(dim, col("k") === col("dk"), "left_semi")
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == want && got == Seq(1L, 2L, 4L, 6L, 7L))
  }

  test("bloomAntiJoin row-identical to the plain anti-join, nulls kept") {
    val f = fact.unionByName(Seq((8L, Option.empty[Long], "n"))
      .toDF("id", "k", "v"))
    val got = RuntimeFilter.bloomAntiJoin(f, dim, "k", "dk",
        expectedItems = 100)
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    val want = f.join(dim, col("k") === col("dk"), "left_anti")
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == want && got == Seq(3L, 5L, 8L))
  }

  test("the might_contain probe sits in the fact scan stage, below the join") {
    // parquet-backed sides: a local relation would fold the probe into
    // the LocalTableScan and hide the plan shape under test
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val pt = spark.read.parquet(s"$sf0001/part.parquet")
      .filter(col("p_size") === 1)
    val plan = RuntimeFilter.bloomSemiJoin(li, pt, "l_partkey", "p_partkey",
        expectedItems = 1000)
      .queryExecution.executedPlan.toString
    val probeAt = plan.indexOf("might_contain")
    val joinAt = plan.indexOf("Join")
    assert(probeAt >= 0, s"no bloom probe in plan:\n$plan")
    assert(joinAt >= 0 && probeAt > joinAt,
      s"probe must be BELOW the join (later in the plan dump):\n$plan")
  }

  test("prefilter passes every true member (no false negatives at any fpp)") {
    // 1k dim keys, 5k fact rows; the sketch may false-positive but the
    // exact confirm must leave precisely the true member set
    val bigFact = spark.range(5000).select(col("id"),
      (col("id") % 2500).as("k"))
    val bigDim = spark.range(1000).select((col("id") * 2).as("dk"))
    val got = RuntimeFilter.bloomSemiJoin(bigFact, bigDim, "k", "dk",
      expectedItems = 1000).count()
    val want = bigFact.join(bigDim, col("k") === col("dk"), "left_semi")
      .count()
    assert(got == want)
  }
}
