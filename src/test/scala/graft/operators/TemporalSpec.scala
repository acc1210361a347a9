package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  // (id, key, ts) probes; (id, key, ts) builds
  private def probe = Seq(
    (100L, 1L, 50L), (101L, 1L, 10L), (102L, 1L, 20L),
    (103L, 2L, 5L), (104L, 3L, 99L))
    .toDF("pid", "k", "ts")
  private def build = Seq(
    (1L, 1L, 20L), (2L, 1L, 20L), (3L, 1L, 40L),
    (4L, 2L, 6L), (5L, 3L, 1L))
    .toDF("bid", "k", "ts")

  test("asofJoin picks greatest build ts <= probe ts per key") {
    val r = Temporal.asofJoin(probe, build, "k", "ts", "bid")
      .select("pid", "asof_bid").as[(Long, Option[Long])]
      .collect().toMap
    assert(r(100L).contains(3L)) // ts 50 → build ts 40
    assert(r(101L).isEmpty)      // ts 10 → nothing at or before
    assert(r(103L).isEmpty)      // key 2: build at 6 is AFTER probe 5
    assert(r(104L).contains(5L)) // key 3: lookback unbounded
  }

  test("asofJoin ties: equal ts is eligible, greatest tie col wins") {
    val r = Temporal.asofJoin(probe, build, "k", "ts", "bid")
      .select("pid", "asof_bid").as[(Long, Option[Long])]
      .collect().toMap
    // probe ts 20 meets TWO builds at ts 20 (bid 1, 2): <= semantics
    // admits them; the greater bid wins the tie
    assert(r(102L).contains(2L))
  }

  test("asofJoin tolerance nulls matches older than the bound") {
    val r = Temporal.asofJoin(probe, build, "k", "ts", "bid",
        tolerance = 10L)
      .select("pid", "asof_bid").as[(Long, Option[Long])]
      .collect().toMap
    assert(r(100L).contains(3L)) // ts 50 vs build 40: age 10 ≤ 10
    assert(r(102L).contains(2L)) // age 0
    assert(r(104L).isEmpty)      // ts 99 vs build 1: age 98 > 10 → null
  }

  test("asofJoin carries payload columns with the prefix") {
    val b = build.withColumn("state", concat(lit("s"), col("bid")))
    val r = Temporal.asofJoin(probe, b, "k", "ts", "bid", Seq("state"))
      .where(col("pid") === 100L)
      .select("asof_ts", "asof_state").as[(Long, String)].collect()
    assert(r.toSeq == Seq((40L, "s3")))
  }

  test("asofJoin plan: no join node, one exchange") {
    val plan = Temporal.asofJoin(probe, build, "k", "ts", "bid")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
    assert("Exchange hashpartitioning".r
      .findAllIn(plan).length == 1, s"want 1 key exchange in:\n$plan")
  }

  private def intervals = Seq(
    (10L, 0L, 10L),    // [0, 10)
    (11L, 5L, 25L),    // [5, 25) — overlaps 10, spans 3 cells at w=10
    (12L, 90L, 100L))  // [90, 100)
    .toDF("iid", "lo", "hi")
  private def points = Seq(
    (1L, 0L), (2L, 9L), (3L, 10L), (4L, 24L), (5L, 25L), (6L, 95L))
    .toDF("ptid", "pt")

  test("rangeJoin: inclusive start, exclusive end, overlapping intervals") {
    val r = Temporal.rangeJoin(intervals, "lo", "hi", points, "pt", 10L)
      .select("iid", "ptid").as[(Long, Long)].collect().toSet
    assert(r == Set(
      (10L, 1L), (10L, 2L),            // 0, 9 in [0,10); 10 excluded
      (11L, 2L), (11L, 3L), (11L, 4L), // 9, 10, 24 in [5,25); 25 out
      (12L, 6L)))
  }

  test("rangeJoin emits each qualifying pair exactly once") {
    val r = Temporal.rangeJoin(intervals, "lo", "hi", points, "pt", 10L)
      .groupBy("iid", "ptid").count().where(col("count") > 1).count()
    assert(r == 0L)
  }

  test("rangeJoin plan: cell equi-join, no nested loop / cartesian") {
    val plan = Temporal.rangeJoin(intervals, "lo", "hi", points, "pt", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
