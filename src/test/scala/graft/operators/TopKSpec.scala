package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // group a: scores with a tie at 50 (ids 3 < 7 break it)
    ("a", 90L, 1L), ("a", 50L, 7L), ("a", 50L, 3L), ("a", 10L, 2L),
    // group b: fewer rows than k
    ("b", 5L, 9L),
    // group c: all-equal scores — pure id ordering
    ("c", 1L, 30L), ("c", 1L, 10L), ("c", 1L, 20L))

  test("topKPerGroup matches the window formulation incl. tie-breaks") {
    val df = rows.toDF("g", "score", "id")
    val got = TopK.topKPerGroup(df, Seq("g"), "score", "id", k = 2)
      .orderBy("g", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == Seq(
      ("a", 1L, 1L, 90L), ("a", 2L, 3L, 50L),
      ("b", 1L, 9L, 5L),
      ("c", 1L, 10L, 1L), ("c", 2L, 20L, 1L)))

    val w = Window.partitionBy("g")
      .orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 2)
      .select(col("g"), col("rank").cast("long"), col("id"), col("score"))
      .orderBy("g", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == viaWindow.toSeq)
  }

  test("buffer stays bounded at k under merge from many partitions") {
    val big = (1 to 10000).map(i => ("hot", (i % 97).toLong, i.toLong))
    val got = TopK.topKPerGroup(big.toDF("g", "score", "id")
        .repartition(16), Seq("g"), "score", "id", k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // score 96 first appears at ids 96, 193, 290
    assert(got.toSeq == Seq((1L, 96L, 96L), (2L, 193L, 96L),
      (3L, 290L, 96L)))
  }

  test("null scores rank last and round-trip as null") {
    val df = Seq(("a", Option(9L), 1L), ("a", Option.empty[Long], 2L),
      ("a", Option(5L), 3L), ("b", Option.empty[Long], 4L))
      .toDF("g", "score", "id")
    val got = TopK.topKPerGroup(df, Seq("g"), "score", "id", k = 2)
      .orderBy("g", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(got.toSeq == Seq(
      ("a", 1L, 1L, Some(9L)), ("a", 2L, 3L, Some(5L)),
      // a group of only-null scores still surfaces, score null
      ("b", 1L, 4L, None)))
  }

  test("matches the window formulation on seeded random data") {
    val rnd = new scala.util.Random(20260812L)
    val data = (1 to 5000).map { i =>
      (s"g${rnd.nextInt(37)}", rnd.nextInt(50).toLong, i.toLong)
    }
    for (k <- Seq(1, 3, 7)) {
      val df = data.toDF("g", "score", "id").repartition(8)
      val viaAgg = TopK.topKPerGroup(df, Seq("g"), "score", "id", k)
        .select("g", "rank", "id", "score")
        .collect().map(_.toSeq).toSet
      val w = Window.partitionBy("g")
        .orderBy(col("score").desc, col("id"))
      val viaWindow = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("g"), col("rank").cast("long"), col("id"), col("score"))
        .collect().map(_.toSeq).toSet
      assert(viaAgg == viaWindow, s"mismatch at k=$k")
    }
  }

  test("a genuine Long.MinValue score survives (no sentinel corruption)") {
    val df = Seq(("a", Option(Long.MinValue), 1L), ("a", Option(9L), 2L),
      ("a", Option.empty[Long], 3L)).toDF("g", "score", "id")
    val got = TopK.topKPerGroup(df, Seq("g"), "score", "id", k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    // MIN_VALUE is a real score: ranks above the null, round-trips intact
    assert(got.toSeq == Seq((1L, 2L, Some(9L)),
      (2L, 1L, Some(Long.MinValue)), (3L, 3L, None)))
  }

  test("string-keyed top-k matches the window formulation, no Window node") {
    val df = Seq(("en", 10L, "the"), ("en", 10L, "a"), ("en", 3L, "zoo"),
      ("de", 7L, "der"), ("de", 7L, "die"), ("de", 2L, "und"))
      .toDF("g", "cnt", "tok")
    val q = TopK.topKPerGroupAs[String](df, Seq("g"), "cnt", "tok", k = 2)
    val got = q.orderBy("g", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("de", 1L, "der", 7L), ("de", 2L, "die", 7L),
      ("en", 1L, "a", 10L), ("en", 2L, "the", 10L)))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window sneaked in:\n$plan")
  }

  test("non-BMP string ids tie-break in UTF8String (code point) order") {
    // U+1D11E (musical G clef) is a surrogate pair: UTF-16 unit order
    // puts it BEFORE U+FF21 (fullwidth A); code-point / UTF-8 byte
    // order — what Spark's sort and DuckDB use — puts it AFTER
    val clef = new String(Character.toChars(0x1D11E))
    val fwA = "Ａ"
    assert(Ordering.String.lt(clef, fwA), "premise: natural order differs")
    assert(TopK.Utf8Ordering.gt(clef, fwA))
    val df = Seq(("g", 5L, clef), ("g", 5L, fwA), ("g", 5L, "plain"))
      .toDF("g", "cnt", "tok")
    val got = TopK.topKPerGroupAs[String](df, Seq("g"), "cnt", "tok", k = 3)
      .orderBy("rank").collect().map(_.getString(2))
    // expected order = Spark's own ORDER BY tok (UTF8String binary)
    val sparkOrder = df.select("tok").orderBy("tok").collect()
      .map(_.getString(0))
    assert(got.toSeq == sparkOrder.toSeq)
  }

  test("insert allocates once per accepted element, nothing when rejected") {
    val agg = new TopK.TopKAgg[Long](2)(
      implicitly[Ordering[Long]],
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[TopK.Entry[Long]]]())
    val full = agg.reduce(agg.reduce(agg.zero,
      TopK.Entry(9L, noScore = false, 1L)),
      TopK.Entry(8L, noScore = false, 2L))
    // rejected: the SAME buffer instance comes back — zero allocation
    val rejected = agg.reduce(full, TopK.Entry(1L, noScore = false, 3L))
    assert(rejected.asInstanceOf[AnyRef] eq full.asInstanceOf[AnyRef])
    // accepted: one fresh k-bounded ArraySeq
    val accepted = agg.reduce(full, TopK.Entry(10L, noScore = false, 4L))
    assert(accepted.isInstanceOf[scala.collection.immutable.ArraySeq[_]])
    assert(accepted.length == 2)
    assert(accepted.map(_.id) == Seq(4L, 1L))
  }

  test("a group column named pos or col does not collide with the generator") {
    val df = Seq(("x", 2L, 1L), ("x", 1L, 2L)).toDF("pos", "score", "id")
    val got = TopK.topKPerGroup(df, Seq("pos"), "score", "id", k = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("x", 1L, 1L)))
  }

  test("plan aggregates partially — no Window, no full-row sort") {
    val df = rows.toDF("g", "score", "id")
    val plan = TopK.topKPerGroup(df, Seq("g"), "score", "id", k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window sneaked in:\n$plan")
    assert(plan.contains("ObjectHashAggregate") ||
      plan.contains("SortAggregate"), s"no aggregate exec:\n$plan")
    assert(plan.contains("partial_"), s"no partial (map-side) agg:\n$plan")
  }
}
