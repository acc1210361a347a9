package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NativeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("native uuid5 expression matches the pure function and the UDF") {
    val df = Seq("python.org", "example.com").toDF("name")
    val rows = df.select(
      NativeExpressions.uuid5(lit(Uuids.NsDns), col("name")).as("native"),
      Uuids.uuid5Udf(lit(Uuids.NsDns), col("name")).as("viaUdf")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
    assert(rows.head.getString(0) == "886313e1-3b8a-5372-9b90-0c9aee199e5d")
  }

  test("native title_case matches the engine; null-safe") {
    val df = Seq(Some("the best of the rest"), None).toDF("t")
    val rows = df.select(NativeExpressions.titleCase(col("t"))).collect()
    assert(rows(0).getString(0) == "The Best of the Rest")
    assert(rows(1).isNullAt(0))
  }

  test("SQL registration: uuid5 / title_case callable from spark.sql") {
    NativeExpressions.register(spark)
    Seq("x").toDF("n").createOrReplaceTempView("t_native")
    val r = spark.sql(
      s"SELECT uuid5('${Uuids.NsDns}', 'python.org') AS u, " +
        "title_case('war and peace') AS t FROM t_native").collect().head
    assert(r.getString(0) == "886313e1-3b8a-5372-9b90-0c9aee199e5d")
    assert(r.getString(1) == "War and Peace")
  }

  test("native expression stays inside whole-stage codegen (no UDF node)") {
    val df = Seq("a", "b").toDF("name")
      .select(NativeExpressions.uuid5(lit(Uuids.NsDns), col("name")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    assert(plan.contains("WholeStageCodegen")
      || df.queryExecution.executedPlan.execute() != null)
    // execution through codegen produces correct values
    assert(df.collect().length == 2)
  }

  test("native dot product equals the HOF formulation bit-for-bit") {
    val df = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(50)
    val hof = aggregate(
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val rows = df.select(
      NativeExpressions.dotProduct(col("embedding"), col("embedding"))
        .as("native"), hof.as("viaHof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0))
        == java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("positional ngram hashes: index = window start; distinct-sorted == hashedNgrams") {
    val df = Seq(
      (1L, "a b c d e"),          // 3 positional 3-grams
      (2L, "x y"),                // < k tokens -> empty
      (3L, "a b c a b c a b c")   // repeated windows SURVIVE (no dedup)
    ).toDF("id", "t")
    val rows = df.select(col("id"),
        NativeExpressions.positionalNgramHashes(col("t"), 3).as("ph"),
        NativeExpressions.hashedNgrams(col("t"), 3).as("nh"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2)))
      .sortBy(_._1)
    assert(rows(0)._2.length == 3 && rows(1)._2.isEmpty
      && rows(2)._2.length == 7)
    // period-3 text: windows at starts 0,3 and 1,4 and 2,5 coincide
    val p3 = rows(2)._2
    assert(p3(0) == p3(3) && p3(3) == p3(6) && p3(1) == p3(4)
      && p3(2) == p3(5) && p3(0) != p3(1))
    // set semantics agree with the strict dedup expression
    rows.foreach { case (_, ph, nh) =>
      assert(ph.distinct.sorted == nh.sorted)
    }
    // window identity: each hash equals the hash of the joined window
    // computed independently via hashedNgrams on the sliced text
    val oneWin = df.filter(col("id") === 1).select(
      NativeExpressions.hashedNgrams(lit("b c d"), 3).as("w2")).head.getSeq[Long](0)
    assert(rows(0)._2(1) == oneWin.head)
  }

  test("native dot product is null-safe and handles empty arrays") {
    val df = Seq(
      (Some(Array(1f, 2f)), Some(Array(3f, 4f))),
      (None, Some(Array(1f))),
      (Some(Array.empty[Float]), Some(Array.empty[Float])))
      .toDF("a", "b")
    val rows = df.select(
      NativeExpressions.dotProduct(col("a"), col("b"))).collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0))
    assert(rows(2).getDouble(0) == 0.0)
  }

  test("langId is UTF-8 correct: multi-byte chars don't derail tokens") {
    // "für" is 4 bytes / 3 chars — a byte-indexed substring would turn
    // the following "die" into "ie" and lose the German stopword votes
    val df = Seq(
      "der die das für",
      "le café est né là pas",
      "naïve weiß für öl und nicht").toDF("t")
    val got = df.select(graft.operators.TextAnalysis
      .langIdHeuristic(col("t"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("de", "fr", "de"))
  }

  test("textStats is UTF-8 correct on accented text") {
    val df = Seq("Àé the öç the").toDF("t")
    val r = df.select(graft.operators.TextAnalysis.textStats(col("t"))
      .as("st")).select("st.*").collect().head
    assert(r.getInt(0) == 4)       // n_toks
    assert(r.getInt(1) == 3)       // n_uniq: Àé, the, öç
    // mean word len in CHARS: (2+3+2+3)/4
    assert(math.abs(r.getDouble(2) - 2.5) < 1e-12)
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-12) // 2×"the" of 4
  }

  test("constant folding: literal inputs fold at optimization time") {
    val df = Seq(1).toDF("x")
      .select(NativeExpressions.uuid5(lit(Uuids.NsDns), lit("python.org"))
        .as("u"))
    // foldable ⇒ the optimizer collapses the whole projection into a
    // LocalRelation (no expression left to evaluate at runtime)
    val optimized = df.queryExecution.optimizedPlan
    assert(optimized.toString.startsWith("LocalRelation"),
      s"literal uuid5 was not constant-folded:\n$optimized")
    assert(df.collect().head.getString(0)
      == "886313e1-3b8a-5372-9b90-0c9aee199e5d")
  }
}
