package graft.ops

import graft.SparkSpec

class StepsSpec extends SparkSpec {
  import spark.implicits._

  // alib-style stringly-typed fixture: path key, messy values
  private val alib = Seq(
    ("/m/a/1.flac", "Title  One\r\n", "Rock\\\\Rock\\\\Pop", "1999/03/12"),
    ("/m/a/2.flac", "  ", "Jazz", "2001"),
    ("/m/b/3.flac", "Clean", null, "1987.01.02"))
    .toDF("__path", "title", "genre", "year")

  private val steps = Steps.defaultPipeline(
    textCols = Seq("title"), mvCols = Seq("genre"), dateCols = Seq("year"))

  test("default pipeline cleans, dedupes, canonicalizes — and audits") {
    val (fin, log) = Pipeline.run(alib, "__path", steps)
    val rows = fin.orderBy("__path").collect()
    assert(rows(0).getString(1) == "Title One")
    assert(rows(0).getString(2) == "Rock\\\\Pop") // mv dedupe, order kept
    assert(rows(0).getString(3) == "1999-03-12")
    assert(rows(1).isNullAt(1)) // blank → NULL
    assert(rows(1).getString(3) == "2001") // bare year passes through
    assert(rows(2).getString(3) == "1987-01-02") // dotted → dashed
    // audit: every change logged under its step's script tag
    val scripts = log.select("script").distinct().collect()
      .map(_.getString(0)).toSet
    assert(scripts == Set("02_clean_text", "03_norm_blanks",
      "17_dedupe_mv", "20_canon_dates"))
  }

  test("pipeline converges: second run is a no-op (SURVEY §5.7)") {
    val (fin, _) = Pipeline.run(alib, "__path", steps)
    val (_, log2) = Pipeline.run(fin, "__path", steps)
    assert(log2.count() == 0)
  }

  test("titlecase and nfkd steps converge too") {
    val df = Seq(("/p1", "the best of THE rest", "Béla  Bartók"))
      .toDF("__path", "title", "composer")
    val s = Seq(Steps.titleCase(Seq("title")), Steps.nfkdNames(Seq("composer")))
    val (fin, _) = Pipeline.run(df, "__path", s)
    val (_, log2) = Pipeline.run(fin, "__path", s)
    assert(log2.count() == 0)
    val r = fin.collect().head
    assert(r.getString(1) == "The Best of THE Rest")
    assert(r.getString(2) == "Bela Bartok")
  }
}
