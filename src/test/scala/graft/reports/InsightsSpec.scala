package graft.reports

import org.apache.spark.sql.functions._

import graft.SparkSpec

class InsightsSpec extends SparkSpec {
  import spark.implicits._

  test("missingCriticalTags: disc collapse, trim-blank, compilation waiver") {
    val tracks = Seq(
      // box set: two disc folders collapse to one album root; one
      // title NULL, one whitespace-only (missing after trim)
      ("/m/Box1/CD 1", null, "A", "AA", 0),
      ("/m/Box1/CD 2", "  ", "A", "AA", 0),
      // compilation: albumartist blank but waived → album NOT flagged
      ("/m/Comp", "T1", "A", "", 1),
      ("/m/Comp", "T2", "A", "", 1),
      // clean album → filtered out of the exception report
      ("/m/Clean", "T3", "A", "AA", 0),
      // artist gap only
      ("/m/Solo", "T4", null, "AA", 0))
      .toDF("__dirpath", "title", "artist", "albumartist", "compilation")
    val r = Insights.missingCriticalTags(tracks, "__dirpath",
      Seq("title", "artist", "albumartist"),
      compilationCol = Some("compilation"))
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2),
        Option(x.get(3)), Option(x.get(4)), Option(x.get(5))))
    assert(r.toSeq == Seq(
      ("/m/Box1", "Box1", 2L, Some(2), None, None),
      ("/m/Solo", "Solo", 1L, None, Some(1), None)))
  }

  test("missingCriticalTags without compilation column counts albumartist") {
    val tracks = Seq(("/m/X", "T", "A", ""), ("/m/X", "T", "A", "AA"))
      .toDF("__dirpath", "title", "artist", "albumartist")
    val r = Insights.missingCriticalTags(tracks, "__dirpath",
      Seq("title", "artist", "albumartist")).collect()
    assert(r.length == 1 && r.head.getInt(5) == 1)
  }
}
