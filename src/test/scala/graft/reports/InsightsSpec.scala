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

  test("qualityQuantiles: median, max, non-null counts, p90-p10 spread") {
    // album A: 11 track gains 1..11 → p90 = sorted[0.9*10] = 10 exactly,
    // p10 = 2 → spread 8; album gains (-1,-2,-3) → median -2; one null
    // peak → count 2, max 0.9
    val a = (1 to 11).map(i => ("/m/A",
      Some(-(1 + (i % 3)).toDouble), if (i <= 2) Some(i * 0.4 + 0.1) else None,
      Some(i.toDouble)))
    // album B: all-null track gains → null spread, count 0
    val b = Seq(("/m/B", Some(5.0), Some(0.7), Option.empty[Double]))
    val tracks = (a ++ b).toDF("album_root", "rg_album_gain_db",
      "rg_album_peak", "rg_track_gain_db")
    val r = Insights.qualityQuantiles(tracks).collect()
      .map(x => (x.getString(0), x.getDouble(1), x.getDouble(2),
        x.getInt(3), x.getInt(4), Option(x.get(5)))).toSeq
    assert(r == Seq(
      ("/m/A", -2.0, 0.9, 11, 2, Some(8.0)),
      ("/m/B", 5.0, 0.7, 1, 1, None)))
  }

  test("topRoles: distinct-album counts, multi-value cells, tok tie-break") {
    val tracks = Seq(
      // P1 on two albums (one via a multi-value cell that also repeats
      // P1 — distinct must count the album once); P2 on one
      ("/m/A", "P1\\\\P2", "L1"),
      ("/m/A", "P1", "L1"),
      ("/m/B", "P1\\\\P1", null),
      ("/m/C", null, "L2"))
      .toDF("album_root", "producer", "label")
    val r = Insights.topRoles(tracks, Seq("producer", "label"), topN = 1)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getString(2),
        x.getLong(3))).toSeq
    // label tie (L1=1, L2=1) breaks to L1; producer top is P1 with 2
    assert(r == Seq(("label", 1L, "L1", 1L), ("producer", 1L, "P1", 2L)))
  }

  test("artistDepth: albums vs distinct years, year-less artist falls to 1") {
    val tracks = Seq(
      // AA1: three albums across two distinct years (B has no year)
      ("/m/A", "AA1", Some(1990)), ("/m/B", "AA1", None),
      ("/m/C", "AA1\\\\AA2", Some(1991)), ("/m/C", "AA1", Some(1991)),
      // AA3: one album, no year anywhere → distinct_years = 1 fallback
      ("/m/D", "AA3", None))
      .toDF("album_root", "albumartist", "album_year")
    val r = Insights.artistDepth(tracks, topN = 10).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getInt(3)))
      .toSeq
    assert(r == Seq(
      (1L, "AA1", 3L, 2),
      // AA2 and AA3 tie at 1 album → token asc
      (2L, "AA2", 1L, 1), (3L, "AA3", 1L, 1)))
  }

  test("rgTrend: PLR proxy per year, zero-peak and year-less albums drop") {
    val tracks = Seq(
      // 1990: two albums; peak 1.0 → dBFS 0 → plr = 18 + gain
      ("/m/A", Some(-10.0), Some(1.0), Some(1990)),
      ("/m/B", Some(-6.0), Some(1.0), Some(1990)),
      // zero peak → dropped; no year → dropped
      ("/m/C", Some(-5.0), Some(0.0), Some(1990)),
      ("/m/D", Some(-5.0), Some(1.0), None))
      .toDF("album_root", "rg_album_gain_db", "rg_album_peak", "album_year")
    val r = Insights.rgTrend(tracks).collect()
      .map(x => (x.getInt(0), x.getDouble(1), x.getDouble(2), x.getLong(3)))
      .toSeq
    // medians over {-10, -6}: gain -8; plr over {8, 12}: 10
    assert(r == Seq((1990, -8.0, 10.0, 2L)))
  }

  test("dynamicsExtremes: most/least by PLR micros, bounded to topN") {
    val tracks = Seq(
      ("/m/A", Some(-10.0), Some(1.0), Some(1990)), // plr 8
      ("/m/B", Some(-6.0), Some(1.0), Some(1991)),  // plr 12
      ("/m/C", Some(-2.0), Some(1.0), Some(1992)))  // plr 16
      .toDF("album_root", "rg_album_gain_db", "rg_album_peak", "album_year")
    val r = Insights.dynamicsExtremes(tracks, topN = 2).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getString(2), x.getLong(3)))
      .toSeq
    assert(r == Seq(
      ("least", 1L, "/m/A", 8000000L), ("least", 2L, "/m/B", 12000000L),
      ("most", 1L, "/m/C", 16000000L), ("most", 2L, "/m/B", 12000000L)))
  }

  test("rgByGenre: album-scope bucket waterfall and pinned bucket order") {
    val tracks = Seq(
      // one classical track outranks the album's jazz track (waterfall)
      ("/m/A", "Jazz", Some(-10.0), Some(1.0), Some(1990)),
      ("/m/A", "Classical", Some(-10.0), Some(1.0), Some(1990)),
      ("/m/B", "Techno", Some(-6.0), Some(1.0), Some(1991)),
      ("/m/C", "Blues", Some(-2.0), Some(1.0), Some(1992)),
      ("/m/D", null, Some(-4.0), Some(1.0), Some(1993)))
      .toDF("album_root", "genre", "rg_album_gain_db", "rg_album_peak",
        "album_year")
    val r = Insights.rgByGenre(tracks).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2),
        x.getDouble(3))).toSeq
    // plr = 18 + gain at peak 1.0; ref order, Other collects Blues+null
    assert(r == Seq(
      ("Classical", 1L, -10.0, 8.0),
      ("Electronic", 1L, -6.0, 12.0),
      ("Other", 2L, -3.0, 15.0)))
  }

  test("gainExtremes: loudest = most negative median gain, quietest = most positive") {
    val tracks = Seq(
      ("/m/A", Some(-12.0)), ("/m/A", Some(-10.0)),   // median -11
      ("/m/B", Some(-2.0)),
      ("/m/C", Some(1.5)),
      ("/m/D", None))                                  // no gain → dropped
      .toDF("album_root", "rg_album_gain_db")
    val r = Insights.gainExtremes(tracks, topN = 2)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getString(2),
        x.getLong(3))).toSeq
    assert(r == Seq(
      ("loudest", 1L, "/m/A", -11000000L),
      ("loudest", 2L, "/m/B", -2000000L),
      ("quietest", 1L, "/m/C", 1500000L),
      ("quietest", 2L, "/m/B", -2000000L)))
  }

  test("mostInstances: normalized keys merge variants; distinct artists rank") {
    val tracks = Seq(
      // one composition, three spellings of the title, 3 artists: the
      // ws-collapse + lowercase key must merge them all
      ("Classical", "Moonlight  Sonata", "C1\\\\C2", "Ar1"),
      ("Classical", "moonlight sonata",  "C2\\\\C1", "Ar2"),  // sorted composer key merges too
      ("Classical", " MOONLIGHT SONATA ", "C1\\\\C2", "Ar3"),
      // second composition: more tracks but fewer distinct artists
      ("Classical", "Fur Elise", "C1", "Ar1"),
      ("Classical", "Fur Elise", "C1", "Ar1"),
      ("Classical", "Fur Elise", "C1", "Ar1"),
      ("Classical", "Fur Elise", "C1", "Ar2"),
      // non-classical and artist-less rows must drop
      ("Jazz", "Moonlight Sonata", "C1\\\\C2", "Ar9"),
      ("Classical", "Orphan", "C9", null))
      .toDF("genre", "title", "composer", "artist")
    val r = Insights.mostInstances(tracks,
        Seq("classical"), topN = 5)
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getLong(3))).toSeq
    assert(r == Seq(
      ("c1 / c2", "moonlight sonata", 3L, 3L),
      ("c1", "fur elise", 4L, 2L)))
  }

  test("rolePairs: per-side top partner with shared-album counts") {
    val tracks = Seq(
      ("/m/A", "P1", "E1"), ("/m/A", "P1", "E2"),
      ("/m/B", "P1", "E1"), ("/m/B", "P2", "E1"))
      .toDF("album_root", "producer", "engineer")
    val r = Insights.rolePairs(tracks, "producer", "engineer", topN = 5)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getString(2),
        x.getLong(3))).toSeq
    assert(r == Seq(
      // engineers: E1's top producer is P1 (2 shared albums); E2 | P1 (1)
      ("engineer", 1L, "E1 | P1", 2L), ("engineer", 2L, "E2 | P1", 1L),
      // producers: P1's top engineer is E1 (2); P2 | E1 (1)
      ("producer", 1L, "P1 | E1", 2L), ("producer", 2L, "P2 | E1", 1L)))
  }
}
