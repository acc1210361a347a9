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

  test("involvedPeopleMerge routes roles, merges casefold, converges") {
    val df = Seq(
      // existing casefold dup: no append; composer fills
      ("/p1", "Paul, MainArtist - Ringo, ComposerLyricist", "paul", null: String, null: String),
      // append behind existing; hyphen-guard keeps 'Jean-Luc' whole
      ("/p2", "Jean-Luc, MainArtist", "Other", null, null),
      // no ' - ', single entry, two roles fan to two targets
      ("/p3", "Carly, ComposerLyricist", null, "Old", null))
      .toDF("__path", "involved", "albumartist", "composer", "lyricist")
    val s = Seq(Steps.involvedPeopleMerge("involved"))
    val (fin, _) = Pipeline.run(df, "__path", s)
    val r = fin.orderBy("__path").collect()
    assert(r(0).getString(2) == "paul" && r(0).getString(3) == "Ringo"
      && r(0).getString(4) == "Ringo")
    assert(r(1).getString(2) == "Other\\\\Jean-Luc")
    assert(r(2).isNullAt(2) && r(2).getString(3) == "Old\\\\Carly"
      && r(2).getString(4) == "Carly")
    val (_, log2) = Pipeline.run(fin, "__path", s)
    assert(log2.count() == 0)
  }

  test("dictContributors applies the staged waterfall and converges") {
    val dict = Map("miles davis" -> "Miles Davis", "bird" -> "Bird",
      "prez" -> "Prez")
    val df = Seq(
      ("/p1", "MILES DAVIS; bird & prez"), // dict hit; & both-resolve split
      ("/p2", "bird & sons"),              // conservative: no split
      ("/p3", "ac-dc/john smith"))         // hyphen passthrough; fallback
      .toDF("__path", "artist")
    val s = Seq(Steps.dictContributors(Seq("artist"), dict))
    val (fin, _) = Pipeline.run(df, "__path", s)
    val r = fin.orderBy("__path").collect()
    assert(r(0).getString(1) == "Miles Davis\\\\Bird\\\\Prez")
    assert(r(1).getString(1) == "Bird & Sons")
    assert(r(2).getString(1) == "ac-dc\\\\John Smith")
    val (_, log2) = Pipeline.run(fin, "__path", s)
    assert(log2.count() == 0)
  }

  test("genreNormalize maps against valid set, merges style, converges") {
    val valid = Seq("Rock", "Jazz").toDF("tag")
    val df = Seq(
      (1L, "rock, bogus; JAZZ", "jazz"),
      (2L, null: String, "rock"),
      (3L, "bogus", null: String))
      .toDF("id", "genre", "style")
    val s = Seq(Steps.genreNormalize("id", "genre", "style", valid))
    val (fin, _) = Pipeline.run(df, "id", s)
    val r = fin.orderBy("id").collect()
    assert(r(0).getAs[String]("genre") == "Rock\\\\Jazz"
      && r(0).getAs[String]("style") == "Jazz")
    assert(r(1).getAs[String]("genre") == "Rock"
      && r(1).getAs[String]("style") == "Rock")
    assert(r(2).isNullAt(r(2).fieldIndex("genre"))
      && r(2).isNullAt(r(2).fieldIndex("style")))
    val (_, log2) = Pipeline.run(fin, "id", s)
    assert(log2.count() == 0)
  }

  test("genreEnrich fills only missing/generic genres and converges") {
    val ref = Seq((10L, "Folk\\\\Blues", "Roots"), (20L, "Soul", null: String))
      .toDF("artist_id", "ref_genre", "ref_styles")
    val df = Seq(
      (1L, 10L, null: String, null: String), // enrich genre + style
      (2L, 10L, "Pop", "Live"),              // generic: append both
      (3L, 10L, "Settled", null: String),    // non-generic: untouched
      (4L, 20L, "Jazz", null: String),       // ref has no styles
      (5L, 30L, null: String, null: String)) // no ref row: untouched
      .toDF("id", "artist_id", "genre", "style")
    val s = Seq(Steps.genreEnrich("artist_id", ref))
    val (fin, _) = Pipeline.run(df, "id", s)
    val r = fin.orderBy("id").collect()
    assert(r(0).getString(2) == "Folk\\\\Blues" && r(0).getString(3) == "Roots")
    assert(r(1).getString(2) == "Pop\\\\Folk\\\\Blues"
      && r(1).getString(3) == "Live\\\\Roots")
    assert(r(2).getString(2) == "Settled" && r(2).isNullAt(3))
    assert(r(3).getString(2) == "Jazz\\\\Soul" && r(3).isNullAt(3))
    assert(r(4).isNullAt(2) && r(4).isNullAt(3))
    val (_, log2) = Pipeline.run(fin, "id", s)
    assert(log2.count() == 0)
  }

  test("uuidAssign fills invalid ids with v7, keeps valid, converges") {
    val df = Seq(
      (1L, null: String), (2L, ""), (3L, "not-a-uuid"),
      (4L, "00000000-0000-7000-8000-000000000004"))
      .toDF("id", "track_uuid")
    val s = Seq(Steps.uuidAssign("track_uuid"))
    val (fin0, _) = Pipeline.run(df, "id", s)
    val fin = fin0.cache() // pin the non-deterministic generator output
    val r = fin.orderBy("id").collect()
    val v7 = "^[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$".r
    assert(r.forall(row => v7.findFirstIn(row.getString(1)).isDefined))
    assert(r(3).getString(1) == "00000000-0000-7000-8000-000000000004")
    val (_, log2) = Pipeline.run(fin, "id", s)
    assert(log2.count() == 0)
    fin.unpersist()
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

  test("artistFeatureSplit case-corrects via dict, else splits features") {
    val canonical = Seq("Miles Davis", "MxPx").toDF("contributor")
    val df = Seq(
      ("/p1", "MILES DAVIS"),          // dict hit, wrong case → canonical
      ("/p2", "MxPx"),                 // dict hit, exact → unchanged
      ("/p3", "A feat. B"),            // feature split
      ("/p4", "A featuring The B"),    // longer prefix wins
      ("/p5", "C w/ D"),
      ("/p6", "feat. X"),              // no main part → unchanged
      ("/p7", null: String))
      .toDF("__path", "artist")
    val s = Seq(Steps.artistFeatureSplit("artist", canonical))
    val (fin, _) = Pipeline.run(df, "__path", s)
    val r = fin.orderBy("__path").collect().map(x =>
      Option(x.getString(1)).orNull)
    assert(r.toSeq == Seq("Miles Davis", "MxPx", "A\\\\B", "A\\\\The B",
      "C\\\\D", "feat. X", null))
    val (_, log2) = Pipeline.run(fin, "__path", s)
    assert(log2.count() == 0)
  }

  test("titleSuffixExtract routes feature/live/subtitle brackets") {
    val df = Seq(
      ("/p1", "Song (feat. Ella)", null: String, "Duke", "0"),
      ("/p2", "Song (Live 1975)", null: String, "Duke", "0"),
      // live-at guard: subtitle mentions 'live at' → no append, flag set
      ("/p3", "Song (Live At Pool)", "Live At The Club", "Duke", "0"),
      // dup guard: bracket already present in subtitle (case-insensitive)
      ("/p4", "Song (Remaster 2011)", "[remaster 2011]", "Duke", "0"),
      // trailing-word match without a known prefix
      ("/p5", "Song [Super Deluxe Version]", null: String, "Duke", "0"),
      // unmatched suffix ignored entirely
      ("/p6", "Song (About Life)", null: String, "Duke", "0"),
      // variant normalization: alt → 'alt. take' is NOT a prefix, but
      // trailing 'mix' still routes it
      ("/p7", "Song (Alt Early Mix)", "[Demo]", "Duke", "0"))
      .toDF("__path", "title", "subtitle", "artist", "live")
    val s = Seq(Steps.titleSuffixExtract())
    val (fin, _) = Pipeline.run(df, "__path", s)
    val r = fin.orderBy("__path").collect()
    def row(i: Int) = (r(i).getString(1), Option(r(i).getString(2)).orNull,
      r(i).getString(3), r(i).getString(4))
    assert(row(0) == ("Song", null, "Duke\\\\Ella", "0"))
    assert(row(1) == ("Song", "[Live 1975]", "Duke", "1"))
    assert(row(2) == ("Song", "Live At The Club", "Duke", "1"))
    assert(row(3) == ("Song", "[remaster 2011]", "Duke", "0"))
    assert(row(4) == ("Song", "[Super Deluxe Version]", "Duke", "0"))
    assert(row(5) == ("Song (About Life)", null, "Duke", "0"))
    assert(row(6) == ("Song", "[Demo]; [Alt Early Mix]", "Duke", "0"))
    val (_, log2) = Pipeline.run(fin, "__path", s)
    assert(log2.count() == 0)
  }

  test("songwriterMerge folds fields in order with casefold dedupe") {
    val df = Seq(
      ("/p1", "Bach\\\\mozart", "MOZART", "Liszt", null: String),
      ("/p2", null: String, null: String, null: String, null: String),
      ("/p3", null: String, "Holst", "Holst", "Grieg"))
      .toDF("__path", "composer", "arranger", "lyricist", "writer")
    val s = Seq(Steps.songwriterMerge())
    val (fin, _) = Pipeline.run(df, "__path", s)
    val r = fin.orderBy("__path").collect().map(x =>
      Option(x.getString(1)).orNull)
    assert(r.toSeq == Seq("Bach\\\\mozart\\\\Liszt", null, "Holst\\\\Grieg"))
    val (_, log2) = Pipeline.run(fin, "__path", s)
    assert(log2.count() == 0)
  }

  test("normalizeSubtitles: dedupe, live-drop, casing, legacy migration") {
    import graft.functions.Subtitles.normalizeSubtitle
    assert(normalizeSubtitle("(Live) (Live At The BBC)") ==
      "[Live At The BBC]")
    assert(normalizeSubtitle("(remaster) (REMASTER)") == "[Remaster]")
    assert(normalizeSubtitle("(alt. take a.k.a demo)") ==
      "[Alt. take a.K.A demo]")
    assert(normalizeSubtitle("(BBC session)") == "[BBC session]") // acronym
    assert(normalizeSubtitle("live\\\\remaster") == "live; remaster")
    assert(normalizeSubtitle("plain") == "plain")
    assert(normalizeSubtitle("(live)") == "[Live]") // lone live kept, cased
    // step converges through the pipeline
    val df = Seq(("/p1", "(demo)\\\\ignored"), ("/p2", "  "))
      .toDF("__path", "subtitle")
    val s = Seq(Steps.normalizeSubtitles())
    val (fin, _) = Pipeline.run(df, "__path", s)
    val r = fin.orderBy("__path").collect()
    assert(r(0).getString(1) == "[Demo]") // brackets win over legacy delim
    assert(r(1).getString(1) == "  ")     // blank untouched (ref fetch)
    val (_, log2) = Pipeline.run(fin, "__path", s)
    assert(log2.count() == 0)
  }

  test("detectCompilations: artist rules take priority, paths fall back") {
    val df = Seq(
      // empty aa + 2 artists → compilation
      ("/m/X", "A", "", "0", "/p1"), ("/m/X", "B", "", "0", "/p2"),
      // empty aa + 1 artist → not, aa backfills
      ("/m/Y", "C", null: String, "1", "/p3"), ("/m/Y", "C", null, "1", "/p4"),
      // various + 2 artists → compilation
      ("/m/Z", "D", " Various Artists ", "0", "/p5"),
      ("/m/Z", "E", "various", "0", "/p6"),
      // aa set, non-various → path rule decides
      ("/m/VA - Hits", "F", "Keep", "0", "/p7"),
      ("/m/Plain", "G", "Keep", "1", "/p8"),
      // '/VA/' as a path COMPONENT (not a leaf prefix) also flags
      ("/m/VA/Greatest", "H", "Keep", "0", "/p9"))
      .toDF("__dirpath", "artist", "albumartist", "compilation", "__path")
    val s = Seq(Steps.detectCompilations())
    val (fin, _) = Pipeline.run(df, "__path", s)
    val r = fin.orderBy("__path").collect()
      .map(x => (x.getString(3), Option(x.getString(2)).orNull))
    assert(r.toSeq == Seq(("1", ""), ("1", ""), ("0", "C"), ("0", "C"),
      ("1", " Various Artists "), ("1", "various"),
      ("1", "Keep"), ("0", "Keep"), ("1", "Keep")))
    val (_, log2) = Pipeline.run(fin, "__path", s)
    assert(log2.count() == 0)
  }

  test("cleanupDiscnumber clears identical dirs, spares cd-leaf dirs") {
    val df = Seq(
      ("/m/A", "1", "/p1"), ("/m/A", "1", "/p2"),   // identical → clear
      ("/m/B", "1", "/p3"), ("/m/B", "2", "/p4"),   // varies → keep
      ("/m/C/CD 1", "1", "/p5"), ("/m/C/cd2", "1", "/p6"), // disc leaf → keep
      ("/m/D", null: String, "/p7"), ("/m/D", " ", "/p8"), // all blank → keep
      ("/m/E", "3", "/p9"), ("/m/E", null, "/p10")) // one value + null → clear
      .toDF("__dirpath", "discnumber", "__path")
    val s = Seq(Steps.cleanupDiscnumber())
    val (fin, _) = Pipeline.run(df, "__path", s)
    val m = fin.collect().map(x => x.getString(2) ->
      Option(x.getString(1)).orNull).toMap
    assert(m("/p1") == null && m("/p2") == null)
    assert(m("/p3") == "1" && m("/p4") == "2")
    assert(m("/p5") == "1" && m("/p6") == "1")
    assert(m("/p7") == null && m("/p8") == " ")
    assert(m("/p9") == null && m("/p10") == null)
    val (_, log2) = Pipeline.run(fin, "__path", s)
    assert(log2.count() == 0)
  }

  test("normalizeReleasetype: mapping, count assignment, flag appends") {
    val df = Seq(
      ("/m/A", "Album\\\\Live", "Rock", null: String, null: String, "/p1"),
      ("/m/A", " ep ", "Rock", null, null, "/p2"),
      ("/m/A", "Bogus Thing  ", "Rock", null, null, "/p3"),
      // singleton dir, null rt, non-jazz → Single
      ("/m/B", null: String, "Rock", null, null, "/p4"),
      // jazz rows are never count-assigned → OST/Studio fallback
      ("/m/C/OST/X", null, "Smooth Jazz", null, null, "/p5"),
      ("/m/D", null, "Classical Era", null, null, "/p6"),
      // flag appends: set / dup / append
      ("/m/E", null, "Rock", "1", "true", "/p7"),
      ("/m/F", "Soundtrack", "Rock", null, "true", "/p8"),
      ("/m/G", "Remix", "Rock", "true", null, "/p9"))
      .toDF("__dirpath", "releasetype", "genre",
        "isgreatesthits", "issoundtrack", "__path")
    val s = Seq(Steps.normalizeReleasetype())
    val (fin, _) = Pipeline.run(df, "__path", s)
    val m = fin.collect().map(x => x.getString(5) -> x.getString(1)).toMap
    assert(m("/p1") == "Live Album")
    assert(m("/p2") == "Extended Play")
    assert(m("/p3") == "Bogus Thing")
    assert(m("/p4") == "Single")
    assert(m("/p5") == "Soundtrack")     // /OST path beats Studio Album
    assert(m("/p6") == "Studio Album")
    assert(m("/p7") == "Single\\\\Greatest Hits & Anthologies\\\\Soundtrack")
    assert(m("/p8") == "Soundtrack")     // exact-segment dup → unchanged
    assert(m("/p9") == "Remix\\\\Greatest Hits & Anthologies")
    val (_, log2) = Pipeline.run(fin, "__path", s)
    assert(log2.count() == 0)
  }

  test("vettedMappings: whole-field first, then item-level with dedupe") {
    val dict = Map("the beatles" -> "The Beatles",
      "beatles" -> "The Beatles", "cream" -> "Cream",
      "duo" -> "A\\\\B")
    val df = Seq(
      ("/p1", "THE BEATLES"),                       // whole-field
      ("/p2", "beatles\\\\The Beatles\\\\Cale"),    // items map + dedupe
      ("/p3", "Unknown Artist"),                    // pass-through
      ("/p4", " cream "),                           // trim then match
      ("/p5", "duo"),                               // replacement is multi
      ("/p6", null: String))
      .toDF("__path", "contrib")
    val s = Seq(Steps.vettedMappings(Seq("contrib"), dict))
    val (fin, _) = Pipeline.run(df, "__path", s)
    val m = fin.collect().map(x => x.getString(0) ->
      Option(x.getString(1)).orNull).toMap
    assert(m("/p1") == "The Beatles")
    assert(m("/p2") == "The Beatles\\\\Cale")
    assert(m("/p3") == "Unknown Artist")
    assert(m("/p4") == "Cream")
    assert(m("/p5") == "A\\\\B") // whole-field hit, items pass as-is
    assert(m("/p6") == null)
    val (_, log2) = Pipeline.run(fin, "__path", s)
    assert(log2.count() == 0)
  }

  test("inferComposers fills empties from the group majority vote") {
    val df = Seq(
      ("/p1", "Song One", "", "Art A\\\\Other", null: String),
      ("/p2", "Song One (Live at X)", "Comp X", "art a", null),
      ("/p3", "song one!", "Comp X", "ART A", null),
      ("/p4", "Song One", "Comp Y", "Art A", null),
      ("/p5", "Song Two", "", "Nobody", null),
      // albumartist matches too (ref explodes both)
      ("/p6", "Song One", null: String, "Zed", "Art A"))
      .toDF("__path", "title", "composer", "artist", "albumartist")
    val s = Seq(Steps.inferComposers("__path"))
    val (fin, _) = Pipeline.run(df, "__path", s)
    val m = fin.collect().map(x => x.getString(0) ->
      Option(x.getString(2)).orNull).toMap
    assert(m("/p1") == "Comp X") // 2 votes X vs 1 Y on (song one, art a)
    assert(m("/p2") == "Comp X" && m("/p4") == "Comp Y") // set rows keep
    assert(m("/p5") == "")       // no votes for the group
    assert(m("/p6") == "Comp X") // via albumartist part
    val (_, log2) = Pipeline.run(fin, "__path", s)
    assert(log2.count() == 0)
  }

  test("albumDrPopulate overwrites only mapped directories") {
    import spark.implicits._
    val scores = Seq(("/m/a", "14"), ("/m/b", "9")).toDF("key", "dr")
    val df = Seq(("/m/a", null: String, "/p1"), ("/m/a", "12", "/p2"),
      ("/m/b", "9", "/p3"), ("/m/c", "7", "/p4"))
      .toDF("__dirpath", "album_dr", "__path")
    val s = Seq(Steps.albumDrPopulate(scores))
    val (fin, _) = Pipeline.run(df, "__path", s)
    val m = fin.collect().map(x => x.getString(2) ->
      Option(x.getString(1)).orNull).toMap
    assert(m("/p1") == "14" && m("/p2") == "14")
    assert(m("/p3") == "9" && m("/p4") == "7")
    val (_, log2) = Pipeline.run(fin, "__path", s)
    assert(log2.count() == 0)
  }

  test("liveMarkers strips title/album markers, gates subtitle+flag") {
    val df = Seq(
      ("/p1", "T (Live)", null: String, "A", "0"),
      ("/p2", "T - Live", "Acoustic\\\\Demo", "A", "0"),
      ("/p3", "T", "Set List", "A [live]", "0"),
      ("/p4", "T", "Quiet", "A", "0"),         // no marker → untouched
      ("/p5", "T (Live)", "Live in Paris", "A", "0"), // live word kept
      ("/p6", "T (Live)", "", "A", "0"))       // blank ≙ NULL → [Live]
      .toDF("__path", "title", "subtitle", "album", "live")
    val s = Seq(Steps.liveMarkers())
    val (fin, _) = Pipeline.run(df, "__path", s)
    val r = fin.orderBy("__path").collect()
    def row(i: Int) = (r(i).getString(1), Option(r(i).getString(2)).orNull,
      r(i).getString(3), r(i).getString(4))
    assert(row(0) == ("T", "[Live]", "A", "1"))
    assert(row(1) == ("T", "Acoustic; Demo; [Live]", "A", "1"))
    assert(row(2) == ("T", "Set List; [Live]", "A", "1"))
    assert(row(3) == ("T", "Quiet", "A", "0"))
    assert(row(4) == ("T", "Live in Paris", "A", "1"))
    assert(row(5) == ("T", "[Live]", "A", "1")) // not "; [Live]"
    val (_, log2) = Pipeline.run(fin, "__path", s)
    assert(log2.count() == 0)
  }
}
