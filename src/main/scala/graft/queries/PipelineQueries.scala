package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.Cdc
import graft.core.{MultiValue, Tables => T}
import graft.operators.WorkInference
import graft.ops.{Pipeline, Steps}

/** The reference's concrete numbered pipeline steps as CDC-audited,
  * driver-checked queries (SURVEY §3.2): involvedpeople role fan-out
  * merge (01), dictionary contributor normalization (06), genre/style
  * normalization (10), genre enrichment (11), and uuid assignment (16),
  * plus a composed multi-step run reporting the per-step changelog
  * summary — the way a reference user actually consumes the engine.
  * Every scenario is built deterministically from the test tables so
  * DuckDB can restate the expected outcome from first principles.
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  private val D = MultiValue.Delim

  /** customer with the packed involvedpeople string and per-target
    * existing values exercising casefold-dup / append / fill-null. */
  private def involvedTable(s: SparkSession, d: String): DataFrame =
    T.customer(s, d).select(
      col("c_custkey"),
      concat(lit("P"), (col("c_custkey") % 50).cast("string"),
        lit(", MainArtist - Q"), (col("c_custkey") % 30).cast("string"),
        lit(", ComposerLyricist, Producer")).as("packed"),
      when(col("c_custkey") % 3 === 0,
        concat(lit("p"), (col("c_custkey") % 50).cast("string")))
        .when(col("c_custkey") % 3 === 1, lit("X"))
        .otherwise(lit(null).cast("string")).as("albumartist"),
      lit(null).cast("string").as("composer"),
      concat(lit("Q"), (col("c_custkey") % 30).cast("string")).as("lyricist"))

  val defs: Map[String, Q] = Map(
    // 01: involvedpeople fan-out merge (ref 01-...py:136-253, 312-412).
    "pl_involved_merge" -> ((s, d) => {
      val (state, _) = Pipeline.run(involvedTable(s, d), "c_custkey",
        Seq(Steps.involvedPeopleMerge("packed")))
      state.select("c_custkey", "albumartist", "composer", "lyricist")
        .orderBy("c_custkey")
    }),

    // 06: dictionary contributor normalization (ref 06-...py:438-585):
    // dictionary = vetted nation names; the cell exercises the
    // conservative '&' split (both sides resolve, whole does not), the
    // ';' primary split, exact dedupe, and the smart-title fallback.
    "pl_dict_contributors" -> ((s, d) => {
      val dict = T.nation(s, d).select(lower(col("n_name")).as("k"),
        initcap(col("n_name")).as("v"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val table = T.customer(s, d)
        .join(broadcast(T.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"),
          concat(lower(col("n_name")), lit(" & "), upper(col("n_name")),
            lit(";"), lower(col("c_mktsegment"))).as("contrib"))
      val (state, _) = Pipeline.run(table, "c_custkey",
        Seq(Steps.dictContributors(Seq("contrib"), dict)))
      state.select("c_custkey", "contrib").orderBy("c_custkey")
    }),

    // 10: genre/style normalization against a validation table (ref
    // 10-...py:200-341, 556-637): mixed [,;|] delimiters harmonize,
    // unknown tags drop, hard-coded replacements apply first, style
    // merges into genre.
    "pl_genre_norm" -> ((s, d) => {
      import s.implicits._
      val valid = T.nation(s, d).select(initcap(col("n_name")).as("tag"))
        .union(Seq("Blues", "Swing").toDF("tag"))
      val table = T.customer(s, d)
        .join(broadcast(T.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"),
          concat(lower(col("n_name")), lit(", unknowntag; "),
            upper(col("n_name")), lit("|blues"),
            when(col("c_custkey") % 3 === 0, lit("|oldies"))
              .otherwise(lit(""))).as("genre"),
          when(col("c_custkey") % 2 === 0, lit("blues"))
            .otherwise(lit(null).cast("string")).as("style"))
      val (state, _) = Pipeline.run(table, "c_custkey",
        Seq(Steps.genreNormalize("c_custkey", "genre", "style", valid,
          hardCoded = Map("oldies" -> "Swing"))))
      state.select("c_custkey", "genre", "style").orderBy("c_custkey")
    }),

    // 11: genre enrichment from an artist-keyed reference (ref
    // 11-...py:367-425): only missing/generic genres enrich; tags
    // append with exact first-seen dedupe.
    "pl_genre_enrich" -> ((s, d) => {
      val ref = T.nation(s, d).select(col("n_nationkey"),
        concat(initcap(col("n_name")), lit(D), lit("Folk")).as("ref_genre"),
        lit("Roots").as("ref_styles"))
      val table = T.customer(s, d).select(col("c_custkey"),
        col("c_nationkey"),
        when(col("c_custkey") % 4 === 1, lit("Pop"))
          .when(col("c_custkey") % 4 === 2, lit("Jazz"))
          .when(col("c_custkey") % 4 === 3, lit("Settled"))
          .otherwise(lit(null).cast("string")).as("genre"),
        lit(null).cast("string").as("style"))
      val (state, _) = Pipeline.run(table, "c_custkey",
        Seq(Steps.genreEnrich("c_nationkey", ref)))
      state.select("c_custkey", "genre", "style").orderBy("c_custkey")
    }),

    // 16: uuid assignment (ref 16-...py:40-84): NULL/blank/non-v7 ids
    // get a fresh uuid7 (value non-deterministic → the oracle checks
    // the assignment decision and v7 shape, both deterministic).
    "pl_uuid_assign" -> ((s, d) => {
      val table = T.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 3 === 1, lit(""))
          .when(col("doc_id") % 3 === 2,
            concat(lit("00000000-0000-7000-8000-"),
              lpad(col("doc_id").cast("string"), 12, "0")))
          .otherwise(lit(null).cast("string")).as("track_uuid"))
        .withColumn("__orig", col("track_uuid"))
      val (state, _) = Pipeline.run(table, "doc_id",
        Seq(Steps.uuidAssign("track_uuid")))
      state.select(col("doc_id"),
        (!(col("track_uuid") <=> col("__orig"))).as("assigned"),
        col("track_uuid").rlike(
          "^[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}\\z")
          .as("is_v7"))
        .orderBy("doc_id")
    }),

    // 03a: artist case-correction against the disambiguated-contributor
    // table, else feature-prefix split (ref 03-...py:105-162).
    "pl_artist_features" -> ((s, d) => {
      val k = col("c_custkey")
      val canonical = T.nation(s, d)
        .select(initcap(lower(col("n_name"))).as("contributor"))
      val table = T.customer(s, d)
        .join(broadcast(T.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .select(k,
          when(k % 4 === 0, upper(col("n_name")))
            .when(k % 4 === 1, initcap(lower(col("n_name"))))
            .when(k % 4 === 2, concat(lit("Band"), (k % 9).cast("string"),
              lit(" feat. Guest"), (k % 7).cast("string")))
            .otherwise(concat(lit("Duo"), (k % 9).cast("string"),
              lit(" w/ Pal"), (k % 5).cast("string"))).as("artist"))
      val (state, _) = Pipeline.run(table, "c_custkey",
        Seq(Steps.artistFeatureSplit("artist", canonical)))
      state.select("c_custkey", "artist").orderBy("c_custkey")
    }),

    // 03b: bracketed title-suffix extraction routing into artist /
    // subtitle / live (ref 03-...py:165-271); one row per branch class.
    "pl_title_suffix" -> ((s, d) => {
      val k = col("c_custkey")
      val table = T.customer(s, d).select(k,
        when(k % 6 === 0, concat(lit("Track "), k.cast("string"),
            lit(" (feat. Gst"), (k % 7).cast("string"), lit(")")))
          .when(k % 6 === 1,
            concat(lit("Track "), k.cast("string"), lit(" (Live 1975)")))
          .when(k % 6 === 2,
            concat(lit("Track "), k.cast("string"), lit(" (Remaster 2011)")))
          .when(k % 6 === 3, concat(lit("Track "), k.cast("string"),
            lit(" [Acoustic Version]")))
          .when(k % 6 === 4,
            concat(lit("Track "), k.cast("string"), lit(" (Live At Here)")))
          .otherwise(concat(lit("Track "), k.cast("string"),
            lit(" (Oddball)"))).as("title"),
        when(k % 6 === 2, lit("[Remaster 2011]"))
          .when(k % 6 === 3, lit("[Demo]"))
          .when(k % 6 === 4, lit("Club Live At Night"))
          .otherwise(lit(null).cast("string")).as("subtitle"),
        concat(lit("Art"), (k % 9).cast("string")).as("artist"),
        lit("0").as("live"))
      val (state, _) = Pipeline.run(table, "c_custkey",
        Seq(Steps.titleSuffixExtract()))
      state.select("c_custkey", "title", "subtitle", "artist", "live")
        .orderBy("c_custkey")
    }),

    // 04: songwriter-field merge into composer (ref 04-...py:31-90):
    // ordered casefold dedupe across composer/arranger/lyricist/writer.
    "pl_songwriter_merge" -> ((s, d) => {
      val k = col("c_custkey")
      val table = T.customer(s, d).select(k,
        when(k % 3 === 0, concat(lit("Comp"), (k % 11).cast("string")))
          .when(k % 3 === 2, concat(lit("comp"), (k % 11).cast("string"),
            lit(D), lit("X"), (k % 5).cast("string")))
          .otherwise(lit(null).cast("string")).as("composer"),
        concat(lit("COMP"), (k % 11).cast("string")).as("arranger"),
        concat(lit("Lyr"), (k % 7).cast("string")).as("lyricist"),
        when(k % 2 === 0, concat(lit("X"), (k % 5).cast("string")))
          .otherwise(lit(null).cast("string")).as("writer"))
      val (state, _) = Pipeline.run(table, "c_custkey",
        Seq(Steps.songwriterMerge()))
      state.select("c_custkey", "composer").orderBy("c_custkey")
    }),

    // 07: vetted contributor mappings (ref 07-...py:145-213):
    // whole-field hit, item-level hits with dedupe, pass-through, and
    // the trim-then-match path.
    "pl_vetted_mappings" -> ((s, d) => {
      val k = col("c_custkey")
      val dict = T.nation(s, d).select(lower(col("n_name")).as("k"),
          concat(lit("V:"), col("n_name")).as("v"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val table = T.customer(s, d)
        .join(broadcast(T.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .select(k,
          when(k % 4 === 0, col("n_name"))
            .when(k % 4 === 1,
              concat(col("n_name"), lit(D), lower(col("n_name")),
                lit(D), lit("Zed")))
            .when(k % 4 === 2, concat(lit("x"), k.cast("string")))
            .otherwise(concat(lower(col("n_name")), lit(" ")))
          .as("contrib"))
      val (state, _) = Pipeline.run(table, "c_custkey",
        Seq(Steps.vettedMappings(Seq("contrib"), dict)))
      state.select("c_custkey", "contrib").orderBy("c_custkey")
    }),

    // 08: subtitle normalization (ref 08-...py:61-110): bracket
    // extraction + casefold dedupe + live-drop + word casing, legacy
    // delimiter migration for bracketless cells.
    "pl_subtitle_norm" -> ((s, d) => {
      val k = col("c_custkey")
      val table = T.customer(s, d).select(k,
        when(k % 5 === 0, concat(lit("live"), lit(D),
            lit("remaster "), (k % 10).cast("string")))
          .when(k % 5 === 1, lit("(Live) (Live At The BBC)"))
          .when(k % 5 === 2, lit("(remaster) (REMASTER)"))
          .when(k % 5 === 3, lit("(alt. take a.k.a demo)"))
          .otherwise(concat(lit("Plain note "), (k % 4).cast("string")))
          .as("subtitle"))
      val (state, _) = Pipeline.run(table, "c_custkey",
        Seq(Steps.normalizeSubtitles()))
      state.select("c_custkey", "subtitle").orderBy("c_custkey")
    }),

    // 09: live-marker normalization (ref 09-...py:71-134): strip the
    // trailing marker from title/album, migrate subtitle delimiters,
    // append [Live] when missing, set the live flag — gated on a
    // marker actually found (see Steps.liveMarkers scaladoc).
    "pl_live_markers" -> ((s, d) => {
      val k = col("c_custkey")
      val table = T.customer(s, d).select(k,
        when(k % 4 === 0, concat(lit("T"), k.cast("string"), lit(" (Live)")))
          .when(k % 4 === 1, concat(lit("T"), k.cast("string"), lit(" - Live")))
          .otherwise(concat(lit("T"), k.cast("string"))).as("title"),
        when(k % 4 === 1, concat(lit("Acoustic"), lit(D), lit("Demo")))
          .when(k % 4 === 2, lit("Live in Paris"))
          .when(k % 4 === 3, lit("Quiet"))
          .otherwise(lit(null).cast("string")).as("subtitle"),
        when(k % 4 === 2, concat(lit("A"), k.cast("string"), lit(" [live]")))
          .otherwise(concat(lit("A"), k.cast("string"))).as("album"),
        lit("0").as("live"))
      val (state, _) = Pipeline.run(table, "c_custkey",
        Seq(Steps.liveMarkers()))
      state.select("c_custkey", "title", "subtitle", "album", "live")
        .orderBy("c_custkey")
    }),

    // 12: compilation detection (ref 12-...py:64-200): artist-count
    // rules first (empty/various albumartist), path patterns for the
    // untouched remainder. Directory classes are derived from
    // c_custkey%40 so every rule fires somewhere.
    "pl_compilations" -> ((s, d) => {
      val k = col("c_custkey")
      val dd = expr("c_custkey % 40")
      val ac = expr("((c_custkey % 40) div 2) % 4")
      val multi = dd % 2 === 0
      val table = T.customer(s, d).select(k,
        when(dd % 8 === 4, concat(lit("/m/VA - Set"), dd.cast("string")))
          .otherwise(concat(lit("/m/Album"), dd.cast("string")))
          .as("__dirpath"),
        when(multi, concat(lit("Art"), (k % 3).cast("string")))
          .otherwise(concat(lit("Solo"), dd.cast("string"))).as("artist"),
        when(ac === 0, lit(""))
          .when(ac === 1, lit("Various Artists"))
          .when(ac === 2, concat(lit("Keeper"), dd.cast("string")))
          .otherwise(lit(null).cast("string")).as("albumartist"),
        lit("x").as("compilation"))
      val (state, _) = Pipeline.run(table, "c_custkey",
        Seq(Steps.detectCompilations()))
      state.select("c_custkey", "compilation", "albumartist")
        .orderBy("c_custkey")
    }),

    // 13: disc-number cleanup (ref 13-...py:76-180): identical
    // non-blank disc numbers clear per directory unless the directory
    // is a cd/disc leaf or the numbers genuinely vary.
    "pl_discnumber" -> ((s, d) => {
      val k = col("c_custkey")
      val dd = expr("c_custkey % 30")
      val table = T.customer(s, d).select(k,
        when(dd % 3 === 0, concat(lit("/m/Box"), dd.cast("string"),
            lit("/CD "), (dd % 2 + 1).cast("string")))
          .otherwise(concat(lit("/m/Alb"), dd.cast("string")))
          .as("__dirpath"),
        when(dd % 5 === 0, lit("1"))
          // stride-30 dirs keep k%2 constant, so vary on k%4 (two
          // residues per dir) to make a genuinely mixed directory
          .when(dd % 5 === 1, (k % 4).cast("string"))
          .when(dd % 5 === 2,
            when(k % 2 === 0, lit("")).otherwise(lit(null).cast("string")))
          .otherwise(lit("3")).as("discnumber"))
      val (state, _) = Pipeline.run(table, "c_custkey",
        Seq(Steps.cleanupDiscnumber()))
      state.select("c_custkey", "discnumber").orderBy("c_custkey")
    }),

    // 14: release-type normalization (ref 14-...py:159-482): mapping
    // lookup, per-directory count assignment for nulls (singleton S-dirs
    // → Single, 5-row E-dirs → Extended Play, /OST → Soundtrack, rest →
    // Studio Album), then the greatest-hits/soundtrack flag appends.
    "pl_releasetype" -> ((s, d) => {
      val k = col("c_custkey")
      val table = T.customer(s, d).select(k,
        when(k % 11 === 5, concat(lit("/m/S"), k.cast("string")))
          .when(k % 11 === 6,
            concat(lit("/m/E"), expr("c_custkey div 55").cast("string")))
          .when(k % 7 === 0,
            concat(lit("/m/OST/A"), (k % 11).cast("string")))
          .otherwise(concat(lit("/m/A"), (k % 11).cast("string")))
          .as("__dirpath"),
        when(k % 11 === 5 || k % 11 === 6, lit(null).cast("string"))
          .when(k % 5 === 0, lit("Album\\\\Live"))
          .when(k % 5 === 1, lit(" ep "))
          .when(k % 5 === 4, lit("Bogus Thing"))
          .otherwise(lit(null).cast("string")).as("releasetype"),
        when(k % 11 === 5 || k % 11 === 6, lit("Rock"))
          .when(k % 10 === 2, lit("Jazz Fusion"))
          .otherwise(lit("Rock")).as("genre"),
        when(k % 6 === 0, lit("1"))
          .otherwise(lit(null).cast("string")).as("isgreatesthits"),
        when(k % 9 === 0, lit("true"))
          .otherwise(lit(null).cast("string")).as("issoundtrack"))
      val (state, _) = Pipeline.run(table, "c_custkey",
        Seq(Steps.normalizeReleasetype()))
      state.select("c_custkey", "releasetype").orderBy("c_custkey")
    }),

    // 05: composer inference by majority vote (ref 05-...py:97-213):
    // every title-group shares a 'shared<m>' artist part, voters
    // (k%3=1) all carry 'C<m>', and empty composers adopt it.
    "pl_infer_composers" -> ((s, d) => {
      val k = col("c_custkey")
      val m = (k % 100).cast("string")
      val table = T.customer(s, d).select(k,
        concat(lit("Song "), m,
          when(k % 2 === 0, lit("!")).otherwise(lit("")),
          when(k % 7 === 0, lit(" (Live at X)")).otherwise(lit("")))
          .as("title"),
        when(k % 3 === 1, concat(lit("C"), m))
          .otherwise(lit(null).cast("string")).as("composer"),
        concat(lit("art"), (k % 30).cast("string"), lit(D),
          lit("shared"), m).as("artist"),
        lit(null).cast("string").as("albumartist"))
      val (state, _) = Pipeline.run(table, "c_custkey",
        Seq(Steps.inferComposers("c_custkey")))
      state.select("c_custkey", "composer").orderBy("c_custkey")
    }),

    // 19: album-DR population (ref 19-...py:61-100, 139-204): the
    // nation-built score table overwrites album_dr for even-keyed
    // directories; other rows pass through.
    "pl_album_dr" -> ((s, d) => {
      val k = col("c_custkey")
      val scores = T.nation(s, d).filter(col("n_nationkey") % 2 === 0)
        .select(concat(lit("/m/d"), col("n_nationkey").cast("string"))
          .as("key"),
          (lit(10) + col("n_nationkey") % 15).cast("string").as("dr"))
      val table = T.customer(s, d).select(k,
        concat(lit("/m/d"), (k % 25).cast("string")).as("__dirpath"),
        when(k % 4 === 0, lit(null).cast("string"))
          .when(k % 4 === 1, lit("7"))
          .otherwise(lit("12")).as("album_dr"))
      val (state, _) = Pipeline.run(table, "c_custkey",
        Seq(Steps.albumDrPopulate(scores)))
      state.select("c_custkey", "album_dr").orderBy("c_custkey")
    }),

    // 22: work-inference scoring (ref 22-...py:846-1440): closed-form
    // corpus — track k title-matches work m0=k%300 (unless hidden,
    // m0%3=2), workid-matches it at k%10=0, and alias-matches work
    // ma=m0-1 when ma%4=0; composer/mbid corroboration and the vetted
    // bonus follow residue rules the oracle restates exactly.
    "pl_infer_works" -> ((s, d) => {
      import s.implicits._
      val k = col("p_partkey")
      val tracks = T.part(s, d).select(k.as("track_id"),
        concat(lit("work "), (k % 300).cast("string")).as("title_norm"),
        when(k % 10 === 0, concat(lit("mb-"), (k % 300).cast("string")))
          .otherwise(lit(null).cast("string")).as("workid"),
        when(k % 4 <= 1, concat(lit("Person"), (k % 50).cast("string")))
          .otherwise(lit(null).cast("string")).as("composer"),
        when(k % 6 === 0,
          concat(lit("Person"), (k % 50 + 1).cast("string")))
          .otherwise(lit(null).cast("string")).as("lyricist"),
        when(k % 5 === 0, concat(lit("AMB-"), (k % 20).cast("string")))
          .otherwise(lit(null).cast("string")).as("artist_mbid"))
      val m = col("id")
      val lookup = s.range(0, 300).select(
        m.as("work_id"),
        concat(lit("mb-"), m.cast("string")).as("musicbrainz_workid"),
        when(m % 3 =!= 2, concat(lit("work "), m.cast("string")))
          .otherwise(concat(lit("hidden "), m.cast("string")))
          .as("work_title_norm"),
        when(m % 4 === 0,
          concat(lit("work "), ((m + 1) % 300).cast("string")))
          .otherwise(lit(null).cast("string")).as("alias_tokens"),
        when(m % 2 === 0,
          concat(lit("composer:person"), (m % 50).cast("string")))
          .otherwise(lit(null).cast("string")).as("role_names"),
        concat(lit("composer:amb-"), (m % 20).cast("string"))
          .as("role_mbids"),
        (m % 7 === 0).as("is_user_vetted"))
      WorkInference.inferWorks(tracks, "track_id", "title_norm", "workid",
        Map("composer" -> "composer", "lyricist" -> "lyricist"),
        Seq("artist_mbid"), lookup)
        .select("track_id", "best_work_id", "best_score",
          "runner_up_score", "candidate_count", "confidence_tier",
          "should_apply")
        .orderBy("track_id")
    }),

    // Composed chain in reference numbering order — 02 clean, 04
    // songwriter merge, 16 uuid, 20 dates — over disjoint columns, so
    // the oracle restates each step's effect independently; the uuid
    // value is nondeterministic, so the output carries the assignment
    // decision and v7-shape flags instead (like pl_uuid_assign).
    "pl_full_chain" -> ((s, d) => {
      val k = col("c_custkey")
      val table = T.customer(s, d).select(k,
        concat(lit("T  "), k.cast("string"), lit("\t")).as("title"),
        when(k % 3 === 0, concat(lit("Comp"), (k % 9).cast("string")))
          .otherwise(lit(null).cast("string")).as("composer"),
        concat(lit("COMP"), (k % 9).cast("string")).as("arranger"),
        lit(null).cast("string").as("lyricist"),
        lit(null).cast("string").as("writer"),
        lit(null).cast("string").as("track_uuid"),
        when(k % 2 === 0, lit("1999/03/12")).otherwise(lit("2001"))
          .as("year"))
      val (state, _) = Pipeline.run(table, "c_custkey", Seq(
        Steps.cleanText(Seq("title")),
        Steps.songwriterMerge(),
        Steps.uuidAssign("track_uuid"),
        Steps.canonDates(Seq("year"))))
      state.select(col("c_custkey"), col("title"), col("composer"),
        col("track_uuid").rlike(
          "^[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}\\z")
          .as("uuid_v7"),
        col("year")).orderBy("c_custkey")
    }),

    // Composed pipeline: 01 then 16 over one table, consuming the
    // per-step changelog summary — the reference's operational loop
    // (run numbered scripts, read the changelog report).
    "pl_steps_summary" -> ((s, d) => {
      val table = involvedTable(s, d)
        .withColumn("track_uuid", lit(null).cast("string"))
      val (_, log) = Pipeline.run(table, "c_custkey", Seq(
        Steps.involvedPeopleMerge("packed"),
        Steps.uuidAssign("track_uuid")))
      Cdc.summarize(log).orderBy("script", "column")
    }),
  )

  val sql: Map[String, String] = Map(
    // %3=0 rows: casefold-dup with existing 'p<n>' → unchanged; %3=1:
    // append behind 'X'; %3=2: fill the null. composer fills everywhere;
    // lyricist is an exact dup → untouched.
    "pl_involved_merge" ->
      """SELECT c_custkey,
        |CASE WHEN c_custkey % 3 = 0 THEN 'p' || CAST(c_custkey % 50 AS VARCHAR)
        |     WHEN c_custkey % 3 = 1 THEN 'X\\P' || CAST(c_custkey % 50 AS VARCHAR)
        |     ELSE 'P' || CAST(c_custkey % 50 AS VARCHAR) END AS albumartist,
        |'Q' || CAST(c_custkey % 30 AS VARCHAR) AS composer,
        |'Q' || CAST(c_custkey % 30 AS VARCHAR) AS lyricist
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // '&' splits (both sides resolve to the same canonical → one token),
    // ';' splits, the segment falls back to the surname-aware caser —
    // which Mac-cases 'machinery' → 'MacHinery' (the Mc/Mac prefix rule;
    // the oracle states the engine's documented behavior on this corpus).
    // DuckDB has no initcap — capitalize per word via list_transform.
    "pl_dict_contributors" ->
      """WITH cap AS (SELECT c_custkey,
        |  array_to_string(list_transform(string_split(lower(n_name), ' '),
        |    w -> upper(w[1]) || w[2:]), ' ') AS nat,
        |  CASE WHEN c_mktsegment = 'MACHINERY' THEN 'MacHinery'
        |    ELSE upper(c_mktsegment[1]) || lower(c_mktsegment[2:]) END AS seg
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |SELECT c_custkey, nat || '\\' || seg AS contrib
        |FROM cap ORDER BY c_custkey""".stripMargin,
    "pl_genre_norm" ->
      """WITH cap AS (SELECT c_custkey,
        |  array_to_string(list_transform(string_split(lower(n_name), ' '),
        |    w -> upper(w[1]) || w[2:]), ' ') AS nat
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |SELECT c_custkey,
        |nat || '\\Blues' ||
        |  CASE WHEN c_custkey % 3 = 0 THEN '\\Swing' ELSE '' END AS genre,
        |CASE WHEN c_custkey % 2 = 0 THEN 'Blues' ELSE NULL END AS style
        |FROM cap ORDER BY c_custkey""".stripMargin,
    "pl_genre_enrich" ->
      """WITH cap AS (SELECT c_custkey,
        |  array_to_string(list_transform(string_split(lower(n_name), ' '),
        |    w -> upper(w[1]) || w[2:]), ' ') AS nat
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |SELECT c_custkey,
        |CASE WHEN c_custkey % 4 = 1 THEN 'Pop\\' || nat || '\\Folk'
        |     WHEN c_custkey % 4 = 2 THEN 'Jazz\\' || nat || '\\Folk'
        |     WHEN c_custkey % 4 = 3 THEN 'Settled'
        |     ELSE nat || '\\Folk' END AS genre,
        |CASE WHEN c_custkey % 4 = 3 THEN NULL ELSE 'Roots' END AS style
        |FROM cap ORDER BY c_custkey""".stripMargin,
    "pl_uuid_assign" ->
      """SELECT doc_id, doc_id % 3 IN (0, 1) AS assigned, true AS is_v7
        |FROM documents ORDER BY doc_id""".stripMargin,
    // %4=0 upper-cased name case-corrects to the canonical Initcap form;
    // %4=1 is already canonical; the rest split at the feature marker.
    "pl_artist_features" ->
      """WITH cap AS (SELECT c_custkey,
        |  array_to_string(list_transform(string_split(lower(n_name), ' '),
        |    w -> upper(w[1]) || w[2:]), ' ') AS nat
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |SELECT c_custkey,
        |CASE WHEN c_custkey % 4 IN (0, 1) THEN nat
        |     WHEN c_custkey % 4 = 2 THEN 'Band' || CAST(c_custkey % 9 AS VARCHAR)
        |       || '\\Guest' || CAST(c_custkey % 7 AS VARCHAR)
        |     ELSE 'Duo' || CAST(c_custkey % 9 AS VARCHAR)
        |       || '\\Pal' || CAST(c_custkey % 5 AS VARCHAR) END AS artist
        |FROM cap ORDER BY c_custkey""".stripMargin,
    // feature bracket → artist append; live bracket → subtitle + flag
    // (the 'Live At' guard leaves %6=4's subtitle untouched); prefix /
    // trailing-word brackets → subtitle with duplicate check (%6=2 is
    // the dup); unmatched (%6=5) stays intact.
    "pl_title_suffix" ->
      """SELECT c_custkey,
        |CASE WHEN c_custkey % 6 = 5
        |     THEN 'Track ' || CAST(c_custkey AS VARCHAR) || ' (Oddball)'
        |     ELSE 'Track ' || CAST(c_custkey AS VARCHAR) END AS title,
        |CASE WHEN c_custkey % 6 = 1 THEN '[Live 1975]'
        |     WHEN c_custkey % 6 = 2 THEN '[Remaster 2011]'
        |     WHEN c_custkey % 6 = 3 THEN '[Demo]; [Acoustic Version]'
        |     WHEN c_custkey % 6 = 4 THEN 'Club Live At Night'
        |     ELSE NULL END AS subtitle,
        |CASE WHEN c_custkey % 6 = 0 THEN 'Art' || CAST(c_custkey % 9 AS VARCHAR)
        |       || '\\Gst' || CAST(c_custkey % 7 AS VARCHAR)
        |     ELSE 'Art' || CAST(c_custkey % 9 AS VARCHAR) END AS artist,
        |CASE WHEN c_custkey % 6 IN (1, 4) THEN '1' ELSE '0' END AS live
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // order is composer, arranger, lyricist, writer with casefold
    // first-seen dedupe: arranger always dups composer's first token
    // (or seeds it when composer is null, keeping ARRANGER'S casing),
    // writer dups %3=2's X token.
    "pl_songwriter_merge" ->
      """SELECT c_custkey,
        |CASE WHEN c_custkey % 3 = 0 THEN
        |       'Comp' || CAST(c_custkey % 11 AS VARCHAR)
        |       || '\\Lyr' || CAST(c_custkey % 7 AS VARCHAR)
        |       || CASE WHEN c_custkey % 2 = 0
        |          THEN '\\X' || CAST(c_custkey % 5 AS VARCHAR) ELSE '' END
        |     WHEN c_custkey % 3 = 1 THEN
        |       'COMP' || CAST(c_custkey % 11 AS VARCHAR)
        |       || '\\Lyr' || CAST(c_custkey % 7 AS VARCHAR)
        |       || CASE WHEN c_custkey % 2 = 0
        |          THEN '\\X' || CAST(c_custkey % 5 AS VARCHAR) ELSE '' END
        |     ELSE 'comp' || CAST(c_custkey % 11 AS VARCHAR)
        |       || '\\X' || CAST(c_custkey % 5 AS VARCHAR)
        |       || '\\Lyr' || CAST(c_custkey % 7 AS VARCHAR) END AS composer
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // %4=0 whole-field replaces; =1 item-maps the first two tokens to
    // the same value (dedupe) and passes Zed through; =2 is unmatched;
    // =3 trims then whole-field replaces.
    "pl_vetted_mappings" ->
      """SELECT c_custkey,
        |CASE WHEN c_custkey % 4 IN (0, 3) THEN 'V:' || n_name
        |     WHEN c_custkey % 4 = 1 THEN 'V:' || n_name || '\\Zed'
        |     ELSE 'x' || CAST(c_custkey AS VARCHAR) END AS contrib
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY c_custkey""".stripMargin,
    // %5=0 migrates the legacy delimiter; =1 drops the bare Live part;
    // =2 casefold-dedupes; =3 exercises first-word + after-dot casing;
    // =4 has no brackets and no delimiter → unchanged.
    "pl_subtitle_norm" ->
      """SELECT c_custkey,
        |CASE WHEN c_custkey % 5 = 0
        |       THEN 'live; remaster ' || CAST(c_custkey % 10 AS VARCHAR)
        |     WHEN c_custkey % 5 = 1 THEN '[Live At The BBC]'
        |     WHEN c_custkey % 5 = 2 THEN '[Remaster]'
        |     WHEN c_custkey % 5 = 3 THEN '[Alt. take a.K.A demo]'
        |     ELSE 'Plain note ' || CAST(c_custkey % 4 AS VARCHAR)
        |END AS subtitle
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // multi-artist dirs (even d) with empty/null/various albumartist →
    // compilation; single-artist dirs with empty albumartist backfill
    // and clear the flag; 'Keeper' dirs fall to the path rule (VA-set
    // paths exist only at d%8=4, which are Keeper dirs).
    "pl_compilations" ->
      """WITH e AS (SELECT c_custkey, c_custkey % 40 AS d,
        |  ((c_custkey % 40) // 2) % 4 AS ac,
        |  c_custkey % 40 % 2 = 0 AS multi FROM customer)
        |SELECT c_custkey,
        |CASE WHEN multi AND ac IN (0, 1, 3) THEN '1'
        |     WHEN NOT multi THEN '0'
        |     ELSE CASE WHEN d % 8 = 4 THEN '1' ELSE '0' END
        |END AS compilation,
        |CASE WHEN ac = 1 THEN 'Various Artists'
        |     WHEN ac = 2 THEN 'Keeper' || CAST(d AS VARCHAR)
        |     WHEN NOT multi THEN 'Solo' || CAST(d AS VARCHAR)
        |     WHEN ac = 0 THEN ''
        |     ELSE NULL END AS albumartist
        |FROM e ORDER BY c_custkey""".stripMargin,
    // identical-per-directory disc numbers clear (d%5 in 0,3,4) unless
    // the directory is a 'CD n' leaf (d%3=0); varying (d%5=1) and
    // all-blank (d%5=2) directories keep their values.
    "pl_discnumber" ->
      """WITH t AS (SELECT c_custkey, c_custkey % 30 AS d FROM customer)
        |SELECT c_custkey,
        |CASE WHEN d % 5 IN (0, 3, 4) AND d % 3 <> 0 THEN NULL
        |     WHEN d % 5 = 0 THEN '1'
        |     WHEN d % 5 IN (3, 4) THEN '3'
        |     WHEN d % 5 = 1 THEN CAST(c_custkey % 4 AS VARCHAR)
        |     ELSE CASE WHEN c_custkey % 2 = 0 THEN '' ELSE NULL END
        |END AS discnumber
        |FROM t ORDER BY c_custkey""".stripMargin,
    // full algorithm restated: mapping lookup (multi+single keys on the
    // lowered trimmed cell), eligible-count assignment per directory,
    // /OST and Studio-Album fallbacks, then the two flag appends with
    // the exact-segment duplicate check.
    "pl_releasetype" ->
      """WITH t AS (SELECT c_custkey,
        |  CASE WHEN c_custkey % 11 = 5 THEN '/m/S' || CAST(c_custkey AS VARCHAR)
        |       WHEN c_custkey % 11 = 6 THEN '/m/E' || CAST(c_custkey // 55 AS VARCHAR)
        |       WHEN c_custkey % 7 = 0 THEN '/m/OST/A' || CAST(c_custkey % 11 AS VARCHAR)
        |       ELSE '/m/A' || CAST(c_custkey % 11 AS VARCHAR) END AS dir,
        |  CASE WHEN c_custkey % 11 IN (5, 6) THEN NULL
        |       WHEN c_custkey % 5 = 0 THEN 'Album\\Live'
        |       WHEN c_custkey % 5 = 1 THEN ' ep '
        |       WHEN c_custkey % 5 = 4 THEN 'Bogus Thing'
        |       ELSE NULL END AS rt,
        |  CASE WHEN c_custkey % 11 IN (5, 6) THEN 'Rock'
        |       WHEN c_custkey % 10 = 2 THEN 'Jazz Fusion'
        |       ELSE 'Rock' END AS genre,
        |  c_custkey % 6 = 0 AS gh, c_custkey % 9 = 0 AS st
        |  FROM customer),
        |m AS (SELECT *, CASE WHEN rt IS NULL THEN NULL
        |    WHEN lower(trim(rt)) = 'album\\live' THEN 'Live Album'
        |    WHEN lower(trim(rt)) = 'ep' THEN 'Extended Play'
        |    ELSE trim(rt) END AS rt1 FROM t),
        |c AS (SELECT dir, COUNT(*) AS tc FROM m
        |  WHERE rt1 IS NULL AND lower(genre) NOT LIKE '%classical%'
        |    AND lower(genre) NOT LIKE '%jazz%' GROUP BY dir),
        |a AS (SELECT m.c_custkey, m.gh, m.st, CASE
        |    WHEN rt1 IS NULL AND lower(genre) NOT LIKE '%classical%'
        |      AND lower(genre) NOT LIKE '%jazz%' AND tc <= 3 THEN 'Single'
        |    WHEN rt1 IS NULL AND lower(genre) NOT LIKE '%classical%'
        |      AND lower(genre) NOT LIKE '%jazz%' AND tc <= 6
        |      THEN 'Extended Play'
        |    WHEN rt1 IS NULL AND dir LIKE '%/OST%' THEN 'Soundtrack'
        |    WHEN rt1 IS NULL THEN 'Studio Album'
        |    ELSE rt1 END AS rt2 FROM m LEFT JOIN c USING (dir)),
        |g AS (SELECT c_custkey, st, CASE WHEN gh THEN
        |    CASE WHEN rt2 IS NULL OR rt2 = ''
        |           THEN 'Greatest Hits & Anthologies'
        |         WHEN list_contains(string_split(rt2, '\\'),
        |           'Greatest Hits & Anthologies') THEN rt2
        |         ELSE rt2 || '\\Greatest Hits & Anthologies' END
        |    ELSE rt2 END AS rt3 FROM a)
        |SELECT c_custkey, CASE WHEN st THEN
        |    CASE WHEN rt3 IS NULL OR rt3 = '' THEN 'Soundtrack'
        |         WHEN list_contains(string_split(rt3, '\\'), 'Soundtrack')
        |           THEN rt3
        |         ELSE rt3 || '\\Soundtrack' END
        |  ELSE rt3 END AS releasetype
        |FROM g ORDER BY c_custkey""".stripMargin,
    // voters are the k%3=1 rows of each title group (same composer per
    // group by construction); every other row shares the group's
    // 'shared<m>' artist part, so it fills whenever a voter exists.
    "pl_infer_composers" ->
      """WITH base AS (SELECT c_custkey AS k, c_custkey % 100 AS m,
        |  c_custkey % 3 AS r FROM customer),
        |vote AS (SELECT m, COUNT(*) AS nv FROM base WHERE r = 1 GROUP BY m)
        |SELECT k AS c_custkey,
        |CASE WHEN r = 1 THEN 'C' || CAST(m AS VARCHAR)
        |     WHEN nv IS NOT NULL THEN 'C' || CAST(m AS VARCHAR)
        |     ELSE NULL END AS composer
        |FROM base LEFT JOIN vote USING (m) ORDER BY k""".stripMargin,
    // even directories (d%2=0) are in the score table → overwritten;
    // odd ones keep their initial value.
    "pl_album_dr" ->
      """SELECT c_custkey,
        |CASE WHEN (c_custkey % 25) % 2 = 0
        |       THEN CAST(10 + (c_custkey % 25) % 15 AS VARCHAR)
        |     WHEN c_custkey % 4 = 0 THEN NULL
        |     WHEN c_custkey % 4 = 1 THEN '7'
        |     ELSE '12' END AS album_dr
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // closed-form restatement: candidate m0 scores 35(title unless
    // hidden) + 70(workid) + 40*vetted-sources + 10(composer person) +
    // 10(artist mbid); alias candidate ma scores 20+40(vetted); best by
    // total (no ties by construction), tiers and guardrails per the
    // reference thresholds.
    "pl_infer_works" ->
      """WITH s AS (SELECT p_partkey AS k, p_partkey % 300 AS m0,
        |  (p_partkey % 300 + 299) % 300 AS ma,
        |  CASE WHEN p_partkey % 300 % 3 <> 2 THEN 35 ELSE 0 END AS a,
        |  CASE WHEN p_partkey % 10 = 0 THEN 70 ELSE 0 END AS b,
        |  CASE WHEN p_partkey % 300 % 2 = 0 AND p_partkey % 4 <= 1
        |    THEN 10 ELSE 0 END AS p,
        |  CASE WHEN p_partkey % 5 = 0 THEN 10 ELSE 0 END AS i
        |  FROM part),
        |u AS (SELECT k, m0, ma,
        |  CASE WHEN a + b > 0 THEN a + b
        |    + CASE WHEN m0 % 7 = 0 THEN 40 *
        |        ((CASE WHEN a > 0 THEN 1 ELSE 0 END)
        |          + (CASE WHEN b > 0 THEN 1 ELSE 0 END)) ELSE 0 END
        |    + p + i END AS t0,
        |  CASE WHEN ma % 4 = 0 THEN
        |    20 + CASE WHEN ma % 7 = 0 THEN 40 ELSE 0 END END AS ta,
        |  a > 0 AS et, b > 0 AS ew, (p + i) > 0 AS pm
        |  FROM s),
        |v AS (SELECT k,
        |  CASE WHEN t0 IS NOT NULL AND (ta IS NULL OR t0 > ta) THEN 'm0'
        |       WHEN ta IS NOT NULL THEN 'ma' END AS side,
        |  m0, ma, t0, ta, et, ew, pm FROM u),
        |w AS (SELECT k,
        |  CASE WHEN side = 'm0' THEN CAST(m0 AS BIGINT)
        |       WHEN side = 'ma' THEN CAST(ma AS BIGINT) END AS best_work_id,
        |  CAST(CASE WHEN side = 'm0' THEN t0
        |       WHEN side = 'ma' THEN ta ELSE 0 END AS BIGINT) AS best_score,
        |  CAST(CASE WHEN side = 'm0' THEN COALESCE(ta, 0)
        |       WHEN side = 'ma' THEN COALESCE(t0, 0)
        |       ELSE 0 END AS BIGINT) AS runner_up_score,
        |  CAST((CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END)
        |    + (CASE WHEN ta IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS candidate_count,
        |  side = 'm0' AND et AS bet, side = 'm0' AND ew AS bew,
        |  side = 'm0' AND pm AS bpm, side = 'ma' AS bea
        |  FROM v),
        |x AS (SELECT k, best_work_id, best_score, runner_up_score,
        |  candidate_count, bet, bew, bpm, bea,
        |  CASE WHEN best_work_id IS NULL THEN 'D'
        |       WHEN bew AND best_score >= 90
        |         AND best_score - runner_up_score >= 20 THEN 'A'
        |       WHEN best_score >= 80 AND best_score - runner_up_score >= 20
        |         AND bpm THEN 'B'
        |       WHEN best_score >= 60 THEN 'C'
        |       ELSE 'D' END AS confidence_tier FROM w)
        |SELECT k AS track_id, best_work_id, best_score, runner_up_score,
        |candidate_count, confidence_tier,
        |CAST(CASE WHEN confidence_tier IN ('A', 'B') AND best_score >= 80
        |  AND best_score - runner_up_score >= 20
        |  AND NOT (NOT bew AND NOT bet)
        |  AND NOT ((bet OR bea) AND NOT bpm)
        |  THEN 1 ELSE 0 END AS INT) AS should_apply
        |FROM x ORDER BY track_id""".stripMargin,
    // markers strip from title (%4=0,1) and album (%4=2); gated rows
    // get [Live] appended unless the subtitle already says live, and
    // the flag set; %4=3 has no marker → untouched.
    "pl_live_markers" ->
      """SELECT c_custkey,
        |'T' || CAST(c_custkey AS VARCHAR) AS title,
        |CASE WHEN c_custkey % 4 = 0 THEN '[Live]'
        |     WHEN c_custkey % 4 = 1 THEN 'Acoustic; Demo; [Live]'
        |     WHEN c_custkey % 4 = 2 THEN 'Live in Paris'
        |     ELSE 'Quiet' END AS subtitle,
        |'A' || CAST(c_custkey AS VARCHAR) AS album,
        |CASE WHEN c_custkey % 4 = 3 THEN '0' ELSE '1' END AS live
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // each step touches its own column: trailing tab + double space
    // collapse (02), arranger merges behind/into composer with casefold
    // dedupe (04), every null uuid assigns v7 (16), slashed dates dash
    // (20).
    "pl_full_chain" ->
      """SELECT c_custkey,
        |'T ' || CAST(c_custkey AS VARCHAR) AS title,
        |CASE WHEN c_custkey % 3 = 0
        |       THEN 'Comp' || CAST(c_custkey % 9 AS VARCHAR)
        |     ELSE 'COMP' || CAST(c_custkey % 9 AS VARCHAR) END AS composer,
        |true AS uuid_v7,
        |CASE WHEN c_custkey % 2 = 0 THEN '1999-03-12' ELSE '2001' END
        |  AS year
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // step 01 logs albumartist appends (%3=1 modify, %3=2 add) and the
    // composer fill (every row an add); lyricist never changes so no
    // row; step 16 adds a uuid to every row.
    "pl_steps_summary" ->
      """SELECT * FROM (
        |SELECT '01_involved_merge' AS script, 'albumartist' AS "column",
        |  CAST(SUM(CASE WHEN c_custkey % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_changes,
        |  CAST(COUNT(DISTINCT CASE WHEN c_custkey % 3 <> 0 THEN c_custkey END)
        |    AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN c_custkey % 3 = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_add,
        |  CAST(0 AS BIGINT) AS n_delete,
        |  CAST(SUM(CASE WHEN c_custkey % 3 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_modify,
        |  CAST(0 AS BIGINT) AS n_noop
        |FROM customer
        |UNION ALL
        |SELECT '01_involved_merge', 'composer', COUNT(*),
        |  COUNT(DISTINCT c_custkey), COUNT(*), 0, 0, 0 FROM customer
        |UNION ALL
        |SELECT '16_uuid_assign', 'track_uuid', COUNT(*),
        |  COUNT(DISTINCT c_custkey), COUNT(*), 0, 0, 0 FROM customer)
        |ORDER BY script, "column"""".stripMargin,
  )
}
