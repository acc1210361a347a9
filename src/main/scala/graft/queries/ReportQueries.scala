package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.reports.Insights

/** Dashboard/report branches (SURVEY §3.3): one cached base frame
  * feeding independent aggregation branches — the 92-library-insights
  * shape with result tables instead of HTML.
  */
object ReportQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic alib-shaped roles/ReplayGain fixture from customer
    * (the synthesis convention rp_missing_critical uses): stride-40
    * album roots; decimal-grid signed gains with modular nulls
    * (multiples of 0.1 / 0.001 keep interpolated quantiles on a 0.01
    * grid, far from 6-dp rounding boundaries); multi-value producer
    * cells on the tagminder \\ delimiter; engineer with null AND blank
    * gaps; single-value label. Shared by rp_quality_quantiles /
    * rp_top_roles / rp_role_pairs. */
  private def roleTracks(s: SparkSession, d: String): DataFrame = {
    val k = col("c_custkey")
    graft.core.Tables.customer(s, d).select(
      concat(lit("/m/A"), (k % 40).cast("string")).as("album_root"),
      when(k % 11 === 0, lit(null).cast("double"))
        .otherwise((-(k % 240)).cast("double") / 10.0).as("rg_album_gain_db"),
      when(k % 7 === 0, lit(null).cast("double"))
        .otherwise((k % 1300).cast("double") / 1000.0).as("rg_album_peak"),
      when(k % 13 === 0, lit(null).cast("double"))
        .otherwise(((k * 3) % 200 - 100).cast("double") / 10.0)
        .as("rg_track_gain_db"),
      when(k % 29 === 0, lit(null).cast("string"))
        .when(k % 3 === 0, concat(lit("P"), (k % 7).cast("string")))
        .otherwise(concat(lit("P"), (k % 7).cast("string"), lit("\\\\"),
          lit("P"), ((k % 11) + 7).cast("string"))).as("producer"),
      when(k % 31 === 0, lit(null).cast("string"))
        .when(k % 17 === 0, lit(""))
        .otherwise(concat(lit("E"), (k % 5).cast("string"))).as("engineer"),
      when(k % 19 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("L"), (k % 9).cast("string"))).as("label"),
      // albumartist: multi-value every 6th row, null every 23rd; the
      // token vocabulary wraps mod 12 so artists span many albums
      when(k % 23 === 0, lit(null).cast("string"))
        .when(k % 6 === 0, concat(lit("AA"), (k % 12).cast("string"),
          lit("\\\\"), lit("AA"), ((k % 12 + 1) % 12).cast("string")))
        .otherwise(concat(lit("AA"), (k % 12).cast("string")))
        .as("albumartist"),
      // one year per album root (functionally dependent on k % 40),
      // repeating mod 7 so distinct-years < albums per artist; every
      // 11th album has no year (exercises the fill-to-1 fallback)
      when((k % 40) % 11 === 0, lit(null).cast("int"))
        .otherwise((lit(1970) + (k % 40) % 7).cast("int")).as("album_year"),
      // genre: one family per album root (so the album-scope bucket
      // waterfall sees clean buckets), multi-value for the jazz/rock
      // families, 'Blues' → the Other bucket, nulls every 37th row
      when(k % 37 === 0, lit(null).cast("string"))
        .when(k % 40 % 5 === 0, lit("Classical"))
        .when(k % 40 % 5 === 1, lit("Jazz\\\\Bebop"))
        .when(k % 40 % 5 === 2, lit("Rock\\\\Indie"))
        .when(k % 40 % 5 === 3, lit("Techno"))
        .otherwise(lit("Blues")).as("genre"),
      // composer: multi-value every 4th row, null every 41st; wraps
      // mod 6 so composers span albums (the classical-roles branch)
      when(k % 41 === 0, lit(null).cast("string"))
        .when(k % 4 === 0, concat(lit("C"), (k % 6).cast("string"),
          lit("\\\\"), lit("C"), ((k % 6) + 6).cast("string")))
        .otherwise(concat(lit("C"), (k % 6).cast("string"))).as("composer"),
      // conductor: single-value, null every 43rd, wraps mod 4
      when(k % 43 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("K"), (k % 4).cast("string"))).as("conductor"),
      // title: wraps mod 30 so one composition recurs across albums;
      // case and whitespace variants exercise the most-instances key
      // normalization (lower + ws-collapse + trim)
      when(k % 53 === 0, lit(null).cast("string"))
        .when(k % 9 === 0, concat(lit("TTL  "), (k % 30).cast("string")))
        .otherwise(concat(lit("Ttl "), (k % 30).cast("string"))).as("title"),
      // artist: distinct from albumartist; multi-value every 8th, null
      // every 47th, wraps mod 15 (performer diversity per composition)
      when(k % 47 === 0, lit(null).cast("string"))
        .when(k % 8 === 0, concat(lit("Ar"), (k % 15).cast("string"),
          lit("\\\\"), lit("Ar"), ((k % 15 + 5) % 15).cast("string")))
        .otherwise(concat(lit("Ar"), (k % 15).cast("string"))).as("artist"))
  }

  /** Classified quality fixture shared by rp_quality_matrix /
    * rp_format_breakdown (ref 92-...py:1045-1110): the part-table
    * synthesis plus the reference's lossless-classification waterfall
    * — DSD (bps=1) → lossless, known lossy codecs → lossy, known
    * lossless containers → lossless, bit depth >0 → lossless,
    * ambiguous containers without bit depth → lossy, else unknown —
    * with channels and bitrate columns for the breakdown tables. */
  private def qualityTracks(s: SparkSession, d: String): DataFrame = {
    val k = col("p_partkey")
    val m11 = k % 11
    val tracks = graft.core.Tables.part(s, d).select(
      when(m11 === 0, lit("FLAC")).when(m11 === 1, lit("MP3"))
        .when(m11 === 2, lit("Ogg Vorbis")).when(m11 === 3, lit("WavPack"))
        .when(m11 === 4, lit("AIFF")).when(m11 === 5, lit("Opus"))
        .when(m11 === 6, lit("M4A")).when(m11 === 7, lit("WMA"))
        .when(m11 === 8, lit("DSF")).when(m11 === 9, lit(""))
        .otherwise(lit(null).cast("string")).as("filetype"),
      when(k % 13 === 0, lit("1")).when(k % 3 === 0, lit("16"))
        .when(k % 3 === 1, lit("24")).when(k % 17 === 0, lit("0"))
        .otherwise(lit(null).cast("string")).as("bps_raw"),
      when(k % 4 === 0, lit(44.1)).when(k % 4 === 1, lit(48.0))
        .when(k % 4 === 2, lit(96.0))
        .otherwise(lit(null).cast("double")).as("freq_khz"),
      // channels: stereo default, 6-channel every 5th, null every 23rd
      when(k % 23 === 0, lit(null).cast("int"))
        .when(k % 5 === 0, lit(6)).otherwise(lit(2)).as("ch"),
      // bitrate (kbps): meaningful for the lossy rows; null every 29th
      when(k % 29 === 0, lit(null).cast("int"))
        .when(k % 6 === 0, lit(320)).when(k % 6 === 1, lit(256))
        .when(k % 6 === 2, lit(192)).otherwise(lit(128)).as("br"))
    val ftLc = lower(col("filetype"))
    val bpsRaw = col("bps_raw").cast("long")
    val bps = when(bpsRaw.isNotNull && bpsRaw > 0, bpsRaw)
    val lossless = Seq("flac", "wav", "wave", "aiff", "aif", "ape",
      "wavpack", "wv", "w64", "tta", "dsf", "dff", "alac")
    val lossy = Seq("mp3", "ogg vorbis", "vorbis", "opus", "aac")
    val isLossless = when(bps === 1, true)
      .when(ftLc.isin(lossy: _*), false)
      .when(ftLc.isin(lossless: _*), true)
      .when(bps.isNotNull && bps > 0, true)
      .when(ftLc.isin("m4a", "mp4", "wma") && bps.isNull, false)
      .otherwise(lit(null).cast("boolean"))
    tracks
      .withColumn("quality", when(isLossless === true, "lossless")
        .when(isLossless === false, "lossy").otherwise("unknown"))
      .withColumn("dsd", coalesce(bps === 1, lit(false)))
      .withColumn("bps", bps)
  }

  val defs: Map[String, Q] = Map(
    // Per-album ReplayGain quality/dynamics quantiles (ref
    // 92-...py:1289-1304): median album gain, max peak, non-null
    // counts, p90-p10 track-gain spread.
    "rp_quality_quantiles" -> ((s, d) =>
      Insights.qualityQuantiles(roleTracks(s, d))),
    // Top-N role tokens by distinct-album count (ref :1883-2715):
    // producer (multi-value) and label vocabularies in one table.
    "rp_top_roles" -> ((s, d) =>
      Insights.topRoles(roleTracks(s, d), Seq("producer", "label"),
        topN = 10)),
    // Producer<->engineer collaboration (ref :2471-2560 section 7c).
    "rp_role_pairs" -> ((s, d) =>
      Insights.rolePairs(roleTracks(s, d), "producer", "engineer",
        topN = 20)),
    // Artist depth vs breadth (ref :1880-1896): albums vs distinct
    // release years per albumartist token.
    "rp_artist_depth" -> ((s, d) =>
      Insights.artistDepth(roleTracks(s, d), topN = 600)),
    // ReplayGain dynamics trend by year (ref :1684-1700, PLR proxy
    // :1253-1258).
    "rp_rg_trend" -> ((s, d) => Insights.rgTrend(roleTracks(s, d))),
    // Most/least dynamic albums by PLR proxy (ref :1560-1660).
    "rp_dynamics_extremes" -> ((s, d) =>
      Insights.dynamicsExtremes(roleTracks(s, d), topN = 10)),
    // ReplayGain by genre bucket (ref :3129-3208).
    "rp_rg_by_genre" -> ((s, d) => Insights.rgByGenre(roleTracks(s, d))),
    "rp_kpis" -> ((s, d) => Insights.kpis(Insights.base(s, d))),
    "rp_yearly" -> ((s, d) => Insights.yearlyTrends(Insights.base(s, d))),
    "rp_priority_mix" -> ((s, d) => Insights.priorityMix(Insights.base(s, d))),
    "rp_decades" -> ((s, d) => Insights.decadeTrends(Insights.base(s, d))),
    "rp_year_mode" -> ((s, d) => Insights.yearMode(Insights.base(s, d))),
    "rp_acquisition" -> ((s, d) =>
      Insights.acquisitionTimeline(Insights.base(s, d))),
    // one-pass column profile of orders (the 96-sanity-report shape)
    "rp_profile" -> ((s, d) =>
      graft.operators.Profile.profile(graft.core.Tables.orders(s, d),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority"))
        .orderBy("col_name")),
    // Persona scoring over an alib-shaped fixture: multi-value genre
    // cells (tagminder \\ delimiter), sparse style, modular role
    // columns — exercises token-vocabulary shares, role-share means,
    // max-combine, and the 0.22 argmax threshold.
    "rp_persona" -> ((s, d) => {
      val k = col("c_custkey")
      val tracks = graft.core.Tables.customer(s, d).select(
        when(k % 5 === 0, lit("Jazz\\\\Hard Bop"))
          .when(k % 5 === 1, lit("Rock\\\\Indie"))
          .when(k % 5 === 2, lit("Classical"))
          .when(k % 5 === 3, lit("Techno"))
          .otherwise(lit(null).cast("string")).as("genre"),
        when(k % 7 === 0, lit("Baroque")).otherwise(lit("")).as("style"),
        when(k % 2 === 0, lit("C")).otherwise(lit(null).cast("string"))
          .as("composer"),
        when(k % 3 === 0, lit("K")).otherwise(lit("")).as("conductor"),
        when(k % 4 === 0, lit("O")).otherwise(lit(null).cast("string"))
          .as("orchestra"),
        when(k % 4 === 0, lit("R")).otherwise(lit(null).cast("string"))
          .as("remixer"),
        when(k % 8 === 0, lit("P")).otherwise(lit("")).as("producer"))
      Insights.personaScores(tracks,
        classicalRoles = Seq("composer", "conductor", "orchestra"),
        electronicRoles = Seq("remixer", "producer"))
    }),
    // Quality-matrix branch (ref 92-...py:1045-1110): the
    // filetype/bit-depth lossless-classification waterfall — DSD
    // (bps=1) → lossless, known lossy codecs → lossy, known lossless
    // containers → lossless, bit depth >0 → lossless, ambiguous
    // containers without bit depth → lossy, else unknown — rolled up
    // into the (class, bps, freq) histogram the dashboard plots.
    "rp_quality_matrix" -> ((s, d) =>
      qualityTracks(s, d)
        .groupBy("quality", "dsd", "bps", "freq_khz")
        .agg(count(lit(1)).as("n"))
        .orderBy("quality", "dsd", "bps", "freq_khz")),
    // Lossless/lossy format breakdown (ref 92-...py:1126-1245): per
    // codec class the (filetype, channels, depth-or-rate, frequency)
    // histogram with share-of-class percentages.
    "rp_format_breakdown" -> ((s, d) =>
      Insights.formatBreakdown(qualityTracks(s, d))),
    // Classical top composers and conductors (ref :3379, :3470):
    // track-genre-scoped distinct-album counts, both roles in one
    // table.
    "rp_classical_roles" -> ((s, d) =>
      Insights.genreTopRoles(roleTracks(s, d),
        Seq("classical", "baroque", "romantic", "opera", "symphony",
          "chamber"),
        Seq("composer", "conductor"), topN = 10)),
    // Jazz top artists (ref :3498): album-scoped jazz roots joined to
    // the global distinct (album, albumartist) pairs.
    "rp_jazz_artists" -> ((s, d) =>
      Insights.genreAlbumTopArtists(roleTracks(s, d),
        Seq("jazz", "bebop", "hard bop", "swing", "fusion"),
        "albumartist", topN = 10)),
    // Classical top album artists (ref :3480): the same album-scoped
    // shape over the classical roots.
    "rp_classical_artists" -> ((s, d) =>
      Insights.genreAlbumTopArtists(roleTracks(s, d),
        Seq("classical", "baroque", "romantic", "opera", "symphony",
          "chamber"),
        "albumartist", topN = 10)),
    // Jazz and Rock/Pop top composers (ref :3525, :3440) in one table
    // with a bucket discriminator — track-genre-scoped like
    // rp_classical_roles.
    "rp_genre_composers" -> ((s, d) => {
      val t = roleTracks(s, d)
      Insights.genreTopRoles(t,
          Seq("jazz", "bebop", "hard bop", "swing", "fusion"),
          Seq("composer"), topN = 10)
        .withColumn("bucket", lit("jazz"))
        .unionByName(Insights.genreTopRoles(t,
            Seq("rock", "pop", "indie", "alternative", "metal", "punk",
              "grunge", "folk"),
            Seq("composer"), topN = 10)
          .withColumn("bucket", lit("rockpop")))
        .orderBy("bucket", "rank")
    }),
    // Loudest/quietest albums by median album gain (ref "ReplayGain —
    // Loudest/Quietest albums" brick charts).
    "rp_gain_extremes" -> ((s, d) =>
      Insights.gainExtremes(roleTracks(s, d), topN = 10)),
    // Top compositions by performer diversity per genre bucket (ref
    // :2874 _most_instances_card at :3388-3420).
    "rp_most_instances" -> ((s, d) => {
      val t = roleTracks(s, d)
      Seq(
        "classical" -> Seq("classical", "baroque", "romantic", "opera",
          "symphony", "chamber"),
        "jazz" -> Seq("jazz", "bebop", "hard bop", "swing", "fusion"),
        "rockpop" -> Seq("rock", "pop", "indie", "alternative", "metal",
          "punk", "grunge", "folk"))
        .map { case (b, v) =>
          Insights.mostInstances(t, v, topN = 20)
            .withColumn("bucket", lit(b))
        }
        .reduce(_ unionByName _)
        .orderBy(col("bucket"), col("distinct_artists").desc,
          col("tracks").desc, col("composer_key"), col("title_key"))
    }),
    // Report 94: missing-critical-tags-by-album exception table over a
    // deterministic alib-shaped fixture from customer (the
    // PipelineQueries synthesis convention): stride-40 albums, every
    // 8th a CD-subfolder box set (exercises album-root collapse),
    // every 8th+4 a compilation (exercises the albumartist waiver),
    // and modular null/blank/whitespace gaps in each critical column.
    "rp_missing_critical" -> ((s, d) => {
      val k = col("c_custkey")
      val dd = expr("c_custkey % 40")
      val tracks = graft.core.Tables.customer(s, d).select(
        when(dd % 8 === 3, concat(lit("/m/Box"), dd.cast("string"),
            lit("/CD "), (dd % 2 + 1).cast("string")))
          .otherwise(concat(lit("/m/Album"), dd.cast("string")))
          .as("__dirpath"),
        when(k % 17 === 0, lit(null).cast("string"))
          .when(k % 19 === 0, lit(""))
          .when(k % 23 === 0, lit(" "))
          .otherwise(concat(lit("T"), k.cast("string"))).as("title"),
        when(k % 13 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("A"), dd.cast("string"))).as("artist"),
        when(dd % 5 === 0 && k % 3 === 0, lit(""))
          .otherwise(concat(lit("AA"), dd.cast("string"))).as("albumartist"),
        when(dd % 8 === 4, lit(1)).otherwise(lit(0)).as("compilation"))
      Insights.missingCriticalTags(tracks, "__dirpath",
        Seq("title", "artist", "albumartist"),
        compilationCol = Some("compilation"))
    }),

    // The Library-Health radar axes (ref 92-report-library-health.py)
    // over the rp_missing_critical fixture: per-field track-level
    // non-compliance and album-level impact.
    "rp_health_radar" -> ((s, d) => {
      val k = col("c_custkey")
      val dd = expr("c_custkey % 40")
      val tracks = graft.core.Tables.customer(s, d).select(
        when(dd % 8 === 3, concat(lit("/m/Box"), dd.cast("string"),
            lit("/CD "), (dd % 2 + 1).cast("string")))
          .otherwise(concat(lit("/m/Album"), dd.cast("string")))
          .as("__dirpath"),
        when(k % 17 === 0, lit(null).cast("string"))
          .when(k % 19 === 0, lit(""))
          .when(k % 23 === 0, lit(" "))
          .otherwise(concat(lit("T"), k.cast("string"))).as("title"),
        when(k % 13 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("A"), dd.cast("string"))).as("artist"),
        when(dd % 5 === 0 && k % 3 === 0, lit(""))
          .otherwise(concat(lit("AA"), dd.cast("string"))).as("albumartist"),
        when(dd % 8 === 4, lit(1)).otherwise(lit(0)).as("compilation"))
      Insights.healthRadar(tracks, "__dirpath",
          Seq("title", "artist", "albumartist"),
          compilationCol = Some("compilation"))
        .orderBy("field")
    }),
    // VA / compilation classification (ref 92-...py:852-895) over a
    // fixture planting every VA spelling the reference's set matches:
    // exact "Various Artists" (album 0), whitespace+case " VA " (album
    // 1), a multi-value cell whose FIRST token is "various" (album 2 —
    // exercises token-level matching, not whole-cell), plus the
    // stride-10 compilation flag so va/comp overlap and diverge.
    "rp_va_classification" -> ((s, d) => {
      val k = col("c_custkey")
      val dd = k % 40
      val tracks = graft.core.Tables.customer(s, d).select(
        concat(lit("/m/A"), dd.cast("string")).as("album_root"),
        when(dd === 0, lit("Various Artists"))
          .when(dd === 1, lit("  VA "))
          .when(dd === 2, lit("various\\\\AA3"))
          .when(k % 23 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("AA"), (k % 12).cast("string")))
          .as("albumartist"),
        when(dd % 10 === 5, lit(1)).otherwise(lit(0)).as("compilation"))
      Insights.vaClassification(tracks, "album_root", "albumartist",
        "compilation")
    }),
    // Library KPI tiles (ref 92-...py:897-921): size/duration/format
    // header metrics over a tracks fixture with multi-value
    // albumartist cells and a null-gapped filetype column.
    "rp_library_kpis" -> ((s, d) => {
      val k = col("c_custkey")
      val tracks = graft.core.Tables.customer(s, d).select(
        concat(lit("/m/A"), (k % 40).cast("string")).as("album_root"),
        when(k % 23 === 0, lit(null).cast("string"))
          .when(k % 6 === 0, concat(lit("AA"), (k % 12).cast("string"),
            lit("\\\\"), lit("AA"), ((k % 12 + 1) % 12).cast("string")))
          .otherwise(concat(lit("AA"), (k % 12).cast("string")))
          .as("albumartist"),
        (lit(30) + k % 300).cast("double").as("duration_s"),
        (lit(1000000L) + (k % 7919) * 1000L).as("size_bytes"),
        when(k % 11 === 0, lit(null).cast("string"))
          .when(k % 11 === 1, lit("MP3"))
          .when(k % 11 === 2, lit("FLAC"))
          .otherwise(lit("Ogg Vorbis")).as("filetype"))
      Insights.libraryKpis(tracks, "album_root", "albumartist",
        "duration_s", "size_bytes", "filetype")
    }),
  )

  /** DuckDB restatement of [[roleTracks]] (interpolated into the three
    * role/quality oracles). `\\` in this triple-quoted literal is two
    * backslash characters — the tagminder delimiter, no escape
    * processing on either side. */
  private val RoleTracksSql: String =
    """SELECT '/m/A' || (c_custkey % 40) AS album_root,
      |CASE WHEN c_custkey % 11 = 0 THEN NULL
      |  ELSE -((c_custkey % 240) / CAST(10 AS DOUBLE)) END AS rg_album_gain_db,
      |CASE WHEN c_custkey % 7 = 0 THEN NULL
      |  ELSE (c_custkey % 1300) / CAST(1000 AS DOUBLE) END AS rg_album_peak,
      |CASE WHEN c_custkey % 13 = 0 THEN NULL
      |  ELSE ((c_custkey * 3) % 200 - 100) / CAST(10 AS DOUBLE)
      |  END AS rg_track_gain_db,
      |CASE WHEN c_custkey % 29 = 0 THEN NULL
      |  WHEN c_custkey % 3 = 0 THEN 'P' || (c_custkey % 7)
      |  ELSE 'P' || (c_custkey % 7) || '\\P' || ((c_custkey % 11) + 7)
      |  END AS producer,
      |CASE WHEN c_custkey % 31 = 0 THEN NULL
      |  WHEN c_custkey % 17 = 0 THEN ''
      |  ELSE 'E' || (c_custkey % 5) END AS engineer,
      |CASE WHEN c_custkey % 19 = 0 THEN NULL
      |  ELSE 'L' || (c_custkey % 9) END AS label,
      |CASE WHEN c_custkey % 23 = 0 THEN NULL
      |  WHEN c_custkey % 6 = 0
      |    THEN 'AA' || (c_custkey % 12) || '\\AA' || ((c_custkey % 12 + 1) % 12)
      |  ELSE 'AA' || (c_custkey % 12) END AS albumartist,
      |CASE WHEN (c_custkey % 40) % 11 = 0 THEN NULL
      |  ELSE CAST(1970 + (c_custkey % 40) % 7 AS INT) END AS album_year,
      |CASE WHEN c_custkey % 37 = 0 THEN NULL
      |  WHEN c_custkey % 40 % 5 = 0 THEN 'Classical'
      |  WHEN c_custkey % 40 % 5 = 1 THEN 'Jazz\\Bebop'
      |  WHEN c_custkey % 40 % 5 = 2 THEN 'Rock\\Indie'
      |  WHEN c_custkey % 40 % 5 = 3 THEN 'Techno'
      |  ELSE 'Blues' END AS genre,
      |CASE WHEN c_custkey % 41 = 0 THEN NULL
      |  WHEN c_custkey % 4 = 0
      |    THEN 'C' || (c_custkey % 6) || '\\C' || ((c_custkey % 6) + 6)
      |  ELSE 'C' || (c_custkey % 6) END AS composer,
      |CASE WHEN c_custkey % 43 = 0 THEN NULL
      |  ELSE 'K' || (c_custkey % 4) END AS conductor,
      |CASE WHEN c_custkey % 53 = 0 THEN NULL
      |  WHEN c_custkey % 9 = 0 THEN 'TTL  ' || (c_custkey % 30)
      |  ELSE 'Ttl ' || (c_custkey % 30) END AS title,
      |CASE WHEN c_custkey % 47 = 0 THEN NULL
      |  WHEN c_custkey % 8 = 0
      |    THEN 'Ar' || (c_custkey % 15) || '\\Ar' || ((c_custkey % 15 + 5) % 15)
      |  ELSE 'Ar' || (c_custkey % 15) END AS artist
      |FROM customer""".stripMargin

  private def tokSql(c: String): String =
    s"unnest(list_filter(list_transform(string_split(coalesce($c, ''), " +
      s"'\\\\'), x -> trim(x)), x -> x <> ''))"

  /** The LIST form of [[tokSql]] (no unnest), lowercased. */
  private def lowTokListSql(c: String): String =
    s"list_transform(list_filter(list_transform(string_split(" +
      s"coalesce($c, ''), '\\\\'), x -> trim(x)), x -> x <> ''), " +
      s"x -> lower(x))"

  /** One genre bucket of the rp_most_instances oracle: scoped base →
    * track counts + distinct-artist counts per (composer, title) key →
    * top-20 by (distinct_artists, tracks) with key tie-breaks. */
  private def mostInstancesBucketSql(bucket: String, vocab: String): String =
    s"""(SELECT '$bucket' AS bucket, composer_key, title_key, tracks,
       |  distinct_artists FROM (
       |  SELECT composer_key, title_key, COUNT(*) AS tracks FROM base
       |  WHERE list_has_any(gt, [$vocab]) GROUP BY 1, 2) tr
       |JOIN (
       |  SELECT composer_key, title_key,
       |    COUNT(DISTINCT artist) AS distinct_artists FROM (
       |    SELECT composer_key, title_key, unnest(artist_toks) AS artist
       |    FROM base WHERE list_has_any(gt, [$vocab]))
       |  GROUP BY 1, 2) ar USING (composer_key, title_key)
       |ORDER BY distinct_artists DESC, tracks DESC, composer_key,
       |  title_key LIMIT 20)""".stripMargin

  val sql: Map[String, String] = Map(
    "rp_quality_quantiles" ->
      s"""WITH t AS ($RoleTracksSql)
         |SELECT album_root,
         |ROUND(CAST(quantile_cont(rg_album_gain_db, 0.5) AS DOUBLE), 6)
         |  AS rg_album_gain_db,
         |MAX(rg_album_peak) AS rg_album_peak,
         |CAST(COUNT(rg_album_gain_db) AS INT) AS rg_album_gain_n,
         |CAST(COUNT(rg_album_peak) AS INT) AS rg_album_peak_n,
         |ROUND(CAST(quantile_cont(rg_track_gain_db, 0.9) AS DOUBLE)
         |  - CAST(quantile_cont(rg_track_gain_db, 0.1) AS DOUBLE), 6)
         |  AS rg_track_gain_p90_p10_db
         |FROM t GROUP BY album_root ORDER BY album_root""".stripMargin,
    "rp_top_roles" ->
      s"""WITH t AS ($RoleTracksSql),
         |pr AS (SELECT DISTINCT album_root, tok FROM (
         |  SELECT album_root, ${tokSql("producer")} AS tok FROM t)),
         |la AS (SELECT DISTINCT album_root, tok FROM (
         |  SELECT album_root, ${tokSql("label")} AS tok FROM t)),
         |c AS (
         |  SELECT 'producer' AS role, tok, COUNT(*) AS albums
         |  FROM pr GROUP BY tok
         |  UNION ALL
         |  SELECT 'label' AS role, tok, COUNT(*) AS albums
         |  FROM la GROUP BY tok),
         |r AS (SELECT role, ROW_NUMBER() OVER (PARTITION BY role
         |  ORDER BY albums DESC, tok) AS rank, tok, albums FROM c)
         |SELECT role, rank, tok, albums FROM r WHERE rank <= 10
         |ORDER BY role, rank""".stripMargin,
    "rp_role_pairs" ->
      s"""WITH t AS ($RoleTracksSql),
         |pa AS (SELECT DISTINCT album_root, tok AS a_tok FROM (
         |  SELECT album_root, ${tokSql("producer")} AS tok FROM t)),
         |pb AS (SELECT DISTINCT album_root, tok AS b_tok FROM (
         |  SELECT album_root, ${tokSql("engineer")} AS tok FROM t)),
         |c AS (SELECT a_tok, b_tok, COUNT(*) AS albums
         |  FROM pa JOIN pb USING (album_root) GROUP BY a_tok, b_tok),
         |da AS (SELECT a_tok, b_tok, albums, ROW_NUMBER() OVER (
         |  PARTITION BY a_tok ORDER BY albums DESC, b_tok) AS rn FROM c),
         |db AS (SELECT a_tok, b_tok, albums, ROW_NUMBER() OVER (
         |  PARTITION BY b_tok ORDER BY albums DESC, a_tok) AS rn FROM c),
         |u AS (
         |  SELECT 'producer' AS side, a_tok || ' | ' || b_tok AS label,
         |    albums FROM da WHERE rn = 1
         |  UNION ALL
         |  SELECT 'engineer' AS side, b_tok || ' | ' || a_tok AS label,
         |    albums FROM db WHERE rn = 1),
         |r AS (SELECT side, ROW_NUMBER() OVER (PARTITION BY side
         |  ORDER BY albums DESC, label) AS rank, label, albums FROM u)
         |SELECT side, rank, label, albums FROM r WHERE rank <= 20
         |ORDER BY side, rank""".stripMargin,
    "rp_artist_depth" ->
      s"""WITH t AS ($RoleTracksSql),
         |pairs AS (SELECT DISTINCT album_root, tok AS aa FROM (
         |  SELECT album_root, ${tokSql("albumartist")} AS tok FROM t)),
         |alb AS (SELECT aa, COUNT(*) AS albums FROM pairs GROUP BY aa),
         |ay AS (SELECT DISTINCT album_root, album_year FROM t
         |  WHERE album_year IS NOT NULL),
         |yrs AS (SELECT aa, COUNT(DISTINCT album_year) AS dy
         |  FROM pairs JOIN ay USING (album_root) GROUP BY aa),
         |r AS (SELECT ROW_NUMBER() OVER (ORDER BY albums DESC, alb.aa)
         |    AS rank, alb.aa AS aa, albums,
         |    CAST(COALESCE(dy, 1) AS INT) AS distinct_years
         |  FROM alb LEFT JOIN yrs ON alb.aa = yrs.aa)
         |SELECT rank, aa, albums, distinct_years FROM r
         |WHERE rank <= 600 ORDER BY rank""".stripMargin,
    "rp_rg_trend" ->
      s"""WITH t AS ($RoleTracksSql),
         |alb AS (SELECT album_root,
         |  ROUND(CAST(quantile_cont(rg_album_gain_db, 0.5) AS DOUBLE), 6)
         |    AS gain,
         |  MAX(rg_album_peak) AS peak,
         |  MAX(album_year) AS yr
         |  FROM t WHERE album_root IS NOT NULL GROUP BY album_root),
         |p AS (SELECT yr, gain,
         |  ROUND(CAST(20 AS DOUBLE) * log10(peak) + CAST(18 AS DOUBLE)
         |    + gain, 6) AS plr
         |  FROM alb WHERE yr IS NOT NULL AND gain IS NOT NULL AND peak > 0)
         |SELECT yr,
         |ROUND(CAST(quantile_cont(gain, 0.5) AS DOUBLE), 6) AS gain_med,
         |ROUND(CAST(quantile_cont(plr, 0.5) AS DOUBLE), 6) AS dyn_med,
         |COUNT(*) AS albums
         |FROM p GROUP BY yr ORDER BY yr""".stripMargin,
    "rp_dynamics_extremes" ->
      s"""WITH t AS ($RoleTracksSql),
         |alb AS (SELECT album_root,
         |  ROUND(CAST(quantile_cont(rg_album_gain_db, 0.5) AS DOUBLE), 6)
         |    AS gain,
         |  MAX(rg_album_peak) AS peak,
         |  MAX(album_year) AS yr
         |  FROM t WHERE album_root IS NOT NULL GROUP BY album_root),
         |p AS (SELECT album_root,
         |  CAST(ROUND((ROUND(CAST(20 AS DOUBLE) * log10(peak)
         |    + CAST(18 AS DOUBLE) + gain, 6)) * 1e6) AS BIGINT)
         |    AS plr_micros
         |  FROM alb WHERE yr IS NOT NULL AND gain IS NOT NULL AND peak > 0),
         |u AS (
         |  SELECT 'most' AS side, ROW_NUMBER() OVER (
         |    ORDER BY plr_micros DESC, album_root) AS rank,
         |    album_root, plr_micros FROM p
         |  UNION ALL
         |  SELECT 'least' AS side, ROW_NUMBER() OVER (
         |    ORDER BY plr_micros ASC, album_root) AS rank,
         |    album_root, plr_micros FROM p)
         |SELECT side, rank, album_root, plr_micros FROM u
         |WHERE rank <= 10 ORDER BY side, rank""".stripMargin,
    "rp_rg_by_genre" ->
      s"""WITH t AS ($RoleTracksSql),
         |gt AS (SELECT album_root,
         |  list_transform(list_filter(list_transform(
         |    string_split(coalesce(genre, ''), '\\'), x -> trim(x)),
         |    x -> x <> ''), x -> lower(x)) AS toks
         |  FROM t WHERE album_root IS NOT NULL),
         |fl AS (SELECT album_root,
         |  MAX(list_has_any(toks, ['classical','baroque','romantic','opera','symphony','chamber'])) AS c,
         |  MAX(list_has_any(toks, ['jazz','bebop','hard bop','swing','fusion'])) AS j,
         |  MAX(list_has_any(toks, ['rock','pop','indie','alternative','metal','punk','grunge','folk'])) AS r,
         |  MAX(list_has_any(toks, ['electronic','electronica','ambient','techno','house','trance','idm','dnb'])) AS e
         |  FROM gt GROUP BY album_root),
         |bm AS (SELECT album_root,
         |  CASE WHEN c THEN 'Classical' WHEN j THEN 'Jazz'
         |    WHEN r THEN 'Rock/Pop' WHEN e THEN 'Electronic'
         |    ELSE 'Other' END AS bucket FROM fl),
         |alb AS (SELECT album_root,
         |  ROUND(CAST(quantile_cont(rg_album_gain_db, 0.5) AS DOUBLE), 6)
         |    AS gain,
         |  MAX(rg_album_peak) AS peak,
         |  MAX(album_year) AS yr
         |  FROM t WHERE album_root IS NOT NULL GROUP BY album_root),
         |p AS (SELECT album_root, gain,
         |  ROUND(CAST(20 AS DOUBLE) * log10(peak) + CAST(18 AS DOUBLE)
         |    + gain, 6) AS plr
         |  FROM alb WHERE yr IS NOT NULL AND gain IS NOT NULL AND peak > 0)
         |SELECT bucket, albums, gain_med, dyn_med FROM (
         |  SELECT COALESCE(bucket, 'Other') AS bucket, COUNT(*) AS albums,
         |  ROUND(CAST(quantile_cont(gain, 0.5) AS DOUBLE), 6) AS gain_med,
         |  ROUND(CAST(quantile_cont(plr, 0.5) AS DOUBLE), 6) AS dyn_med
         |  FROM p LEFT JOIN bm USING (album_root)
         |  GROUP BY 1) z
         |ORDER BY CASE bucket WHEN 'Classical' THEN 0 WHEN 'Jazz' THEN 1
         |  WHEN 'Rock/Pop' THEN 2 WHEN 'Electronic' THEN 3 ELSE 4 END""".stripMargin,
    "rp_kpis" ->
      """SELECT COUNT(*) AS n_orders,
        |COUNT(DISTINCT o_custkey) AS n_customers,
        |CAST(SUM(tp) AS BIGINT) AS revenue_cents,
        |CAST(SUM(tp) AS DOUBLE)/COUNT(*) AS avg_order_cents,
        |CAST(MIN(yr) AS INT) AS first_yr, CAST(MAX(yr) AS INT) AS last_yr
        |FROM (SELECT o_custkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp,
        |CAST(year(o_orderdate) AS INT) AS yr FROM orders)""".stripMargin,
    "rp_yearly" ->
      """SELECT yr, COUNT(*) AS n, CAST(SUM(tp) AS BIGINT) AS revenue_cents,
        |COUNT(DISTINCT o_custkey) AS n_customers
        |FROM (SELECT o_custkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp,
        |CAST(year(o_orderdate) AS INT) AS yr FROM orders)
        |GROUP BY yr ORDER BY yr""".stripMargin,
    "rp_priority_mix" ->
      """SELECT o_orderpriority, n,
        |CAST(n AS DOUBLE) / SUM(n) OVER () AS share FROM (
        |SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY 1)
        |ORDER BY o_orderpriority""".stripMargin,
    // per-column UNION ALL restating Profile.canon: doubles as integer
    // cents, everything else CAST AS VARCHAR (ISO timestamps under UTC)
    "rp_profile" -> Seq(
        ("o_orderkey", "CAST(MIN(o_orderkey) AS VARCHAR)",
          "CAST(MAX(o_orderkey) AS VARCHAR)"),
        ("o_custkey", "CAST(MIN(o_custkey) AS VARCHAR)",
          "CAST(MAX(o_custkey) AS VARCHAR)"),
        ("o_orderstatus", "MIN(o_orderstatus)", "MAX(o_orderstatus)"),
        ("o_totalprice",
          "CAST(CAST(ROUND(MIN(o_totalprice)*100) AS BIGINT) AS VARCHAR)",
          "CAST(CAST(ROUND(MAX(o_totalprice)*100) AS BIGINT) AS VARCHAR)"),
        ("o_orderdate", "CAST(MIN(o_orderdate) AS VARCHAR)",
          "CAST(MAX(o_orderdate) AS VARCHAR)"),
        ("o_orderpriority", "MIN(o_orderpriority)", "MAX(o_orderpriority)"))
      .map { case (c, mn, mx) =>
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
           |COUNT(*) - COUNT($c) AS n_null,
           |COUNT(DISTINCT $c) AS n_distinct,
           |$mn AS min_s, $mx AS max_s FROM orders""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    "rp_decades" ->
      """SELECT yr - (yr % 10) AS decade, COUNT(*) AS n,
        |CAST(SUM(tp) AS BIGINT) AS revenue_cents,
        |CAST(quantile_cont(tp, 0.5) AS DOUBLE) AS med_cents
        |FROM (SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp FROM orders)
        |GROUP BY 1 ORDER BY decade""".stripMargin,
    "rp_year_mode" ->
      """SELECT o_custkey, mode_yr, n FROM (
        |SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS mode_yr,
        |COUNT(*) AS n,
        |ROW_NUMBER() OVER (PARTITION BY o_custkey
        |  ORDER BY COUNT(*) DESC, CAST(year(o_orderdate) AS INT)) AS rn
        |FROM orders GROUP BY 1, 2)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "rp_acquisition" ->
      """SELECT acq_yr, acq_yr - (acq_yr % 10) AS acq_decade,
        |COUNT(*) AS n_customers FROM (
        |SELECT o_custkey, CAST(year(MIN(o_orderdate)) AS INT) AS acq_yr
        |FROM orders GROUP BY o_custkey)
        |GROUP BY acq_yr ORDER BY acq_yr""".stripMargin,
    "rp_persona" ->
      """WITH t AS (SELECT
        |CASE WHEN c_custkey % 5 = 0 THEN 'Jazz\\Hard Bop'
        |  WHEN c_custkey % 5 = 1 THEN 'Rock\\Indie'
        |  WHEN c_custkey % 5 = 2 THEN 'Classical'
        |  WHEN c_custkey % 5 = 3 THEN 'Techno' END AS genre,
        |CASE WHEN c_custkey % 7 = 0 THEN 'Baroque' ELSE '' END AS style,
        |CASE WHEN c_custkey % 2 = 0 THEN 'C' END AS composer,
        |CASE WHEN c_custkey % 3 = 0 THEN 'K' ELSE '' END AS conductor,
        |CASE WHEN c_custkey % 4 = 0 THEN 'O' END AS orchestra,
        |CASE WHEN c_custkey % 4 = 0 THEN 'R' END AS remixer,
        |CASE WHEN c_custkey % 8 = 0 THEN 'P' ELSE '' END AS producer
        |FROM customer),
        |tok AS (SELECT *,
        |list_transform(list_filter(list_transform(
        |  string_split(coalesce(genre, ''), '\\'), x -> trim(x)),
        |  x -> x <> ''), x -> lower(x)) AS gt,
        |list_transform(list_filter(list_transform(
        |  string_split(coalesce(style, ''), '\\'), x -> trim(x)),
        |  x -> x <> ''), x -> lower(x)) AS st
        |FROM t),
        |a AS (SELECT
        |AVG(CASE WHEN list_has_any(gt, ['classical','baroque','romantic','opera','symphony','chamber']) THEN 1 ELSE 0 END) AS g_cls,
        |AVG(CASE WHEN list_has_any(st, ['classical','baroque','romantic','opera','symphony','chamber']) THEN 1 ELSE 0 END) AS s_cls,
        |AVG(CASE WHEN list_has_any(gt, ['jazz','bebop','hard bop','swing','fusion']) THEN 1 ELSE 0 END) AS g_jazz,
        |AVG(CASE WHEN list_has_any(st, ['jazz','bebop','hard bop','swing','fusion']) THEN 1 ELSE 0 END) AS s_jazz,
        |AVG(CASE WHEN list_has_any(gt, ['electronic','electronica','ambient','techno','house','trance','idm','dnb']) THEN 1 ELSE 0 END) AS g_elec,
        |AVG(CASE WHEN list_has_any(st, ['electronic','electronica','ambient','techno','house','trance','idm','dnb']) THEN 1 ELSE 0 END) AS s_elec,
        |AVG(CASE WHEN list_has_any(gt, ['rock','pop','indie','alternative','metal','punk','grunge','folk']) THEN 1 ELSE 0 END) AS g_rock,
        |AVG(CASE WHEN list_has_any(st, ['rock','pop','indie','alternative','metal','punk','grunge','folk']) THEN 1 ELSE 0 END) AS s_rock,
        |(AVG(CASE WHEN composer IS NOT NULL AND composer <> '' THEN 1 ELSE 0 END)
        | + AVG(CASE WHEN conductor IS NOT NULL AND conductor <> '' THEN 1 ELSE 0 END)
        | + AVG(CASE WHEN orchestra IS NOT NULL AND orchestra <> '' THEN 1 ELSE 0 END)) / 3 AS role_cls,
        |(AVG(CASE WHEN remixer IS NOT NULL AND remixer <> '' THEN 1 ELSE 0 END)
        | + AVG(CASE WHEN producer IS NOT NULL AND producer <> '' THEN 1 ELSE 0 END)) / 2 AS role_elec
        |FROM tok),
        |s AS (SELECT greatest(g_cls, s_cls, role_cls) AS classical,
        |greatest(g_jazz, s_jazz) AS jazz,
        |greatest(g_elec, s_elec, role_elec) AS electronic,
        |greatest(g_rock, s_rock) AS rock_pop FROM a)
        |SELECT classical, jazz, electronic, rock_pop,
        |CASE WHEN greatest(classical, jazz, electronic, rock_pop) < 0.22
        |    THEN 'mixed'
        |  WHEN classical >= jazz AND classical >= electronic
        |    AND classical >= rock_pop THEN 'classical'
        |  WHEN jazz >= electronic AND jazz >= rock_pop THEN 'jazz'
        |  WHEN electronic >= rock_pop THEN 'electronic'
        |  ELSE 'rock_pop' END AS persona
        |FROM s""".stripMargin,
    "rp_quality_matrix" ->
      """WITH t AS (SELECT
        |CASE WHEN p_partkey % 11 = 0 THEN 'FLAC'
        |  WHEN p_partkey % 11 = 1 THEN 'MP3'
        |  WHEN p_partkey % 11 = 2 THEN 'Ogg Vorbis'
        |  WHEN p_partkey % 11 = 3 THEN 'WavPack'
        |  WHEN p_partkey % 11 = 4 THEN 'AIFF'
        |  WHEN p_partkey % 11 = 5 THEN 'Opus'
        |  WHEN p_partkey % 11 = 6 THEN 'M4A'
        |  WHEN p_partkey % 11 = 7 THEN 'WMA'
        |  WHEN p_partkey % 11 = 8 THEN 'DSF'
        |  WHEN p_partkey % 11 = 9 THEN '' END AS filetype,
        |CASE WHEN p_partkey % 13 = 0 THEN '1'
        |  WHEN p_partkey % 3 = 0 THEN '16'
        |  WHEN p_partkey % 3 = 1 THEN '24'
        |  WHEN p_partkey % 17 = 0 THEN '0' END AS bps_raw,
        |CASE WHEN p_partkey % 4 = 0 THEN CAST(44.1 AS DOUBLE)
        |  WHEN p_partkey % 4 = 1 THEN CAST(48.0 AS DOUBLE)
        |  WHEN p_partkey % 4 = 2 THEN CAST(96.0 AS DOUBLE) END AS freq_khz
        |FROM part),
        |c AS (SELECT lower(filetype) AS ft,
        |CASE WHEN CAST(bps_raw AS BIGINT) > 0
        |  THEN CAST(bps_raw AS BIGINT) END AS bps, freq_khz FROM t),
        |q AS (SELECT *,
        |CASE WHEN bps = 1 THEN TRUE
        |  WHEN ft IN ('mp3','ogg vorbis','vorbis','opus','aac') THEN FALSE
        |  WHEN ft IN ('flac','wav','wave','aiff','aif','ape','wavpack',
        |    'wv','w64','tta','dsf','dff','alac') THEN TRUE
        |  WHEN bps > 0 THEN TRUE
        |  WHEN ft IN ('m4a','mp4','wma') AND bps IS NULL THEN FALSE
        |  END AS isll FROM c)
        |SELECT CASE WHEN isll THEN 'lossless' WHEN NOT isll THEN 'lossy'
        |  ELSE 'unknown' END AS quality,
        |COALESCE(bps = 1, FALSE) AS dsd, bps, freq_khz, COUNT(*) AS n
        |FROM q GROUP BY 1, 2, 3, 4
        |ORDER BY quality, dsd, bps NULLS FIRST, freq_khz NULLS FIRST""".stripMargin,
    // track-genre-scoped role counts: the classical filter runs on
    // TRACK rows before the distinct (album, token) pairs
    "rp_classical_roles" ->
      s"""WITH t AS ($RoleTracksSql),
         |ct AS (SELECT * FROM t WHERE list_has_any(
         |  list_transform(list_filter(list_transform(
         |    string_split(coalesce(genre, ''), '\\'), x -> trim(x)),
         |    x -> x <> ''), x -> lower(x)),
         |  ['classical','baroque','romantic','opera','symphony','chamber'])),
         |cp AS (SELECT DISTINCT album_root, tok FROM (
         |  SELECT album_root, ${tokSql("composer")} AS tok FROM ct)),
         |cd AS (SELECT DISTINCT album_root, tok FROM (
         |  SELECT album_root, ${tokSql("conductor")} AS tok FROM ct)),
         |c AS (
         |  SELECT 'composer' AS role, tok, COUNT(*) AS albums
         |  FROM cp GROUP BY tok
         |  UNION ALL
         |  SELECT 'conductor' AS role, tok, COUNT(*) AS albums
         |  FROM cd GROUP BY tok),
         |r AS (SELECT role, ROW_NUMBER() OVER (PARTITION BY role
         |  ORDER BY albums DESC, tok) AS rank, tok, albums FROM c)
         |SELECT role, rank, tok, albums FROM r WHERE rank <= 10
         |ORDER BY role, rank""".stripMargin,
    // album-scoped: roots qualify on ANY jazz-genre track; the artist
    // pairs come from all the album's tracks
    "rp_jazz_artists" ->
      s"""WITH t AS ($RoleTracksSql),
         |roots AS (SELECT DISTINCT album_root FROM t WHERE list_has_any(
         |  list_transform(list_filter(list_transform(
         |    string_split(coalesce(genre, ''), '\\'), x -> trim(x)),
         |    x -> x <> ''), x -> lower(x)),
         |  ['jazz','bebop','hard bop','swing','fusion'])),
         |pairs AS (SELECT DISTINCT album_root, tok FROM (
         |  SELECT album_root, ${tokSql("albumartist")} AS tok FROM t)),
         |c AS (SELECT tok, COUNT(*) AS albums
         |  FROM pairs JOIN roots USING (album_root) GROUP BY tok),
         |r AS (SELECT 'albumartist' AS role, ROW_NUMBER() OVER (
         |  ORDER BY albums DESC, tok) AS rank, tok, albums FROM c)
         |SELECT role, rank, tok, albums FROM r WHERE rank <= 10
         |ORDER BY rank""".stripMargin,
    // classical roots × global artist pairs — rp_jazz_artists with the
    // classical vocabulary
    "rp_classical_artists" ->
      s"""WITH t AS ($RoleTracksSql),
         |roots AS (SELECT DISTINCT album_root FROM t WHERE list_has_any(
         |  ${lowTokListSql("genre")},
         |  ['classical','baroque','romantic','opera','symphony','chamber'])),
         |pairs AS (SELECT DISTINCT album_root, tok FROM (
         |  SELECT album_root, ${tokSql("albumartist")} AS tok FROM t)),
         |c AS (SELECT tok, COUNT(*) AS albums
         |  FROM pairs JOIN roots USING (album_root) GROUP BY tok),
         |r AS (SELECT 'albumartist' AS role, ROW_NUMBER() OVER (
         |  ORDER BY albums DESC, tok) AS rank, tok, albums FROM c)
         |SELECT role, rank, tok, albums FROM r WHERE rank <= 10
         |ORDER BY rank""".stripMargin,
    // jazz + rock/pop composer counts, track-genre-scoped, bucketed
    "rp_genre_composers" ->
      s"""WITH t AS ($RoleTracksSql),
         |jt AS (SELECT * FROM t WHERE list_has_any(
         |  ${lowTokListSql("genre")},
         |  ['jazz','bebop','hard bop','swing','fusion'])),
         |rt AS (SELECT * FROM t WHERE list_has_any(
         |  ${lowTokListSql("genre")},
         |  ['rock','pop','indie','alternative','metal','punk','grunge','folk'])),
         |jp AS (SELECT DISTINCT album_root, tok FROM (
         |  SELECT album_root, ${tokSql("composer")} AS tok FROM jt)),
         |rp AS (SELECT DISTINCT album_root, tok FROM (
         |  SELECT album_root, ${tokSql("composer")} AS tok FROM rt)),
         |c AS (
         |  SELECT 'jazz' AS bucket, tok, COUNT(*) AS albums
         |  FROM jp GROUP BY tok
         |  UNION ALL
         |  SELECT 'rockpop' AS bucket, tok, COUNT(*) AS albums
         |  FROM rp GROUP BY tok),
         |r AS (SELECT bucket, 'composer' AS role, ROW_NUMBER() OVER (
         |  PARTITION BY bucket ORDER BY albums DESC, tok) AS rank,
         |  tok, albums FROM c)
         |SELECT role, rank, tok, albums, bucket FROM r WHERE rank <= 10
         |ORDER BY bucket, rank""".stripMargin,
    // loudest (most negative median gain) / quietest top-10 — the
    // rp_dynamics_extremes pattern on gain micros
    "rp_gain_extremes" ->
      s"""WITH t AS ($RoleTracksSql),
         |alb AS (SELECT album_root,
         |  ROUND(CAST(quantile_cont(rg_album_gain_db, 0.5) AS DOUBLE), 6)
         |    AS gain
         |  FROM t WHERE album_root IS NOT NULL GROUP BY album_root),
         |p AS (SELECT album_root,
         |  CAST(ROUND(gain * 1e6) AS BIGINT) AS gain_micros
         |  FROM alb WHERE gain IS NOT NULL),
         |u AS (
         |  SELECT 'loudest' AS side, ROW_NUMBER() OVER (
         |    ORDER BY gain_micros ASC, album_root) AS rank,
         |    album_root, gain_micros FROM p
         |  UNION ALL
         |  SELECT 'quietest' AS side, ROW_NUMBER() OVER (
         |    ORDER BY gain_micros DESC, album_root) AS rank,
         |    album_root, gain_micros FROM p)
         |SELECT side, rank, album_root, gain_micros FROM u
         |WHERE rank <= 10 ORDER BY side, rank""".stripMargin,
    // per-bucket composition diversity: normalized (composer, title)
    // keys, distinct artist tokens, top-20 per bucket
    "rp_most_instances" ->
      s"""WITH t AS ($RoleTracksSql),
         |base AS (SELECT
         |  lower(trim(regexp_replace(title, '\\s+', ' ', 'g')))
         |    AS title_key,
         |  array_to_string(list_sort(${lowTokListSql("composer")}), ' / ')
         |    AS composer_key,
         |  list_filter(list_transform(string_split(coalesce(artist, ''),
         |    '\\'), x -> trim(x)), x -> x <> '') AS artist_toks,
         |  ${lowTokListSql("genre")} AS gt
         |  FROM t),
         |filtered AS (SELECT * FROM base WHERE title_key IS NOT NULL
         |  AND title_key <> '' AND composer_key <> ''
         |  AND len(artist_toks) > 0)
         |SELECT bucket, composer_key, title_key, tracks, distinct_artists
         |FROM (
         |${mostInstancesBucketSql("classical",
            "'classical','baroque','romantic','opera','symphony','chamber'")
            .replace("FROM base", "FROM filtered")}
         |UNION ALL
         |${mostInstancesBucketSql("jazz",
            "'jazz','bebop','hard bop','swing','fusion'")
            .replace("FROM base", "FROM filtered")}
         |UNION ALL
         |${mostInstancesBucketSql("rockpop",
            "'rock','pop','indie','alternative','metal','punk','grunge','folk'")
            .replace("FROM base", "FROM filtered")}
         |) z ORDER BY bucket, distinct_artists DESC, tracks DESC,
         |  composer_key, title_key""".stripMargin,
    // same classification waterfall as rp_quality_matrix, then the
    // per-class histograms with window-share denominators; null sort
    // keys sink via the reference's fill(9999) coalesce
    "rp_format_breakdown" ->
      """WITH t AS (SELECT
        |CASE WHEN p_partkey % 11 = 0 THEN 'FLAC'
        |  WHEN p_partkey % 11 = 1 THEN 'MP3'
        |  WHEN p_partkey % 11 = 2 THEN 'Ogg Vorbis'
        |  WHEN p_partkey % 11 = 3 THEN 'WavPack'
        |  WHEN p_partkey % 11 = 4 THEN 'AIFF'
        |  WHEN p_partkey % 11 = 5 THEN 'Opus'
        |  WHEN p_partkey % 11 = 6 THEN 'M4A'
        |  WHEN p_partkey % 11 = 7 THEN 'WMA'
        |  WHEN p_partkey % 11 = 8 THEN 'DSF'
        |  WHEN p_partkey % 11 = 9 THEN '' END AS filetype,
        |CASE WHEN p_partkey % 13 = 0 THEN '1'
        |  WHEN p_partkey % 3 = 0 THEN '16'
        |  WHEN p_partkey % 3 = 1 THEN '24'
        |  WHEN p_partkey % 17 = 0 THEN '0' END AS bps_raw,
        |CASE WHEN p_partkey % 4 = 0 THEN CAST(44.1 AS DOUBLE)
        |  WHEN p_partkey % 4 = 1 THEN CAST(48.0 AS DOUBLE)
        |  WHEN p_partkey % 4 = 2 THEN CAST(96.0 AS DOUBLE) END AS freq_khz,
        |CASE WHEN p_partkey % 23 = 0 THEN NULL
        |  WHEN p_partkey % 5 = 0 THEN CAST(6 AS INT)
        |  ELSE CAST(2 AS INT) END AS ch,
        |CASE WHEN p_partkey % 29 = 0 THEN NULL
        |  WHEN p_partkey % 6 = 0 THEN CAST(320 AS INT)
        |  WHEN p_partkey % 6 = 1 THEN CAST(256 AS INT)
        |  WHEN p_partkey % 6 = 2 THEN CAST(192 AS INT)
        |  ELSE CAST(128 AS INT) END AS br
        |FROM part),
        |c AS (SELECT filetype, lower(filetype) AS ft,
        |CASE WHEN CAST(bps_raw AS BIGINT) > 0
        |  THEN CAST(bps_raw AS BIGINT) END AS bps,
        |freq_khz, ch, br FROM t),
        |q AS (SELECT *,
        |CASE WHEN bps = 1 THEN TRUE
        |  WHEN ft IN ('mp3','ogg vorbis','vorbis','opus','aac') THEN FALSE
        |  WHEN ft IN ('flac','wav','wave','aiff','aif','ape','wavpack',
        |    'wv','w64','tta','dsf','dff','alac') THEN TRUE
        |  WHEN bps > 0 THEN TRUE
        |  WHEN ft IN ('m4a','mp4','wma') AND bps IS NULL THEN FALSE
        |  END AS isll FROM c),
        |f AS (SELECT
        |CASE WHEN isll THEN 'Lossless' ELSE 'Lossy' END AS codec_class,
        |CASE WHEN filetype IS NULL OR TRIM(filetype) = '' THEN '(Unknown)'
        |  ELSE TRIM(filetype) END AS filetype,
        |ch,
        |CASE WHEN isll THEN bps END AS bps,
        |CASE WHEN NOT isll THEN br END AS br,
        |freq_khz FROM q WHERE isll IS NOT NULL),
        |g AS (SELECT codec_class, filetype, ch, bps, br, freq_khz,
        |COUNT(*) AS tracks FROM f GROUP BY 1, 2, 3, 4, 5, 6)
        |SELECT codec_class, filetype, ch, bps, br, freq_khz, tracks,
        |ROUND(CAST(tracks AS DOUBLE) * 100
        |  / SUM(tracks) OVER (PARTITION BY codec_class), 6) AS pct
        |FROM g
        |ORDER BY codec_class, filetype, COALESCE(ch, 9999),
        |COALESCE(bps, 9999), COALESCE(br, 9999999),
        |COALESCE(freq_khz, 9999.0)""".stripMargin,
    // the rp_missing_critical CTEs + the two radar rollups: track
    // denominators (albumartist excludes compilation rows), album
    // impact over ALL album roots
    "rp_health_radar" ->
      """WITH t AS (SELECT
        |CASE WHEN (c_custkey % 40) % 8 = 3
        |  THEN '/m/Box' || (c_custkey % 40) || '/CD ' || ((c_custkey % 40) % 2 + 1)
        |  ELSE '/m/Album' || (c_custkey % 40) END AS dirpath,
        |CASE WHEN c_custkey % 17 = 0 THEN NULL
        |  WHEN c_custkey % 19 = 0 THEN ''
        |  WHEN c_custkey % 23 = 0 THEN ' '
        |  ELSE 'T' || c_custkey END AS title,
        |CASE WHEN c_custkey % 13 = 0 THEN NULL
        |  ELSE 'A' || (c_custkey % 40) END AS artist,
        |CASE WHEN (c_custkey % 40) % 5 = 0 AND c_custkey % 3 = 0 THEN ''
        |  ELSE 'AA' || (c_custkey % 40) END AS albumartist,
        |CASE WHEN (c_custkey % 40) % 8 = 4 THEN 1 ELSE 0 END AS compilation
        |FROM customer),
        |g AS (SELECT
        |regexp_replace(dirpath, '/(?:cd|disc)\s*0*\d{1,3}$', '', 'i')
        |  AS album_dirpath,
        |CAST(SUM(CASE WHEN title IS NULL OR TRIM(title) = ''
        |  THEN 1 ELSE 0 END) AS BIGINT) AS title,
        |CAST(SUM(CASE WHEN artist IS NULL OR TRIM(artist) = ''
        |  THEN 1 ELSE 0 END) AS BIGINT) AS artist,
        |CAST(SUM(CASE WHEN albumartist IS NULL OR TRIM(albumartist) = ''
        |  THEN 1 ELSE 0 END) AS BIGINT) AS aa_raw,
        |MAX(compilation) AS comp
        |FROM t GROUP BY 1),
        |z AS (SELECT album_dirpath, title, artist,
        |CASE WHEN comp = 1 THEN 0 ELSE aa_raw END AS albumartist FROM g),
        |d0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS tot,
        |CAST(SUM(CASE WHEN compilation = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |  AS noncomp FROM t),
        |ad AS (SELECT CAST(COUNT(*) AS BIGINT) AS albs FROM z),
        |m AS (SELECT CAST(SUM(title) AS BIGINT) AS mt,
        |CAST(SUM(artist) AS BIGINT) AS ma,
        |CAST(SUM(albumartist) AS BIGINT) AS maa,
        |CAST(SUM(CASE WHEN title > 0 THEN 1 ELSE 0 END) AS BIGINT) AS it,
        |CAST(SUM(CASE WHEN artist > 0 THEN 1 ELSE 0 END) AS BIGINT) AS ia,
        |CAST(SUM(CASE WHEN albumartist > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |  AS iaa FROM z)
        |SELECT field, track_missing, track_denom,
        |ROUND(100.0 * track_missing / track_denom, 6) AS track_pct,
        |albums_impacted, album_denom,
        |ROUND(100.0 * albums_impacted / album_denom, 6) AS album_pct
        |FROM (
        |  SELECT 'albumartist' AS field, maa AS track_missing,
        |    noncomp AS track_denom, iaa AS albums_impacted,
        |    albs AS album_denom FROM m CROSS JOIN d0 CROSS JOIN ad
        |  UNION ALL SELECT 'artist', ma, tot, ia, albs
        |    FROM m CROSS JOIN d0 CROSS JOIN ad
        |  UNION ALL SELECT 'title', mt, tot, it, albs
        |    FROM m CROSS JOIN d0 CROSS JOIN ad)
        |ORDER BY field""".stripMargin,
    "rp_missing_critical" ->
      """WITH t AS (SELECT
        |CASE WHEN (c_custkey % 40) % 8 = 3
        |  THEN '/m/Box' || (c_custkey % 40) || '/CD ' || ((c_custkey % 40) % 2 + 1)
        |  ELSE '/m/Album' || (c_custkey % 40) END AS dirpath,
        |CASE WHEN c_custkey % 17 = 0 THEN NULL
        |  WHEN c_custkey % 19 = 0 THEN ''
        |  WHEN c_custkey % 23 = 0 THEN ' '
        |  ELSE 'T' || c_custkey END AS title,
        |CASE WHEN c_custkey % 13 = 0 THEN NULL
        |  ELSE 'A' || (c_custkey % 40) END AS artist,
        |CASE WHEN (c_custkey % 40) % 5 = 0 AND c_custkey % 3 = 0 THEN ''
        |  ELSE 'AA' || (c_custkey % 40) END AS albumartist,
        |CASE WHEN (c_custkey % 40) % 8 = 4 THEN 1 ELSE 0 END AS compilation
        |FROM customer),
        |g AS (SELECT
        |regexp_replace(dirpath, '/(?:cd|disc)\s*0*\d{1,3}$', '', 'i')
        |  AS album_dirpath,
        |COUNT(*) AS total_tracks,
        |CAST(SUM(CASE WHEN title IS NULL OR TRIM(title) = ''
        |  THEN 1 ELSE 0 END) AS INT) AS title,
        |CAST(SUM(CASE WHEN artist IS NULL OR TRIM(artist) = ''
        |  THEN 1 ELSE 0 END) AS INT) AS artist,
        |CAST(SUM(CASE WHEN albumartist IS NULL OR TRIM(albumartist) = ''
        |  THEN 1 ELSE 0 END) AS INT) AS aa_raw,
        |MAX(compilation) AS comp
        |FROM t GROUP BY 1),
        |z AS (SELECT album_dirpath, total_tracks, title, artist,
        |CASE WHEN comp = 1 THEN 0 ELSE aa_raw END AS albumartist FROM g)
        |SELECT album_dirpath,
        |regexp_replace(regexp_replace(album_dirpath, '/$', ''), '^.*/', '')
        |  AS album_dirname,
        |total_tracks,
        |CASE WHEN title = 0 THEN NULL ELSE title END AS title,
        |CASE WHEN artist = 0 THEN NULL ELSE artist END AS artist,
        |CASE WHEN albumartist = 0 THEN NULL ELSE albumartist END AS albumartist
        |FROM z WHERE title > 0 OR artist > 0 OR albumartist > 0
        |ORDER BY album_dirpath""".stripMargin,
    // identical VA-token matching: lowercased trimmed tokens on the
    // `\\` delimiter against the reference's three spellings
    "rp_va_classification" ->
      s"""WITH t AS (SELECT '/m/A' || (c_custkey % 40) AS album_root,
         |CASE WHEN c_custkey % 40 = 0 THEN 'Various Artists'
         |  WHEN c_custkey % 40 = 1 THEN '  VA '
         |  WHEN c_custkey % 40 = 2 THEN 'various\\\\AA3'
         |  WHEN c_custkey % 23 = 0 THEN NULL
         |  ELSE 'AA' || (c_custkey % 12) END AS albumartist,
         |CASE WHEN (c_custkey % 40) % 10 = 5 THEN 1 ELSE 0 END
         |  AS compilation
         |FROM customer),
         |g AS (SELECT album_root,
         |CAST(MAX(CASE WHEN list_has_any(${lowTokListSql("albumartist")},
         |  ['various artists', 'various', 'va']) THEN 1 ELSE 0 END)
         |  AS INT) AS album_is_va,
         |CAST(MAX(compilation) AS INT) AS album_is_compilation
         |FROM t GROUP BY album_root)
         |SELECT album_root, album_is_va, album_is_compilation,
         |CAST(CASE WHEN album_is_va = 1 OR album_is_compilation = 1
         |  THEN 1 ELSE 0 END AS INT) AS album_is_va_or_comp
         |FROM g ORDER BY album_root""".stripMargin,
    // scalar pass + token-distinct pass, both one-row → cross join
    "rp_library_kpis" ->
      s"""WITH t AS (SELECT '/m/A' || (c_custkey % 40) AS album_root,
         |CASE WHEN c_custkey % 23 = 0 THEN NULL
         |  WHEN c_custkey % 6 = 0
         |    THEN 'AA' || (c_custkey % 12) || '\\\\AA' || ((c_custkey % 12 + 1) % 12)
         |  ELSE 'AA' || (c_custkey % 12) END AS albumartist,
         |CAST(30 + c_custkey % 300 AS DOUBLE) AS duration_s,
         |1000000 + (c_custkey % 7919) * 1000 AS size_bytes,
         |CASE WHEN c_custkey % 11 = 0 THEN NULL
         |  WHEN c_custkey % 11 = 1 THEN 'MP3'
         |  WHEN c_custkey % 11 = 2 THEN 'FLAC'
         |  ELSE 'Ogg Vorbis' END AS filetype
         |FROM customer),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tracks,
         |CAST(COUNT(DISTINCT album_root) AS BIGINT) AS n_albums,
         |SUM(duration_s) AS listening_s,
         |CAST(SUM(size_bytes) AS BIGINT) AS storage_bytes,
         |CAST(COUNT(DISTINCT filetype) AS BIGINT) AS n_filetypes FROM t),
         |a AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT)
         |  AS n_albumartists FROM (
         |  SELECT ${tokSql("albumartist")} AS tok FROM t))
         |SELECT n_tracks, n_albums, n_albumartists, listening_s,
         |storage_bytes, n_filetypes FROM m CROSS JOIN a""".stripMargin,
  )
}
