package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Exprs, MultiValue}
import graft.functions.{Contributors, Subtitles, TextNorm, TitleCase, Uuids}

/** Canonical pipeline steps re-expressed from the reference's numbered
  * scripts, as composable [[Transform]] values over a stringly-typed
  * alib-style table. Each step is convergent (second run changes
  * nothing), which [[Pipeline.run]]'s CDC audit verifies cheaply — the
  * changelog for a re-run is empty.
  */
object Steps {

  private def onCols(name: String, cols: Seq[String])(f: Column => Column) =
    Transform(name, cols,
      df => cols.foldLeft(df)((d, c) => d.withColumn(c, f(col(c)))))

  /** 02: mojibake/CRLF cleanup + whitespace collapse
    * (ref scripts/pipeline/02-...py:66-79). */
  def cleanText(cols: Seq[String]): Transform =
    onCols("02_clean_text", cols)(c =>
      when(c.isNull, c).otherwise(TextNorm.cleanWs(c)))

  /** 03/17-style blank normalization: TRIM + empty→NULL
    * (ref tm_polars null policy). */
  def normBlanks(cols: Seq[String]): Transform =
    onCols("03_norm_blanks", cols)(Exprs.normBlank)

  /** 17: multi-value dedupe — tokenize, order-preserving unique, rejoin
    * (ref scripts/pipeline/17-dedupe-columns.py:78-132). The candidate
    * filter (delimiter containment) is implicit: single-value cells
    * round-trip unchanged. */
  def dedupeMultiValue(cols: Seq[String]): Transform =
    onCols("17_dedupe_mv", cols)(MultiValue.normalize)

  /** 18-style NFKD normalization of name columns
    * (ref scripts/pipeline/18-...py:124-139). */
  def nfkdNames(cols: Seq[String]): Transform =
    onCols("18_nfkd", cols)(c =>
      when(c.isNull, c).otherwise(TextNorm.nfkdUdf(c)))

  /** Title-casing of display columns (ref tm_titlecase engine; the
    * engine converges, tm_titlecase.py:315-321). */
  def titleCase(cols: Seq[String]): Transform =
    onCols("07_titlecase", cols)(c =>
      when(c.isNull, c).otherwise(TitleCase.titleCaseUdf(c)))

  /** 20: date canonicalization to YYYY / YYYY-MM-DD via regex rewrites
    * over multi-value date cells (ref scripts/pipeline/20-...py:95-222):
    * dotted / slashed dates → dashed; bare years pass through;
    * unparseable values left intact (exceptions report separately). */
  def canonDates(cols: Seq[String]): Transform =
    onCols("20_canon_dates", cols) { c =>
      val dashed = regexp_replace(c,
        "^(\\d{4})[./](\\d{2})[./](\\d{2})\\z", "$1-$2-$3")
      when(c.isNull, c).otherwise(dashed)
    }

  /** 01: involvedpeople role fan-out merge (ref
    * `scripts/pipeline/01-...py:136-253, 312-412`): parse the packed
    * `person, RoleA - person, RoleB` string, route people into the
    * target columns their roles map to, and merge into the existing
    * multi-value cells with casefold first-seen dedupe. When nothing
    * merges, the original cell (null/empty included) is preserved. */
  def involvedPeopleMerge(packedCol: String,
      roleTargets: Map[String, Seq[String]] = Map(
        "mainartist" -> Seq("albumartist"),
        "composerlyricist" -> Seq("composer", "lyricist"))): Transform = {
    val targets = roleTargets.values.flatten.toSeq.distinct
    Transform("01_involved_merge", targets, df =>
      targets.foldLeft(df) { (d, t) =>
        val roles = roleTargets.collect {
          case (r, ts) if ts.contains(t) => r
        }.toSeq.sorted
        val incoming = Contributors.peopleUdf(col(packedCol), typedlit(roles))
        val merged = MultiValue.dedupeCasefold(
          concat(MultiValue.tokens(coalesce(col(t), lit(""))), incoming))
        d.withColumn(t, when(size(merged) === 0, col(t))
          .otherwise(MultiValue.joinTokens(merged)))
      })
  }

  /** 06: dictionary-driven contributor normalization (ref
    * `06-...py:438-585`): each cell runs the staged waterfall in
    * [[Contributors.normalizeCell]] against the vetted-name dictionary.
    * The dictionary is driver-bounded (the reference holds it in memory
    * too); wrap in a broadcast for executor-count-independent shipping
    * at scale. */
  def dictContributors(cols: Seq[String],
                       dict: Map[String, String]): Transform = {
    val norm = Contributors.normalizeUdf(dict)
    onCols("06_dict_contributors", cols)(c =>
      when(c.isNull, c).otherwise(norm(c)))
  }

  /** 07: vetted contributor-mapping application (ref
    * `scripts/pipeline/07-...py:145-213`): whole-field replacement
    * first (the replacement may itself be multi-value), then — when the
    * cell carries the delimiter — per-item replacement with exact-case
    * first-seen dedupe. Unmatched values pass through untouched. Pure
    * Column work; the mapping ships as a literal (the reference holds
    * `_REF_vetted_contributors` in memory too). */
  def vettedMappings(cols: Seq[String],
                     mapping: Map[String, String]): Transform = {
    val mapLit = typedlit(mapping.map { case (k, v) => k.toLowerCase -> v })
    onCols("07_vetted_mappings", cols) { c =>
      val stripped = trim(c)
      val whole = coalesce(try_element_at(mapLit, lower(stripped)), stripped)
      val mapped = transform(MultiValue.tokens(whole),
        t => coalesce(try_element_at(mapLit, lower(t)), t))
      val deduped = array_distinct(mapped)
      when(c.isNull || stripped === "", c)
        .when(whole.contains(MultiValue.Delim),
          when(size(deduped) === 0, lit(null).cast("string"))
            .otherwise(MultiValue.joinTokens(deduped)))
        .otherwise(whole)
    }
  }

  /** 10: genre/style normalization against a validation table (ref
    * `10-...py:200-257 intelligent_pre_filter, 260-341, 556-637`):
    * harmonize `[,;|]` delimiters, map every tag exact/casefold against
    * the valid set (hard-coded replacements first; unmatched tags are
    * DROPPED), dedupe first-seen, then merge style into genre while
    * style keeps its own cleaned value.
    *
    * Spark-first shape: posexplode → broadcast join on the lowered tag
    * → regroup by (key, src) ordered by position — one shuffle on the
    * row key, no per-row dictionary shipping. The valid table is the
    * reference's `_REF_genres` (driver-supplied DataFrame). */
  def genreNormalize(keyCol: String, genreCol: String, styleCol: String,
                     valid: DataFrame,
                     hardCoded: Map[String, String] = Map.empty): Transform =
    Transform("10_genre_norm", Seq(genreCol, styleCol), { df =>
      // regexp_replace processes backslashes in the replacement string,
      // so the two-backslash delimiter must be escaped to four
      val canon = (c: Column) =>
        MultiValue.tokens(regexp_replace(c, "\\s*[,;|]\\s*",
          MultiValue.Delim.replace("\\", "\\\\")))
      val vmap = broadcast(valid.select(
        lower(trim(col(valid.columns.head))).as("__vkey"),
        trim(col(valid.columns.head)).as("__vtag")).distinct())
      val hard = typedlit(hardCoded.map { case (k, v) => k.toLowerCase -> v })
      val exploded = Seq(genreCol -> "g", styleCol -> "s").map {
        case (c, src) =>
          df.select(col(keyCol), lit(src).as("__src"),
            posexplode(coalesce(canon(col(c)),
              array().cast("array<string>"))).as(Seq("__pos", "__tag")))
      }.reduce(_ unionByName _)
      val joined = exploded
        .join(vmap, lower(col("__tag")) === col("__vkey"), "left")
        .withColumn("__canon", coalesce(
          element_at(hard, lower(col("__tag"))), col("__vtag")))
        .filter(col("__canon").isNotNull)
        .groupBy(col(keyCol), col("__src"))
        .agg(array_distinct(transform(
          array_sort(collect_list(struct(col("__pos"), col("__canon")))),
          e => e.getField("__canon"))).as("__tags"))
      val byKey = joined.groupBy(keyCol)
        .pivot("__src", Seq("g", "s"))
        .agg(first(col("__tags")))
      df.drop(genreCol, styleCol)
        .join(byKey, Seq(keyCol), "left")
        .withColumn(genreCol, {
          val g = coalesce(col("g"), array().cast("array<string>"))
          val s = coalesce(col("s"), array().cast("array<string>"))
          val m = array_distinct(concat(g, s))
          when(size(m) === 0, lit(null)).otherwise(MultiValue.joinTokens(m))
        })
        .withColumn(styleCol,
          when(coalesce(size(col("s")), lit(0)) === 0, lit(null))
            .otherwise(MultiValue.joinTokens(col("s"))))
        .drop("g", "s")
    })

  /** 11: genre enrichment from an artist-keyed reference (ref
    * `11-...py:367-425, 280-312`): rows whose genre is missing or one
    * of the generic placeholders pull the reference tags for their
    * match key and append them (exact first-seen dedupe); a row only
    * enriches when the reference has genre data. The reference table is
    * artist-sized → broadcast. */
  def genreEnrich(matchCol: String, ref: DataFrame,
                  genreCol: String = "genre", styleCol: String = "style",
                  generic: Set[String] = Set("Pop", "Pop/Rock", "Jazz",
                    "Classical")): Transform =
    Transform("11_genre_enrich", Seq(genreCol, styleCol), { df =>
      val r = broadcast(ref.select(col(ref.columns.head).as(matchCol),
        col("ref_genre").as("__ref_g"), col("ref_styles").as("__ref_s")))
      def merge(cur: Column, inc: Column) = {
        val m = array_distinct(MultiValue.tokens(
          concat_ws(MultiValue.Delim, coalesce(cur, lit("")), inc)))
        when(size(m) === 0, lit(null)).otherwise(MultiValue.joinTokens(m))
      }
      // the eligibility test must see the PRE-enrichment genre — stash
      // it, or the style branch would re-test the already-merged value
      df.join(r, Seq(matchCol), "left")
        .withColumn("__needs",
          (col(genreCol).isNull || trim(col(genreCol)) === "" ||
            col(genreCol).isInCollection(generic)) && col("__ref_g").isNotNull)
        .withColumn(genreCol,
          when(col("__needs"),
            merge(col(genreCol), col("__ref_g"))).otherwise(col(genreCol)))
        .withColumn(styleCol,
          when(col("__needs") && col("__ref_s").isNotNull,
            merge(col(styleCol), col("__ref_s"))).otherwise(col(styleCol)))
        .drop("__ref_g", "__ref_s", "__needs")
    })

  /** 16: track-uuid assignment (ref `16-...py:40-84`): rows whose uuid
    * is NULL, blank, or not version 7 (the reference's
    * `substr(track_uuid, 15, 1) != '7'` probe) get a fresh uuid7;
    * valid ids pass through, so the step converges. */
  def uuidAssign(uuidCol: String): Transform =
    Transform("16_uuid_assign", Seq(uuidCol), df =>
      df.withColumn(uuidCol,
        when(col(uuidCol).isNull || trim(col(uuidCol)) === "" ||
          substring(col(uuidCol), 15, 1) =!= "7", Uuids.uuid7Udf())
          .otherwise(col(uuidCol))))

  /** 03a: artist canonical-case correction + feature-prefix split (ref
    * `scripts/pipeline/03-...py:105-162`): a lowered-artist hit in the
    * disambiguated-contributor table replaces the cell with the
    * canonical casing and short-circuits; otherwise the first
    * `feat./featuring/with/w/` marker splits the cell into
    * `main\\featured`. The canonical table is contributor-scale →
    * broadcast; the probe side never shuffles. */
  def artistFeatureSplit(artistCol: String, canonical: DataFrame): Transform =
    Transform("03_artist_features", Seq(artistCol), { df =>
      val cmap = broadcast(canonical.select(
        lower(trim(col(canonical.columns.head))).as("__ck"),
        trim(col(canonical.columns.head)).as("__cv")).distinct())
      val pieces = split(col(artistCol),
        "(?i)\\s+(?:feat\\.?|featuring|with|w/)\\s+", 2)
      val main = trim(get(pieces, lit(0)))
      val featured = trim(get(pieces, lit(1)))
      df.join(cmap, lower(col(artistCol)) === col("__ck"), "left")
        .withColumn(artistCol,
          when(col(artistCol).isNull, col(artistCol))
            .when(col("__cv").isNotNull, col("__cv"))
            .when(featured.isNotNull && main =!= "" && featured =!= "",
              concat_ws(MultiValue.Delim, main, featured))
            .otherwise(col(artistCol)))
        .drop("__ck", "__cv")
    })

  /** 03b: bracketed-suffix extraction from title (ref
    * `scripts/pipeline/03-...py:165-271`). The trailing `(...)`/`[...]`
    * content classifies by its (variant-normalized) first word:
    * feature prefixes move the remainder into artist, a leading `live`
    * moves the bracket into subtitle (guarded when subtitle already
    * says "live at") and sets the live flag, and subtitle
    * prefixes/trailing markers append to subtitle — all with the
    * reference's delimiter-aware case-insensitive duplicate check.
    * Unmatched suffixes are left untouched. Pure Column work. */
  def titleSuffixExtract(titleCol: String = "title",
                         subtitleCol: String = "subtitle",
                         artistCol: String = "artist",
                         liveCol: String = "live"): Transform =
    Transform("03_title_suffix",
      Seq(titleCol, subtitleCol, artistCol, liveCol), { df =>
        val bracketRe = "(?i)\\s*[\\(\\[\\{<]([^\\)\\]\\}>]+)[\\)\\]\\}>]\\s*\\z"
        val content = trim(regexp_extract(col(titleCol), bracketRe, 1))
        val words = filter(split(content, "\\s+"), w => w =!= "")
        // single-word variant normalization (ref WORD_NORMALIZATION);
        // note "alt" maps to "alt. take" which is NOT a subtitle prefix
        // — faithful to the reference's classification
        val wordNorm = typedlit(Map(
          "remaster" -> "remastered", "rmx" -> "remix",
          "alt" -> "alt. take", "alternate" -> "alt. take",
          "alt." -> "alt. take", "early" -> "early mix"))
        val firstRaw = lower(get(words, lit(0)))
        val first = coalesce(try_element_at(wordNorm, firstRaw), firstRaw)
        val isFeature = first.isin("with", "w/", "feat", "feat.", "featuring")
        val isLive = first === "live"
        val isSubPrefix = first.isin("remix", "rmx", "remaster", "remastered",
          "demo", "outtake", "alt", "alternate", "alt.", "mix", "early mix",
          "instrumental", "bonus", "radio", "reprise", "unplugged",
          "acoustic", "electric", "akoesties", "orchestral", "piano", "dj")
        val lastClean = regexp_replace(
          lower(get(words, size(words) - 1)),
          "^[^a-z0-9]+|[^a-z0-9]+\\z", "")
        val trailing = lastClean.isin("mix", "session", "demos",
          "remaster", "remastered", "remix", "version")
        val rest = when(isFeature,
          trim(array_join(slice(words, 2, 10000), " "))).otherwise(content)
        val restClean = trim(regexp_replace(rest,
          "^[\\[\\]\\(\\)\\{\\}<>]+|[\\[\\]\\(\\)\\{\\}<>]+\\z", ""))
        val restWrapped = concat(lit("["), restClean, lit("]"))
        val stripped = trim(regexp_replace(col(titleCol), bracketRe, ""))

        val hasBracket = content =!= "" && restClean =!= ""
        val featApply = hasBracket && isFeature
        val liveApply = hasBracket && !isFeature && isLive
        val subApply = hasBracket && !isFeature && !isLive &&
          (isSubPrefix || trailing)

        // delimiter-aware duplicate-checked subtitle append (ref
        // _append_to_subtitle): tokens split on both '\\' and ';'
        def appendSub(guardLiveAt: Boolean): Column = {
          val subNN = coalesce(col(subtitleCol), lit(""))
          val toks = MultiValue.tokens(regexp_replace(subNN, "\\s*;\\s*",
            MultiValue.Delim.replace("\\", "\\\\")))
          val dup = exists(toks, t => lower(t) === lower(restWrapped))
          val guard =
            if (guardLiveAt) lower(subNN).contains("live at") else lit(false)
          when(dup || guard, col(subtitleCol))
            .otherwise(array_join(concat(toks, array(restWrapped)), "; "))
        }

        val anyApply = featApply || liveApply || subApply
        val artNN = coalesce(col(artistCol), lit(""))
        df.withColumn("__nt",
            when(anyApply, stripped).otherwise(col(titleCol)))
          .withColumn("__na", when(featApply,
              when(artNN.contains(restClean), col(artistCol))
                .when(artNN === "", restClean)
                .otherwise(concat(artNN, lit(MultiValue.Delim), restClean)))
            .otherwise(col(artistCol)))
          .withColumn("__ns",
            when(liveApply, appendSub(guardLiveAt = true))
              .when(subApply, appendSub(guardLiveAt = false))
              .otherwise(col(subtitleCol)))
          .withColumn("__nl",
            when(liveApply, lit("1")).otherwise(col(liveCol)))
          .withColumn(titleCol, col("__nt"))
          .withColumn(artistCol, col("__na"))
          .withColumn(subtitleCol, col("__ns"))
          .withColumn(liveCol, col("__nl"))
          .drop("__nt", "__na", "__ns", "__nl")
      })

  /** 04: merge arranger/lyricist/writer into composer with ordered
    * casefold first-seen dedupe; only composer changes (ref
    * `scripts/pipeline/04-...py:31-90`). */
  def songwriterMerge(composerCol: String = "composer",
                      sources: Seq[String] =
                        Seq("arranger", "lyricist", "writer")): Transform =
    Transform("04_songwriter_merge", Seq(composerCol), { df =>
      val allTokens = (composerCol +: sources)
        .map(c => MultiValue.tokens(coalesce(col(c), lit(""))))
      val merged = MultiValue.dedupeCasefold(concat(allTokens: _*))
      df.withColumn(composerCol,
        when(size(merged) === 0, lit(null).cast("string"))
          .otherwise(MultiValue.joinTokens(merged)))
    })

  /** 08: per-cell subtitle normalization (ref
    * `scripts/pipeline/08-...py:61-110`, engine in
    * [[graft.functions.Subtitles]]); the reference fetch only touches
    * non-blank cells. */
  def normalizeSubtitles(subtitleCol: String = "subtitle"): Transform =
    onCols("08_subtitle_norm", Seq(subtitleCol))(c =>
      when(c.isNull || trim(c) === "", c)
        .otherwise(Subtitles.normalizeSubtitleUdf(c)))

  /** 09: live-marker normalization (ref
    * `scripts/pipeline/09-...py:71-134`): a trailing `(live)`-style
    * bracket or `- live` strips from title/album; rows where one
    * stripped get their subtitle's legacy delimiters migrated to
    * `"; "`, `[Live]` appended unless the subtitle already says live,
    * and the live flag set.
    *
    * Deviation, documented: the reference computes the subtitle/live
    * updates over EVERY row (`apply_live_normalization` has no gating
    * mask, 09-...py:71-113), which as written would flag the whole
    * library live; its stated purpose is "moving them from title into
    * subtitle". This step applies the subtitle/live writes only to rows
    * where a marker was actually found. */
  def liveMarkers(titleCol: String = "title",
                  subtitleCol: String = "subtitle",
                  albumCol: String = "album",
                  liveCol: String = "live"): Transform =
    Transform("09_live_markers",
      Seq(titleCol, subtitleCol, albumCol, liveCol), { df =>
        val liveRe = "(?i)(?:[\\(\\[\\{<]\\s*live\\s*[\\)\\]\\}>]|- live)\\s*\\z"
        val nt = trim(regexp_replace(col(titleCol), liveRe, ""))
        val na = trim(regexp_replace(col(albumCol), liveRe, ""))
        val gated = (col(titleCol).isNotNull && nt =!= col(titleCol)) ||
          (col(albumCol).isNotNull && na =!= col(albumCol))
        val subNorm = trim(regexp_replace(
          regexp_replace(coalesce(col(subtitleCol), lit("")),
            MultiValue.DelimRe, "; "),
          "\\s*;\\s*", "; "))
        // blank behaves like NULL (Exprs.normBlank policy) — otherwise
        // an empty cell would emit the malformed "; [Live]"
        val newSub =
          when(col(subtitleCol).isNotNull && trim(col(subtitleCol)) =!= "" &&
              subNorm.rlike("(?i)\\blive\\b"), subNorm)
            .when(col(subtitleCol).isNotNull && trim(col(subtitleCol)) =!= "",
              concat(subNorm, lit("; "), lit("[Live]")))
            .otherwise(lit("[Live]"))
        df.withColumn("__nt",
            when(col(titleCol).isNotNull, nt).otherwise(col(titleCol)))
          .withColumn("__na",
            when(col(albumCol).isNotNull, na).otherwise(col(albumCol)))
          .withColumn("__ns",
            when(gated, newSub).otherwise(col(subtitleCol)))
          .withColumn("__nl",
            when(gated, lit("1")).otherwise(col(liveCol)))
          .withColumn(titleCol, col("__nt"))
          .withColumn(albumCol, col("__na"))
          .withColumn(subtitleCol, col("__ns"))
          .withColumn(liveCol, col("__nl"))
          .drop("__nt", "__na", "__ns", "__nl")
      })

  /** 05: composer inference by library majority vote (ref
    * `scripts/pipeline/05-...py:27-57, 97-213`). Titles normalize
    * (lowercase, live-annotation strip, punctuation strip), artist and
    * albumartist cells explode to sorted unique lowercase parts, and
    * each (normalized title, single artist) group votes for its most
    * common composer; tracks with an EMPTY composer then adopt their
    * group's winner. Two shuffles (vote count, per-row regroup) plus
    * one join on the vote key.
    *
    * Tie-breaks are deterministic here (count desc, then composer key
    * asc) where the reference keeps frame order — frame order has no
    * distributed equivalent. */
  def inferComposers(keyCol: String, titleCol: String = "title",
                     composerCol: String = "composer",
                     artistCol: String = "artist",
                     albumArtistCol: String = "albumartist"): Transform =
    Transform("05_infer_composers", Seq(composerCol), { df =>
      def normTitle(c: Column) = trim(regexp_replace(regexp_replace(
        lower(coalesce(c, lit(""))), "\\(live.*|\\[live.*", ""),
        "[^\\w\\s]", ""))
      def normList(c: Column) = array_sort(array_distinct(filter(
        transform(split(lower(coalesce(c, lit(""))),
          "[;,/&]|\\\\\\\\| and "), t => trim(t)), t => t =!= "")))
      val withNorm = df.withColumn("__nt", normTitle(col(titleCol)))
        .withColumn("__cp", normList(col(composerCol)))
      val exploded = Seq(artistCol, albumArtistCol).map(c =>
        withNorm.select(col(keyCol).as("__k"), col("__nt"),
          explode_outer(normList(col(c))).as("__sa"), col("__cp"),
          col(composerCol).as("__oc")))
        .reduce(_ unionByName _)
      val votes = exploded
        .filter(size(col("__cp")) > 0 && col("__sa").isNotNull)
        .withColumn("__key", array_join(col("__cp"), "|"))
        .groupBy("__nt", "__sa", "__key", "__oc")
        .agg(count(lit(1)).as("__n"))
      val w = Window.partitionBy("__nt", "__sa")
        .orderBy(col("__n").desc, col("__key").asc, col("__oc").asc)
      val top = votes.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("__nt"), col("__sa"), col("__oc").as("__inferred"))
      val keys = exploded.select(col("__k"), col("__nt"), col("__sa"))
        .filter(col("__sa").isNotNull).distinct()
      // one inferred value per row: the reference takes the first
      // non-null match in frame order; min() is the deterministic twin
      val matches = keys.join(top, Seq("__nt", "__sa"), "left")
        .groupBy("__k").agg(min(col("__inferred")).as("__inferred"))
      df.join(matches, col(keyCol) === col("__k"), "left")
        .withColumn(composerCol,
          when((col(composerCol).isNull || col(composerCol) === "") &&
            col("__inferred").isNotNull, col("__inferred"))
            .otherwise(col(composerCol)))
        .drop("__k", "__inferred")
    })

  /** 19: album-DR population (ref `scripts/pipeline/19-...py:61-100,
    * 139-204`): the validated dirpath → score mapping (parsed by
    * [[graft.sources.DelimitedSources.readDrScores]]) overwrites
    * `album_dr` for matching directories; everything else passes
    * through. The mapping is file-scale → broadcast, no shuffle. */
  def albumDrPopulate(drScores: DataFrame, dirCol: String = "__dirpath",
                      drCol: String = "album_dr"): Transform =
    Transform("19_album_dr", Seq(drCol), { df =>
      val m = broadcast(drScores.select(
        col(drScores.columns.head).as("__ddir"),
        col(drScores.columns(1)).cast("string").as("__dscore")).distinct())
      df.join(m, col(dirCol) === col("__ddir"), "left")
        .withColumn(drCol,
          when(col("__dscore").isNotNull, col("__dscore"))
            .otherwise(col(drCol)))
        .drop("__ddir", "__dscore")
    })

  /** 12: compilation detection (ref `scripts/pipeline/12-...py:64-200`).
    * Artist-based rules take priority — per-directory distinct-artist
    * counts decide: empty albumartist + many artists ⇒ compilation;
    * empty + one artist ⇒ not, and albumartist backfills from the
    * artist; a "various artists" albumartist + many artists ⇒
    * compilation. Rows no artist rule touched fall back to the
    * directory-name patterns (`VA - `, `OST - `, …), which overwrite
    * the flag either way.
    *
    * One shuffle: the per-directory count aggregates then joins back on
    * the directory key (album-sized groups — no skew). Converges except
    * the reference's own flip case: a VA-patterned directory with a
    * lone artist alternates between rule 2 and the path rule, exactly
    * as re-running the reference script does. */
  def detectCompilations(dirCol: String = "__dirpath",
                         compCol: String = "compilation",
                         artistCol: String = "artist",
                         albumArtistCol: String = "albumartist"): Transform =
    Transform("12_detect_compilations", Seq(compCol, albumArtistCol), { df =>
      val artNN = coalesce(col(artistCol), lit(""))
      val counts = df.groupBy(dirCol).agg(
        countDistinct(artNN).as("__nart"),
        min(artNN).as("__first"))
      def empty(c: Column) = c.isNull || trim(c) === ""
      def various(c: Column) =
        lower(trim(c)).isin("various artists", "various")
      val rule1 = empty(col(albumArtistCol)) && col("__nart") > 1
      val rule2 = empty(col(albumArtistCol)) && col("__nart") === 1
      val rule3 = various(col(albumArtistCol)) && col("__nart") > 1
      val applied = rule1 || rule2 || rule3
      val lastSeg = element_at(split(col(dirCol), "/"), -1)
      // the reference tests its '/VA/' and '/OST/' patterns against the
      // LAST SEGMENT, where they can never match (a segment carries no
      // slash) — dead branches in the reference; the intent is a VA/OST
      // path component, so those two test the full dirpath here
      val pathPat = lastSeg.startsWith("VA - ") ||
        col(dirCol).contains("/VA/") ||
        lastSeg.startsWith("Various Artists - ") ||
        col(dirCol).contains("/OST/") || lastSeg.startsWith("OST - ")
      df.join(counts, Seq(dirCol), "left")
        .withColumn("__nc",
          when(rule1 || rule3, lit("1"))
            .when(rule2, lit("0"))
            .when(!applied && pathPat, lit("1"))
            .when(!applied && !pathPat, lit("0"))
            .otherwise(col(compCol)))
        .withColumn(albumArtistCol,
          when(rule2, col("__first")).otherwise(col(albumArtistCol)))
        .withColumn(compCol, col("__nc"))
        .drop("__nart", "__first", "__nc")
    })

  /** 13: disc-number cleanup (ref `scripts/pipeline/13-...py:76-180`):
    * a directory qualifies when it has at least one non-blank disc
    * number, its name does not look like a `cd N`/`disc N` leaf, and
    * every non-blank disc number in it is identical — then the (now
    * redundant) disc number clears to NULL for the whole directory.
    * Same single-shuffle shape as [[detectCompilations]]. */
  def cleanupDiscnumber(dirCol: String = "__dirpath",
                        discCol: String = "discnumber"): Transform =
    Transform("13_discnumber", Seq(discCol), { df =>
      val norm = Exprs.normBlank(col(discCol))
      val stats = df.groupBy(dirCol).agg(
        countDistinct(norm).as("__u"), count(norm).as("__nn"))
      val lastSeg = lower(element_at(split(col(dirCol), "/"), -1))
      val discDir = lastSeg.rlike("\\b(?:cd|disc)\\s*\\d+\\b")
      df.join(stats, Seq(dirCol), "left")
        .withColumn(discCol,
          when(col("__nn") > 0 && col("__u") === 1 && !discDir,
            lit(null).cast("string")).otherwise(col(discCol)))
        .drop("__u", "__nn")
    })

  /** The release-type canonicalization table (ref
    * `scripts/pipeline/14-...py:46-109`); keys are lowercase, values
    * the canonical display forms, multi-value keys matched whole. */
  private val ReleaseTypeMapping: Map[String, String] = Map(
    "album\\\\audiobook" -> "Studio Album\\\\Audiobook",
    "album\\\\audio drama" -> "Studio Album",
    "album\\\\bootleg" -> "Demos, Soundboards & Bootlegs",
    "album\\\\bootleg\\\\live" -> "Demos, Soundboards & Bootlegs\\\\Live Album",
    "album\\\\compilation\\\\dj-mix" -> "Remix",
    "album\\\\compilation" -> "Greatest Hits & Anthologies",
    "album\\\\compilation\\\\live" -> "Greatest Hits & Anthologies\\\\Live Album",
    "album\\\\compilation\\\\soundtrack" -> "Soundtrack",
    "album\\\\demo" -> "Demos, Soundboards & Bootlegs",
    "album\\\\dj-mix" -> "Remix\\\\DJ-Mix",
    "album\\\\interview" -> "Studio Album\\\\Interview",
    "album\\\\live" -> "Live Album",
    "album\\\\mixtape/street" -> "Mixtape/Street",
    "album\\\\remix" -> "Remix",
    "album\\\\live\\\\soundtrack" -> "Soundtrack\\\\Live Album",
    "album\\\\soundtrack" -> "Soundtrack\\\\Studio Album",
    "album" -> "Studio Album",
    "anthology" -> "Greatest Hits & Anthologies",
    "audio drama\\\\broadcast" -> "Live Album\\\\Broadcast",
    "bootleg\\\\soundboard" -> "Demos, Soundboards & Bootlegs",
    "box set" -> "Box Set",
    "box set\\\\live album" -> "Box Set\\\\Live Album",
    "broadcast\\\\live" -> "Live Album\\\\Broadcast",
    "compilation\\\\album" -> "Greatest Hits & Anthologies",
    "compilation\\\\demo\\\\ep" -> "Demos, Soundboards & Bootlegs\\\\Extended Play",
    "compilation\\\\ep" -> "Greatest Hits & Anthologies\\\\Extended Play",
    "compilation\\\\live" -> "Greatest Hits & Anthologies\\\\Live Album",
    "compilation\\\\live album" -> "Greatest Hits & Anthologies\\\\Live Album",
    "compilation" -> "Greatest Hits & Anthologies",
    "compilation\\\\single" -> "Single\\\\Compilation",
    "composite reissue" -> "Studio Album",
    "demo" -> "Demos, Soundboards & Bootlegs",
    "demo\\\\ep" -> "Demos, Soundboards & Bootlegs\\\\Extended Play",
    "ep" -> "Extended Play",
    "ep\\\\live" -> "Extended Play\\\\Live Album",
    "ep\\\\mixtape/street" -> "Mixtape/Street\\\\Extended Play",
    "ep\\\\remix" -> "Remix\\\\Extended Play",
    "ep\\\\soundtrack" -> "Soundtrack\\\\Extended Play",
    "extended play" -> "Extended Play",
    "extended play\\\\remix" -> "Remix\\\\Extended Play",
    "interview\\\\single" -> "Single\\\\Interview",
    "live album" -> "Live Album",
    "live\\\\album" -> "Live Album",
    "live\\\\ep" -> "Extended Play\\\\Live Album",
    "live" -> "Live Album",
    "live\\\\single" -> "Single\\\\Live Album",
    "mixtape/street" -> "Mixtape/Street",
    "other" -> "Studio Album",
    "remix" -> "Remix",
    "remix\\\\single" -> "Remix\\\\Single",
    "single\\\\live" -> "Single\\\\Live Album",
    "single" -> "Single",
    "single\\\\soundtrack" -> "Single\\\\Soundtrack",
    "soundtrack\\\\album" -> "Soundtrack\\\\Studio Album",
    "soundtrack" -> "Soundtrack",
    "studio album\\\\compilation" -> "Greatest Hits & Anthologies",
    "studio album\\\\compilation\\\\remix" -> "Remix",
    "studio album\\\\demo" -> "Demos, Soundboards & Bootlegs",
    "studio album\\\\remix" -> "Remix",
    "studio album" -> "Studio Album",
    "various artists" -> "Various Artists Compilation")

  /** 14: release-type normalization (ref
    * `scripts/pipeline/14-...py:159-482`). Three phases:
    * canonical-mapping lookup on the whole lowered cell (multi- and
    * single-value keys are disjoint, so one map models the reference's
    * two stages; unmatched cells keep their trimmed value), per-directory
    * track-count assignment for still-null cells (≤3 ⇒ Single, 4-6 ⇒
    * Extended Play — classical/jazz excluded — then `/OST` paths ⇒
    * Soundtrack, remainder ⇒ Studio Album), and the
    * isgreatesthits/issoundtrack flag appends (skipped when the column
    * is absent, like the reference). */
  def normalizeReleasetype(dirCol: String = "__dirpath",
                           rtCol: String = "releasetype",
                           genreCol: String = "genre",
                           ghCol: String = "isgreatesthits",
                           stCol: String = "issoundtrack"): Transform =
    Transform("14_releasetype", Seq(rtCol), { df =>
      val mapLit = typedlit(ReleaseTypeMapping)
      val stripped = trim(col(rtCol))
      val d1 = df.withColumn(rtCol,
        when(col(rtCol).isNull, col(rtCol))
          .otherwise(coalesce(try_element_at(mapLit, lower(stripped)),
            stripped)))
      val cj = coalesce(lower(col(genreCol)).contains("classical") ||
        lower(col(genreCol)).contains("jazz"), lit(false))
      val eligible = col(rtCol).isNull && !cj
      val cnt = d1.filter(eligible).groupBy(dirCol)
        .agg(count(lit(1)).as("__tc"))
      val d2 = d1.join(cnt, Seq(dirCol), "left")
        .withColumn(rtCol,
          when(eligible && col("__tc") <= 3, lit("Single"))
            .when(eligible && col("__tc") <= 6, lit("Extended Play"))
            .when(col(rtCol).isNull && col(dirCol).contains("/OST"),
              lit("Soundtrack"))
            .when(col(rtCol).isNull, lit("Studio Album"))
            .otherwise(col(rtCol)))
        .drop("__tc")
      def ensure(c: Column, flag: Column, target: String): Column = {
        val isSet = flag.isNotNull &&
          lower(trim(flag.cast("string"))).isin("true", "1")
        val hasIt = exists(split(coalesce(c, lit("")), MultiValue.DelimRe),
          t => t === target)
        when(!isSet, c)
          .when(c.isNull || c === "", lit(target))
          .when(hasIt, c)
          .otherwise(concat(c, lit(MultiValue.Delim), lit(target)))
      }
      val d3 = if (d2.columns.contains(ghCol))
        d2.withColumn(rtCol,
          ensure(col(rtCol), col(ghCol), "Greatest Hits & Anthologies"))
      else d2
      if (d3.columns.contains(stCol))
        d3.withColumn(rtCol, ensure(col(rtCol), col(stCol), "Soundtrack"))
      else d3
    })

  /** The default cleanup pipeline in reference numbering order. */
  def defaultPipeline(textCols: Seq[String], mvCols: Seq[String],
                      dateCols: Seq[String]): Seq[Transform] = Seq(
    cleanText(textCols),
    normBlanks(textCols ++ mvCols ++ dateCols),
    dedupeMultiValue(mvCols),
    canonDates(dateCols))
}
