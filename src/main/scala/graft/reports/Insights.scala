package graft.reports

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Exprs, Tables => T}

/** The analytics-dashboard shape (SURVEY §3.3, ref
  * `scripts/reports/92-library-insights.py`): ONE cached base read
  * feeding many aggregation branches, each emitted as a result table
  * (rendering is out of engine scope). The cache means the scan + derive
  * cost is paid once however many KPI branches hang off it.
  */
object Insights {

  /** Base fact frame: orders enriched with derived columns, cached. */
  def base(spark: SparkSession, dir: String): DataFrame =
    T.orders(spark, dir)
      .withColumn("tp_cents", Exprs.cents(col("o_totalprice")))
      .withColumn("yr", year(col("o_orderdate").cast("date")))
      .cache()

  /** Headline KPIs — scalar aggregates in one pass. */
  def kpis(b: DataFrame): DataFrame =
    b.agg(
      count(lit(1)).as("n_orders"),
      countDistinct(col("o_custkey")).as("n_customers"),
      sum(col("tp_cents")).as("revenue_cents"),
      (sum(col("tp_cents")).cast("double") / count(lit(1)))
        .as("avg_order_cents"),
      min(col("yr")).as("first_yr"), max(col("yr")).as("last_yr"))

  /** Yearly trend branch. */
  def yearlyTrends(b: DataFrame): DataFrame =
    b.groupBy("yr")
      .agg(count(lit(1)).as("n"), sum(col("tp_cents")).as("revenue_cents"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy("yr")

  /** Priority-mix branch (share-of-total via a window denominator). */
  def priorityMix(b: DataFrame): DataFrame = {
    val counts = b.groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    counts
      .withColumn("share",
        col("n").cast("double") /
          sum(col("n")).over(org.apache.spark.sql.expressions.Window
            .partitionBy()))
      .orderBy("o_orderpriority")
  }

  /** Decade-trend branch (ref 92-...py:1682-1792): per decade, volume,
    * revenue, and the exact median order value (integer-cents input ⇒
    * the interpolated median is exact in double). */
  def decadeTrends(b: DataFrame): DataFrame =
    b.groupBy((col("yr") - pmod(col("yr"), lit(10))).as("decade"))
      .agg(count(lit(1)).as("n"),
        sum(col("tp_cents")).as("revenue_cents"),
        expr("percentile(tp_cents, 0.5)").as("med_cents"))
      .orderBy("decade")

  /** Modal order year per customer (the album-year-mode shape, ref
    * 92-...py:176-199) — count per (group, value), rank by count with
    * a deterministic value tie-break, keep rank 1. */
  def yearMode(b: DataFrame): DataFrame = {
    val counts = b.groupBy("o_custkey", "yr").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("n").desc, col("yr"))
    counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_custkey"), col("yr").as("mode_yr"), col("n"))
      .orderBy("o_custkey")
  }

  /** Acquisition-timeline branch (ref 92-...py:825-850): first-order
    * date per customer → cohort year/decade, then new-customer counts
    * per cohort year. Two keyed shuffles (customer, then year), both
    * on aggregated rows. */
  def acquisitionTimeline(b: DataFrame): DataFrame =
    b.groupBy("o_custkey")
      .agg(min(col("o_orderdate").cast("date")).as("first_dt"))
      .select(year(col("first_dt")).as("acq_yr"))
      .groupBy("acq_yr").agg(count(lit(1)).as("n_customers"))
      .withColumn("acq_decade",
        col("acq_yr") - pmod(col("acq_yr"), lit(10)))
      .select("acq_yr", "acq_decade", "n_customers")
      .orderBy("acq_yr")

  /** Persona-scoring branch (ref 92-...py:497-600): corpus-level
    * share signals — the fraction of tracks whose genre/style token
    * list hits a persona vocabulary, and the mean non-empty share of
    * persona-typical role columns — max-combined per persona, then
    * argmax with the reference's 0.22 threshold (below it → "mixed").
    * Ties prefer the reference's dict order (classical, jazz,
    * electronic, rock_pop). ONE aggregation pass over the tracks: all
    * shares are map-side-combinable boolean means. */
  def personaScores(tracks: DataFrame,
                    classicalRoles: Seq[String],
                    electronicRoles: Seq[String]): DataFrame = {
    import graft.core.MultiValue
    def lowToks(c: String): Column =
      transform(MultiValue.tokens(coalesce(col(c), lit(""))),
        t => lower(t))
    def anyTok(c: String, ts: Seq[String]): Column =
      avg(arrays_overlap(lowToks(c), lit(ts.toArray)).cast("int"))
    def nonEmpty(c: String): Column =
      avg((col(c).isNotNull && col(c) =!= "").cast("int"))
    val classicalT = Seq("classical", "baroque", "romantic", "opera",
      "symphony", "chamber")
    val jazzT = Seq("jazz", "bebop", "hard bop", "swing", "fusion")
    val elecT = Seq("electronic", "electronica", "ambient", "techno",
      "house", "trance", "idm", "dnb")
    val rockT = Seq("rock", "pop", "indie", "alternative", "metal",
      "punk", "grunge", "folk")
    def roleMean(roles: Seq[String]): Column =
      roles.map(nonEmpty).reduce(_ + _) / roles.size
    val agg = tracks.agg(
      anyTok("genre", classicalT).as("g_cls"),
      anyTok("style", classicalT).as("s_cls"),
      anyTok("genre", jazzT).as("g_jazz"),
      anyTok("style", jazzT).as("s_jazz"),
      anyTok("genre", elecT).as("g_elec"),
      anyTok("style", elecT).as("s_elec"),
      anyTok("genre", rockT).as("g_rock"),
      anyTok("style", rockT).as("s_rock"),
      roleMean(classicalRoles).as("role_cls"),
      roleMean(electronicRoles).as("role_elec"))
    val scoresDf = agg.select(
      greatest(col("g_cls"), col("s_cls"), col("role_cls")).as("classical"),
      greatest(col("g_jazz"), col("s_jazz")).as("jazz"),
      greatest(col("g_elec"), col("s_elec"), col("role_elec"))
        .as("electronic"),
      greatest(col("g_rock"), col("s_rock")).as("rock_pop"))
    scoresDf.withColumn("persona",
      when(greatest(col("classical"), col("jazz"), col("electronic"),
        col("rock_pop")) < 0.22, "mixed")
        .when(col("classical") >= col("jazz") &&
          col("classical") >= col("electronic") &&
          col("classical") >= col("rock_pop"), "classical")
        .when(col("jazz") >= col("electronic") &&
          col("jazz") >= col("rock_pop"), "jazz")
        .when(col("electronic") >= col("rock_pop"), "electronic")
        .otherwise("rock_pop"))
  }

  /** Report 94 (ref `scripts/reports/94-report-missing-critical-tags-
    * by-album.py`): exception-only wide report — one row per album
    * (album-root of `dirCol`, disc subfolders collapsed) that has at
    * least one track missing a critical field. A field is missing when
    * NULL or blank after trim; each critical column carries the
    * album's missing-track count, 0 → NULL for readability; on
    * compilation albums `albumartist` is not required (zeroed before
    * the any-missing filter, ref :199-209).
    *
    * One hash aggregation on the album root — the per-column sums are
    * map-side partial, so at 100 TB this is a single shuffle of
    * album-count rows, not tracks. */
  def missingCriticalTags(tracks: DataFrame, dirCol: String,
                          criticalCols: Seq[String],
                          compilationCol: Option[String] = None)
      : DataFrame = {
    def missing(c: String): Column = {
      val s = trim(col(c))
      s.isNull || (s === "")
    }
    val aggs =
      count(lit(1)).as("total_tracks") +:
      criticalCols.map(c =>
        sum(missing(c).cast("int")).cast("int").as(c)) ++:
      compilationCol.map(c =>
        max(col(c).cast("int")).as("__is_comp")).toSeq
    val grouped = tracks
      .groupBy(graft.core.Exprs.albumRoot(col(dirCol)).as("album_dirpath"))
      .agg(aggs.head, aggs.tail: _*)
    val compAdj = compilationCol match {
      case Some(_) if criticalCols.contains("albumartist") =>
        grouped.withColumn("albumartist",
          when(col("__is_comp") === 1, lit(0))
            .otherwise(col("albumartist")))
      case _ => grouped
    }
    val anyMissing = criticalCols.map(c => col(c) > 0).reduce(_ || _)
    compAdj
      .filter(anyMissing)
      .select(
        Seq(col("album_dirpath"),
          regexp_replace(regexp_replace(col("album_dirpath"), "/$", ""),
            "^.*/", "").as("album_dirname"),
          col("total_tracks")) ++
        criticalCols.map(c =>
          when(col(c) === 0, lit(null)).otherwise(col(c)).as(c)): _*)
      .orderBy("album_dirpath")
  }
}
