package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}
import graft.operators.Temporal

/** Temporal-join queries: as-of and interval/range join over the
  * events table. Both operators are beyond the reference's literal
  * surface but are the canonical event-time joins any analytics engine
  * over event data needs (and the builder brief names both as flagship
  * custom operators).
  *
  * The events table's `ts` arrives as long epoch NANOS (normalized at
  * the [[graft.core.Tables.normalizeEventTs]] chokepoint whatever the
  * parquet's physical precision) while DuckDB reads the same file as a
  * timestamp — so every comparison and output here is integer MICROS
  * on both engines (ts DIV 1000 vs epoch_us), keeping the hash exact.
  */
object TemporalQueries {
  type Q = (SparkSession, String) => DataFrame

  private def eventsUs(s: SparkSession, d: String, kind: String): DataFrame =
    T.events(s, d).where(col("event_type") === kind)
      .select(col("event_id"), col("user_id"),
        expr("ts DIV 1000L").as("ts_us"), col("value"))

  val defs: Map[String, Q] = Map(
    // As-of join: each purchase attaches the user's latest click at or
    // before it (unbounded lookback — the attribution join st_attrib
    // can't express: that one is interval-bounded, this one is "most
    // recent state"). One shuffle on user_id, no join node at all.
    "aj_asof_click" -> ((s, d) => {
      val probe = eventsUs(s, d, "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts_us"))
      val build = eventsUs(s, d, "click")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      Temporal.asofJoin(probe, build, "user_id", "ts_us", "event_id")
        .select(col("purchase_id"), col("user_id"), col("ts_us"),
          col("asof_event_id").as("click_id"),
          col("asof_ts_us").as("click_ts_us"),
          (col("ts_us") - col("asof_ts_us")).as("wait_us"))
        .orderBy("purchase_id")
    }),

    // As-of with tolerance: same attribution, but a click older than
    // 24h no longer counts (standard time-series as-of semantics — the
    // latest prior state expires).
    "aj_asof_tolerance" -> ((s, d) => {
      val tol = 86400000000L // 24h in micros
      val probe = eventsUs(s, d, "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts_us"))
      val build = eventsUs(s, d, "click")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      Temporal.asofJoin(probe, build, "user_id", "ts_us", "event_id",
          tolerance = tol)
        .select(col("purchase_id"), col("user_id"), col("ts_us"),
          col("asof_event_id").as("click_id"),
          col("asof_ts_us").as("click_ts_us"))
        .orderBy("purchase_id")
    }),

    // Interval join with NO equi key: every signup opens a 2-hour
    // window; count/sum the purchases (any user) landing inside it.
    // Bucketed cell join — no BroadcastNestedLoop, no cartesian.
    "rj_signup_window" -> ((s, d) => {
      val win = 7200000000L // 2h in micros
      val sig = eventsUs(s, d, "signup")
        .select(col("event_id").as("signup_id"), col("ts_us").as("start_us"),
          (col("ts_us") + win).as("end_us"))
      val pur = eventsUs(s, d, "purchase")
        .select(col("event_id").as("purchase_id"), col("ts_us").as("pt_us"),
          col("value"))
      val pairs = Temporal.rangeJoin(sig, "start_us", "end_us",
        pur, "pt_us", bucketWidth = win)
      val hits = pairs.groupBy("signup_id").agg(
        count(lit(1)).as("n_hits"),
        sum(expr("CAST(ROUND(value*100) AS BIGINT)")).as("v_cents"))
      sig.select("signup_id").join(hits, Seq("signup_id"), "left")
        .select(col("signup_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          coalesce(col("v_cents"), lit(0L)).as("v_cents"))
        .orderBy("signup_id")
    }),
  )

  val sql: Map[String, String] = Map(
    "aj_asof_click" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |epoch_us(p.ts) AS ts_us, c.click_id, c.click_ts_us,
        |epoch_us(p.ts) - c.click_ts_us AS wait_us
        |FROM events p LEFT JOIN LATERAL (
        |  SELECT c.event_id AS click_id, epoch_us(c.ts) AS click_ts_us
        |  FROM events c
        |  WHERE c.user_id = p.user_id AND c.event_type = 'click'
        |    AND epoch_us(c.ts) <= epoch_us(p.ts)
        |  ORDER BY epoch_us(c.ts) DESC, c.event_id DESC LIMIT 1
        |) c ON TRUE
        |WHERE p.event_type = 'purchase'
        |ORDER BY purchase_id""".stripMargin,
    "aj_asof_tolerance" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |epoch_us(p.ts) AS ts_us, c.click_id, c.click_ts_us
        |FROM events p LEFT JOIN LATERAL (
        |  SELECT c.event_id AS click_id, epoch_us(c.ts) AS click_ts_us
        |  FROM events c
        |  WHERE c.user_id = p.user_id AND c.event_type = 'click'
        |    AND epoch_us(c.ts) <= epoch_us(p.ts)
        |    AND epoch_us(p.ts) - epoch_us(c.ts) <= 86400000000
        |  ORDER BY epoch_us(c.ts) DESC, c.event_id DESC LIMIT 1
        |) c ON TRUE
        |WHERE p.event_type = 'purchase'
        |ORDER BY purchase_id""".stripMargin,
    "rj_signup_window" ->
      """SELECT s.event_id AS signup_id,
        |COUNT(p.event_id) AS n_hits,
        |CAST(COALESCE(SUM(CAST(ROUND(p.value*100) AS BIGINT)), 0)
        |  AS BIGINT) AS v_cents
        |FROM events s LEFT JOIN events p
        |  ON p.event_type = 'purchase'
        | AND epoch_us(p.ts) >= epoch_us(s.ts)
        | AND epoch_us(p.ts) < epoch_us(s.ts) + 7200000000
        |WHERE s.event_type = 'signup'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
