package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Coverage snapshots (ref `src/tagminder/core/tm_snapshots.py:56-218`):
  * aggregate-only captures (never row copies) taken before/after a
  * pipeline run and diffed for the compare dashboard (ref 90/91
  * scripts). One pass computes per-column populated counts via
  * conditional-sum fan-out — the A3 pattern widened to the full schema.
  */
object Snapshots {

  /** One-row snapshot: total rows + a populated-count per column.
    * Single aggregation, no shuffle beyond the partial/final agg.
    * `df.col(c)` (exact-name resolution) rather than `col(c)` so
    * names containing dots or backticks are read literally. A data
    * column literally named "rows" would collide with the `n_rows`
    * total in this wide shape — rejected up front. */
  def coverage(df: DataFrame, runId: String): DataFrame = {
    require(!df.columns.contains("rows"),
      "coverage(): a column named 'rows' collides with the n_rows total; rename it first")
    val aggs = count(lit(1)).as("n_rows") +:
      df.columns.toSeq.map(c =>
        sum(when(df.col(c).isNotNull, 1).otherwise(0)).as(s"n_$c"))
    df.agg(aggs.head, aggs.tail: _*).withColumn("run_id", lit(runId))
  }

  /** Long-form coverage (column, populated, share) — the report shape.
    * Built as an explode over an array of structs, not a stack()
    * selectExpr: no SQL-string interpolation, so arbitrary column
    * names (quotes, backticks, a column named "rows") are safe, and
    * the per-column counts use positional internal names that cannot
    * collide with data columns. */
  def coverageLong(df: DataFrame, runId: String): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = count(lit(1)).as("__graft_total") +:
      cols.zipWithIndex.map { case (c, i) =>
        sum(when(df.col(c).isNotNull, 1).otherwise(0)).as(s"__graft_c$i")
      }
    val pairs = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column"), col(s"__graft_c$i").as("populated"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(lit(runId).as("run_id"), col("__graft_total").as("n_rows"),
        explode(array(pairs: _*)).as("kv"))
      .select(col("run_id"), col("n_rows"),
        col("kv.column").as("column"), col("kv.populated").as("populated"))
      .withColumn("share",
        col("populated").cast("double") / col("n_rows"))
  }

  /** Compare two long-form snapshots by column → coverage delta
    * (ref 91-compare dashboards). */
  def compare(before: DataFrame, after: DataFrame): DataFrame =
    before.select(col("column"), col("populated").as("before"))
      .join(after.select(col("column"), col("populated").as("after")),
        Seq("column"), "full_outer")
      .withColumn("delta",
        coalesce(col("after"), lit(0L)) - coalesce(col("before"), lit(0L)))

  /** Run-keyed snapshot store (ref `tm_snapshots.py:56-83` — the
    * `_SNAP_runs` discipline): each pipeline run APPENDS its
    * aggregate-only capture under a monotone `run_seq`, so the
    * compare dashboards diff STORED rows instead of recomputing
    * history — one snapshot pass per crawl, however long the history
    * grows. The store is run-count-sized (one row per run per
    * snapshot shape), config-class by construction; `overwrite = true`
    * resets it (the first run of a rebuilt store). */
  def appendRun(snap: DataFrame, runId: String, runSeq: Int, dir: String,
      overwrite: Boolean = false): Unit = {
    require(!snap.columns.contains("run_id") &&
      !snap.columns.contains("run_seq"),
      "appendRun(): snapshot already carries run_id/run_seq; " +
        "pass the bare capture and let the store key it")
    require(!snap.columns.contains("__graft_append_id"),
      "appendRun(): __graft_append_id is a reserved store column")
    // each append stamps ONE fresh append id on all its rows — the
    // detector for a same-run_id re-append whose recomputed capture
    // values DRIFTED between attempts (non-deterministic floats,
    // timestamps): no row duplicates exactly and only one run_id
    // holds the seq, so neither of lastTwoRuns' content checks could
    // see it, but two append ids under one run_seq can. A literal
    // column — no extra job, no double execution of the capture plan.
    snap.withColumn("run_id", lit(runId))
      .withColumn("run_seq", lit(runSeq))
      .withColumn("__graft_append_id",
        lit(java.util.UUID.randomUUID().toString))
      .write.mode(if (overwrite) "overwrite" else "append").parquet(dir)
  }

  /** Read an [[appendRun]] store for [[lastTwoRuns]]. Plain
    * `spark.read.parquet` infers the schema from ONE parquet footer —
    * on a store upgraded mid-life (pre-stamp runs written before
    * `__graft_append_id` existed), that footer may predate the stamp,
    * making the column invisible to the whole read and silently
    * disarming the drifted-re-append detector. mergeSchema unions the
    * footers, so the stamp is visible whenever ANY run carries it;
    * the store is run-count-sized by the appendRun contract, so the
    * extra footer reads are config-class. Callers that read the
    * store themselves must pass mergeSchema=true the same way. */
  def loadRunStore(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)

  /** The latest and previous runs of a store, as (before, after) —
    * the 90/91 compare inputs read from DISK. The run roster (one
    * aggregate row per `run_seq`) is collected to the driver: the
    * store is run-count-sized by the [[appendRun]] contract
    * (aggregate-only captures, one capture per crawl), so the roster
    * is config-class — the same license as a literal rate map. The
    * two LATEST DISTINCT seqs are selected, so a gap in the sequence
    * (a crawl that crashed before appending) shifts the "before"
    * side to the newest run that actually landed instead of silently
    * matching nothing.
    *
    * Guards (the validateKnSnapshot discipline — contract violations
    * fail LOUDLY instead of corrupting the diff downstream):
    *  - a store holding fewer than two runs would otherwise return an
    *    empty "before" side and the caller's metric join would
    *    silently yield zero delta rows (a first-crawl dashboard must
    *    say "need two runs", not "nothing changed");
    *  - a re-appended `run_seq` (a crashed crawl retrying without
    *    `overwrite` — the reference store's `run_id PRIMARY KEY`,
    *    ref `tm_snapshots.py:56-83`) would fan the compare join out
    *    into duplicated delta rows: detected as either several
    *    run_ids sharing one seq, or — for a SAME-run_id re-append,
    *    which doubles every one of its run's rows — exact duplicate
    *    rows inside one run. The duplicate check is deliberately
    *    scoped to same-run duplication, NOT to uniform row counts
    *    across runs: legitimate long-form captures vary in size
    *    between crawls (a row-per-group capture where a group
    *    appears or vanishes), and a uniform-count guard would
    *    misdiagnose that shape drift as corruption;
    *  - a same-run_id re-append whose recomputed rows DRIFTED between
    *    attempts (non-deterministic capture values) duplicates no row
    *    exactly — caught by the per-append stamp [[appendRun]] writes:
    *    two `__graft_append_id`s under one run_seq is a retry,
    *    whatever the content says. Stores written before the stamp
    *    existed lack the column and skip this check (the two content
    *    checks still cover them). */
  def lastTwoRuns(store: DataFrame): (DataFrame, DataFrame) = {
    val stamped = store.columns.contains("__graft_append_id")
    val appends =
      if (stamped) countDistinct("__graft_append_id") else lit(1L)
    val runs = store.groupBy("run_seq")
      .agg(count(lit(1)).as("n"), countDistinct("run_id").as("ids"),
        appends.as("appends"))
      .orderBy(col("run_seq").desc)
      .collect()
    require(runs.length >= 2,
      s"run store holds ${runs.length} run(s) - need at least two " +
        "appended runs before a delta can be computed")
    require(runs.forall(_.getLong(2) == 1L),
      "run store corrupt: several run_ids share one run_seq - a " +
        "crashed crawl re-appended a run_seq (appendRun with " +
        "overwrite=true resets the store)")
    // <= 1, not == 1: a store UPGRADED mid-life holds pre-stamp runs
    // whose rows read the column as null (countDistinct over an
    // all-null group is 0) — those runs predate the detector and are
    // covered by the content checks; only TWO OR MORE stamps under
    // one seq is ever a retry. (Read the store via [[loadRunStore]]:
    // its mergeSchema union keeps the stamp visible on upgraded
    // stores, where plain schema inference could pick a pre-stamp
    // footer and silently disarm this check.)
    require(runs.forall(_.getLong(3) <= 1L),
      "run store corrupt: several appends share one run_seq - a " +
        "crashed crawl re-appended its own run_seq, possibly with " +
        "drifted recomputed values (appendRun with overwrite=true " +
        "resets the store)")
    // one job over the run-count-sized store (the appendRun
    // aggregate-only contract keeps it config-class)
    require(store.groupBy(store.columns.map(col): _*)
      .agg(count(lit(1)).as("__graft_n"))
      .filter(col("__graft_n") > 1).isEmpty,
      "run store corrupt: exact duplicate capture rows inside a run " +
        "- a crashed crawl re-appended its own run_seq (appendRun " +
        "with overwrite=true resets the store)")
    // the stamp is store bookkeeping, not capture content — dropped
    // so diffs and schema-sensitive consumers never see it
    (store.filter(col("run_seq") === runs(1).get(0))
        .drop("__graft_append_id"),
      store.filter(col("run_seq") === runs(0).get(0))
        .drop("__graft_append_id"))
  }
}
