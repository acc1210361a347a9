package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the pattern that keeps a
  * 100 TB pipeline's rollups fresh WITHOUT rescanning the corpus:
  * aggregates whose state is mergeable (sum, count-as-sum, min, max,
  * and anything built from them — avg = sum/count, coverage ratios,
  * per-key firsts/lasts) can be maintained as partial-aggregate
  * tables, with each ingest batch contributing its own partial and a
  * key-wise merge producing exactly the full recompute's answer.
  * This is Spark's own map-side partial aggregation lifted to the
  * PIPELINE level: the "map side" is yesterday's materialized rollup,
  * the "reduce" is one config-table-sized merge per batch.
  *
  * The merge is associative and commutative by construction, so batch
  * arrival order, batch boundaries, and replays of an idempotent
  * upsert sink all yield the same table — the same argument the
  * streaming twins (st_s7_new etc.) make for joins, applied to
  * aggregation state.
  */
object Incremental {

  /** Retract documents from a per-doc fact snapshot — the REMOVAL
    * side of the maintenance story ([[graft.operators.Search
    * .mergeTfSnapshots]] / [[graft.operators.TextAnalysis
    * .mergeKnSnapshots]] grow an index; this shrinks it for data
    * takedowns, right-to-be-forgotten requests, or a quarantined
    * source). Both snapshot families consist ONLY of rows that
    * derive from their own doc's text (tf cells / bigram counts plus
    * the per-doc marker), and every corpus rollup (N, df, dl, idf,
    * context counts, fertilities, type totals) derives DOWNSTREAM in
    * the shared scorer — so one anti-join IS the complete
    * retraction: the result is row-for-row the snapshot a fresh
    * build over the remaining docs would produce, and the
    * family's validator still holds (one marker per surviving doc).
    * One shuffle-on-id pass over the snapshot, no text rescanned;
    * ids absent from the snapshot retract vacuously. */
  def retractDocs(snapshot: DataFrame, removeIds: DataFrame,
                  idCol: String = "doc_id"): DataFrame =
    // no distinct(): an anti-join is unaffected by duplicate
    // right-side keys, and the dedup would be a wasted shuffle
    snapshot.join(removeIds.select(col(idCol)), Seq(idCol), "left_anti")

  /** Subtract a retracted batch's partial from a maintained rollup —
    * the INVERSE of [[mergeRollups]], defined only for SUM-mergeable
    * state: sums form a group (every count has an inverse), so
    * subtracting the retracted slice's partial is exact — key-for-key
    * the rollup a fresh pass over the remaining corpus builds. Keys
    * full-outer join; rows whose every sum reaches zero drop;
    * NEGATIVE sums (a batch retracted twice, or never merged in)
    * stay visible for the caller's validator rather than being
    * silently swallowed.
    *
    * What is NOT retractable this way — and not by any other
    * one-pass trick: min/max state (the retracted row might BE the
    * min, and the runner-up was never kept) and the distinct-set /
    * sketch family (gram sets, HLL, Bloom — membership carries no
    * multiplicity, so deletion needs counting state, the standard
    * sketch-theory caveat). Those artifacts retract by recount over
    * the survivors, or by switching to their counted variants (the
    * line-count tables here, a counting Bloom filter in general). */
  def subtractRollups(total: DataFrame, removed: DataFrame,
                      keys: Seq[String],
                      sums: Seq[String]): DataFrame = {
    require(sums.nonEmpty, "need at least one sum column")
    val rm = sums.foldLeft(removed)((df, c) =>
      df.withColumnRenamed(c, s"__graft_rm_$c"))
    total.join(rm, keys, "full_outer")
      .select(keys.map(col) ++ sums.map(c =>
        (coalesce(col(c), lit(0L))
          - coalesce(col(s"__graft_rm_$c"), lit(0L))).as(c)): _*)
      .filter(sums.map(c => col(c) =!= 0L).reduce(_ || _))
  }

  /** Merge mergeable partial rollups: union all partials and
    * re-aggregate with each column's merge function.
    *
    * @param specs (column, fn) with fn one of "sum" (also merges
    *              counts), "min", "max". */
  def mergeRollups(partials: Seq[DataFrame], keys: Seq[String],
                   specs: Seq[(String, String)]): DataFrame = {
    require(partials.nonEmpty, "need at least one partial rollup")
    require(specs.nonEmpty, "need at least one merge spec")
    def mergeFn(c: String, fn: String): Column = fn match {
      case "sum" => sum(col(c)).as(c)
      case "min" => min(col(c)).as(c)
      case "max" => max(col(c)).as(c)
      case other =>
        throw new IllegalArgumentException(
          s"not a mergeable aggregate: $other (column $c)")
    }
    val aggs = specs.map { case (c, fn) => mergeFn(c, fn) }
    partials.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
