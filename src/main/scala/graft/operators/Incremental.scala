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
