package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no built-in operator for: as-of (latest
  * state at or before a point in time) and interval/range (point inside
  * [start, end) with no equi key). The reference joins event-shaped
  * tables to slowly-changing reference data the same way its
  * incremental import pairs file mtimes with the last-seen snapshot
  * (ref tags2db.py:1146-1210 `existing_records` probe by path + mtime
  * comparison); here both are first-class, scale-shaped operators.
  *
  * Scale shapes:
  *  - [[asofJoin]] never builds a join at all: probe and build rows
  *    union into one stream, shuffle ONCE on the key, and a running
  *    `last(ignoreNulls)` window carries the most recent build payload
  *    forward into each probe row. This is the merge-sorted as-of, the
  *    same plan a 1000-executor cluster wants: no per-row subquery, no
  *    range sort-merge dance, one Exchange + one sort. A hot key
  *    concentrates its rows in one partition — same skew exposure as
  *    any keyed window (salt upstream if a single key exceeds a
  *    partition's memory).
  *  - [[rangeJoin]] buckets time into fixed-width cells: an interval
  *    explodes into the cells it covers (⌈len/width⌉, typically 1-2), a
  *    point lands in exactly one, and the pair meets on a cell-keyed
  *    equi-join with the exact containment predicate as a residual
  *    filter. No broadcast-nested-loop, no cartesian: candidate volume
  *    is bounded by cell co-residency, the published interval-join
  *    design (Flink's interval join, DuckDB's IEJoin literature).
  */
object Temporal {

  /** Left as-of join: attach to each probe row the build row with the
    * greatest `tsCol <= probe.tsCol` for the same `key` (ties at equal
    * ts: the build row wins — "at or before"; among build rows sharing
    * a ts, the greatest `tieCol` wins). Probe rows with no prior build
    * row keep nulls.
    *
    * @param payloadCols build columns to carry (beyond tsCol/tieCol)
    * @param prefix      prefix for the attached build columns
    * @param tolerance   max probe.ts − build.ts (same units as tsCol);
    *                    a match older than this nulls out, the standard
    *                    time-series as-of tolerance. ≤ 0 = unbounded.
    *                    A post-filter on the carried match suffices:
    *                    the window carries the LATEST prior build row,
    *                    and every earlier one is older still, so
    *                    "latest is out of tolerance" means no row
    *                    qualifies — null is the only correct answer.
    * @return probe.columns ++ (tsCol, tieCol, payloadCols*).map(prefix+) */
  def asofJoin(probe: DataFrame, build: DataFrame, key: String,
               tsCol: String, tieCol: String,
               payloadCols: Seq[String] = Seq.empty,
               prefix: String = "asof_",
               tolerance: Long = 0L): DataFrame = {
    val payFields = (Seq(tsCol, tieCol) ++ payloadCols).distinct
    val tieType = build.schema(tieCol).dataType
    val bSide = build.select(col(key), col(tsCol),
      col(tieCol).as("__tie"),
      struct(payFields.map(col): _*).as("__asof"))
    // null-pad the build rows to the probe schema so both sides union
    // into one keyed stream (types from probe, no inference drift)
    val bAligned = bSide.select(probe.schema.fields.map { f =>
      if (f.name == key || f.name == tsCol) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq ++ Seq(col("__tie"), col("__asof")): _*)
      .withColumn("__side", lit(0))
    val pAligned = probe
      .withColumn("__tie", lit(null).cast(tieType))
      .withColumn("__asof",
        lit(null).cast(bSide.schema("__asof").dataType))
      .withColumn("__side", lit(1))
    // build sorts before probe at equal ts (__side 0 < 1) → "<=";
    // running last(ignoreNulls) = most recent build payload so far.
    // Probe rows tie among themselves at (ts, side, null) — harmless:
    // their null payloads are invisible to last(ignoreNulls)
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pAligned.unionByName(bAligned)
      .withColumn("__m", last(col("__asof"), ignoreNulls = true).over(w))
      .withColumn("__m", if (tolerance <= 0L) col("__m")
        else when(col(tsCol) - col(s"__m.$tsCol") <= tolerance, col("__m")))
      .where(col("__side") === 1)
      .select(probe.columns.map(col).toSeq ++
        payFields.map(f => col(s"__m.$f").as(prefix + f)): _*)
  }

  /** Inner interval join with no equi key: every (interval, point) pair
    * with `startCol <= ptCol < endCol`. Caller renames collisions
    * between the two schemas first. `bucketWidth` should be at least
    * the typical interval length (an interval explodes into
    * `len/bucketWidth + 1` cells).
    *
    * Column args are NAMES (not expressions) — bucketing divides them
    * with integral DIV, so they must be integral (e.g. epoch micros). */
  def rangeJoin(intervals: DataFrame, startCol: String, endCol: String,
                points: DataFrame, ptCol: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    // [start, end): the last cell that can contain a point is
    // (end-1) DIV width; sequence() is inclusive on both ends
    val iv = intervals.withColumn("__bk", explode(sequence(
      expr(s"$startCol DIV ${bucketWidth}L"),
      expr(s"($endCol - 1L) DIV ${bucketWidth}L"))))
    val pt = points.withColumn("__bk", expr(s"$ptCol DIV ${bucketWidth}L"))
    iv.join(pt, iv("__bk") === pt("__bk")
        && pt(ptCol) >= iv(startCol) && pt(ptCol) < iv(endCol))
      .drop(iv("__bk")).drop(pt("__bk"))
  }
}
