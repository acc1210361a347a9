package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY §7.4 risk 7): salting for hot keys
  * in aggregations. The two-phase pattern — aggregate on (key, salt)
  * first, then merge per key — keeps any single reducer from owning a
  * hot key's entire traffic. AQE's skew-join handling covers the join
  * side; this covers the aggregation side, which AQE does not split.
  */
object Scale {

  /** Deterministic salt in [0, n): hash of the whole row's key plus a
    * spread column. Use a high-cardinality column (an id) as `spread` —
    * rows with the same hot key scatter across `n` partial groups. */
  def salt(spread: Column, n: Int): Column = pmod(xxhash64(spread), lit(n))

  /** Two-phase salted count: groupBy(key) counts where one key may be
    * arbitrarily hot. Phase 1 shuffles on (key, salt) — bounded bucket
    * size; phase 2 merges the n partials per key. */
  def saltedCount(df: DataFrame, keyCol: String, spreadCol: String,
                  n: Int = 32): DataFrame =
    df.groupBy(col(keyCol), salt(col(spreadCol), n).as("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keyCol)
      .agg(sum(col("__partial")).as("n"))

  /** Skew-salted equi-join: the fact side salts each row
    * deterministically into one of `n` buckets, the dim side replicates
    * every row across ALL `n` buckets, and the join runs on
    * (key, salt) — a hot fact key's rows spread over `n` reducers
    * instead of one. Result is row-for-row identical to
    * `fact.join(dim, key)` (inner); only the partitioning changes.
    *
    * This is the explicit fallback for the cases AQE's skew-join split
    * does not reach: a skewed SHUFFLE side that must pair with a dim
    * too big to broadcast but cheap to replicate `n`×, or a skewed
    * build feeding a later stage through a required distribution. Cost
    * model: dim shuffle volume × n vs hot-partition wall time — keep
    * `n` small (8-32). `spreadCol`: any high-cardinality fact column;
    * identical (spread, key) rows share a bucket, which skews nothing
    * unless the fact table is itself one repeated row. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 spreadCol: String, n: Int = 16): DataFrame = {
    val f = fact.withColumn("__salt", salt(col(spreadCol), n))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(n - 1L))))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }
}
