package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.BinaryType

/** Explicit Bloom-filter runtime pruning for selective joins — the
  * "semi-join reduction" half of Spark's own `InjectRuntimeFilter`
  * rewrite, exposed as an operator the caller controls.
  *
  * Why it exists when Catalyst already has the rewrite: the built-in
  * injection is gated on config flags, creation-side size thresholds
  * and shuffle-stage shapes, so exactly the plans that need it most
  * (a derived dimension behind an aggregation, a reused build side, a
  * disabled-by-default deployment) often don't get it. This operator
  * makes the same plan shape deterministic: build the filter, prune
  * the fact scan, confirm exactly.
  *
  * 100 TB shape: the dim side folds into ONE fixed-size sketch
  * (partial Bloom buffers merge map-side — the aggregation shuffles
  * `numBits`-sized buffers, not rows), the driver embeds it as a
  * binary literal in a scan-side predicate, and the fact table drops
  * non-matching rows INSIDE the scan stage — misses never reach the
  * exchange. Only the survivors (true matches + ≤fpp false positives)
  * shuffle into the exact semi-join that removes the false positives,
  * so the result is row-identical to the plain semi-join REGARDLESS
  * of the sketch's content — correctness never depends on the Bloom
  * bits, only the pruning rate does. The codegen'd
  * [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
  * keeps the probe inside whole-stage codegen (one xxhash64 + bit
  * probes per row).
  *
  * Sizing: the sketch is ~1.2 MB per 10⁶ expected items at the 3%
  * default fpp and ships with the task closure once per executor —
  * size `expectedItems` to the DISTINCT dim keys, not the dim rows.
  */
object RuntimeFilter {

  /** Build a serialized Bloom filter of `xxhash64(keyCol)` over `dim`
    * — one aggregation job; the returned bytes are driver-held and
    * closure-shipped (sketch-sized, not data-sized). */
  def bloomFilterFor(dim: DataFrame, keyCol: String,
                     expectedItems: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      Shims.toExpression(xxhash64(col(keyCol))), expectedItems)
      .toAggregateExpression()
    dim.select(Shims.toColumn(agg).as("bf")).head.getAs[Array[Byte]](0)
  }

  /** Scan-side membership probe against a built sketch: true for every
    * key inserted, true with probability ~fpp for the rest. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Shims.toColumn(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      Shims.toExpression(xxhash64(key))))

  /** Bloom-pruned exact semi-join: rows of `fact` whose `factKey`
    * appears in `dim.dimKey`. Row-identical to
    * `fact.join(dim, fact(factKey) === dim(dimKey), "left_semi")` —
    * the Bloom prefilter only reduces what reaches the join's
    * exchange (misses drop in the fact scan stage; false positives
    * are removed by the exact join). */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame,
                    factKey: String, dimKey: String,
                    expectedItems: Long = 1000000L): DataFrame = {
    val bloom = bloomFilterFor(dim, dimKey, expectedItems)
    val keys = dim.select(col(dimKey).as("__rf_key"))
    fact.filter(mightContain(bloom, col(factKey)))
      .join(keys, col(factKey) === col("__rf_key"), "left_semi")
  }

  /** Bloom-pruned exact anti-join — the dual shape: at 100 TB an
    * anti-join against a small-but-unbroadcastable dim pays a full
    * fact shuffle; with the sketch, rows the filter REJECTS are
    * definite non-members (no false negatives) and can bypass the
    * join entirely, so only the `mightContain` survivors shuffle in
    * to have their false-positive status resolved exactly. */
  def bloomAntiJoin(fact: DataFrame, dim: DataFrame,
                    factKey: String, dimKey: String,
                    expectedItems: Long = 1000000L): DataFrame = {
    val bloom = bloomFilterFor(dim, dimKey, expectedItems)
    val keys = dim.select(col(dimKey).as("__rf_key"))
    // probe is never null: xxhash64 folds a NULL key into the seed
    // rather than returning NULL, and a null key row behaves the same
    // on either branch (it matches nothing in the exact anti-join)
    val probe = mightContain(bloom, col(factKey))
    // definite misses (probe false) are anti-join members by
    // construction; probe hits go through the exact anti-join
    fact.filter(!probe).unionByName(
      fact.filter(probe)
        .join(keys, col(factKey) === col("__rf_key"), "left_anti"))
  }
}
