package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-value field codec — THE most reused primitive in the system.
  *
  * The reference stores multi-value tags as one TEXT value joined by a
  * two-backslash delimiter (`A\\B\\C`): tags2db.py:110-121, configured at
  * tagminder.toml:447-451. The canonical tokenization (split → strip →
  * drop empties → order-preserving unique) is tm_polars.py:53-70.
  *
  * All operations are pure Column expressions — no UDFs, so they run
  * inside the scan-stage projection with full pushdown/pruning. (HOF
  * lambdas are CodegenFallback in Spark, but remain a single Project
  * with no extra shuffle — PlanSpec asserts this.)
  */
object MultiValue {

  /** The literal delimiter: two backslashes. */
  val Delim: String = "\\\\"

  /** Regex matching the delimiter (each literal backslash escaped). */
  val DelimRe: String = "\\\\\\\\"

  /** split → trim → drop empty/null tokens. Preserves first-seen order. */
  def tokens(c: Column): Column =
    filter(
      transform(split(c, DelimRe), t => trim(t)),
      t => t.isNotNull && t =!= "")

  /** Order-preserving unique tokens (array_distinct keeps first occurrence). */
  def dedupeTokens(c: Column): Column = array_distinct(tokens(c))

  /** Case-insensitive order-preserving dedupe over an already-built
    * token array (the reference's casefold `seen` set, 01-...py:88-101).
    * A quadratic fold, but per-cell token counts are tiny; stays a pure
    * expression so it runs scan-side. */
  def dedupeCasefold(arr: Column): Column =
    aggregate(arr, array().cast("array<string>"),
      (acc, x) => when(exists(acc, y => lower(y) === lower(x)), acc)
        .otherwise(concat(acc, array(x))))

  /** Join an array back to the delimited string form. */
  def joinTokens(arr: Column): Column = array_join(arr, Delim)

  /** Canonical normalization: tokenize, dedupe (order-preserving), re-join;
    * empty result ⇒ NULL (matches reference empty→NULL policy,
    * tm_polars.py:53-70 + 17-dedupe-columns.py:78-93). */
  def normalize(c: Column): Column = {
    val d = dedupeTokens(c)
    when(c.isNull || size(d) === 0, lit(null)).otherwise(joinTokens(d))
  }

  /** Number of (non-empty) tokens. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** True when the cell holds more than one value (candidate filter for
    * dedupe passes; ≙ instr(c, delim) > 0, 17-dedupe-columns.py:106-132). */
  def isMulti(c: Column): Column = c.isNotNull && c.contains(Delim)
}
