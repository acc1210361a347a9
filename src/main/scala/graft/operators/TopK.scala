package graft.operators

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group top-k WITHOUT a window sort.
  *
  * The `row_number().over(partitionBy(g).orderBy(...)) <= k` formulation
  * shuffles EVERY input row to its group's reducer and sorts the whole
  * group — at 100 TB that is the full dataset over the wire for a
  * k-row-per-group answer. This typed [[Aggregator]] keeps a bounded
  * k-element buffer per group inside partial (map-side) aggregation, so
  * only k-sized buffers cross the shuffle: the same partial/final
  * contract `TakeOrderedAndProject` exploits for GLOBAL top-k, extended
  * to per-group. Ordering is (score desc, id asc) — the deterministic
  * tie-break every oracle-checked ranking in this engine uses.
  *
  * The buffer is a plain sorted array (insertion into a k-bounded
  * sorted array beats a heap for the small k this is for; both are
  * O(n log k) — the array has no boxing).
  */
object TopK {

  /** (score, id) pair entering the aggregation. `noScore` carries
    * null-ness explicitly — the previous Long.MinValue sentinel was
    * silent data corruption waiting for a genuine MIN_VALUE score
    * (round-6 advice). A no-score entry ranks below every scored one
    * (`desc_nulls_last`, like the window formulation). The id is
    * generic so string-keyed rankings (token top-k) ride the same
    * bounded-buffer path as long-keyed ones. */
  case class Entry[I](score: Long, noScore: Boolean, id: I)

  /** Bounded top-k aggregator: merge keeps the k best entries by
    * (score desc nulls last, id asc). */
  class TopKAgg[I](k: Int)(implicit ord: Ordering[I],
                           bufEnc: Encoder[Seq[Entry[I]]])
      extends Aggregator[Entry[I], Seq[Entry[I]], Seq[Entry[I]]] {
    require(k > 0, s"k must be positive: $k")

    private def better(a: Entry[I], b: Entry[I]): Boolean =
      if (a.noScore != b.noScore) b.noScore
      else if (a.score != b.score) a.score > b.score
      else ord.lt(a.id, b.id)

    override def zero: Seq[Entry[I]] = Vector.empty

    override def reduce(buf: Seq[Entry[I]], e: Entry[I]): Seq[Entry[I]] =
      insert(buf, e)

    /** One array allocation + one pass per ACCEPTED element; a rejected
      * element returns `buf` itself (same instance — asserted in
      * TopKSpec). The previous `(take :+ e) ++ drop.take` built three
      * intermediate collections per accepted element, measurable churn
      * at k=100 × many groups. */
    private def insert(buf: Seq[Entry[I]], e: Entry[I]): Seq[Entry[I]] = {
      val n = buf.length
      if (n == k && !better(e, buf(n - 1))) buf
      else {
        var i = 0
        while (i < n && !better(e, buf(i))) i += 1
        val m = math.min(n + 1, k)
        val out = new Array[AnyRef](m)
        var j = 0
        while (j < i) { out(j) = buf(j).asInstanceOf[AnyRef]; j += 1 }
        out(i) = e.asInstanceOf[AnyRef]
        j = i + 1
        while (j < m) { out(j) = buf(j - 1).asInstanceOf[AnyRef]; j += 1 }
        scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
          .asInstanceOf[Seq[Entry[I]]]
      }
    }

    override def merge(a: Seq[Entry[I]], b: Seq[Entry[I]]): Seq[Entry[I]] =
      b.foldLeft(a)(insert)

    override def finish(r: Seq[Entry[I]]): Seq[Entry[I]] = r

    override def bufferEncoder: Encoder[Seq[Entry[I]]] = bufEnc

    override def outputEncoder: Encoder[Seq[Entry[I]]] = bufEnc
  }

  /** Per-group top-k of `df`: groups by `groupCols`, ranks by
    * (scoreCol desc nulls last, idCol asc), returns one row per kept
    * entry: groupCols ++ (rank, idCol, scoreCol). The score must be
    * integral (cast upstream — integer ranking is what makes the
    * result engine-exact); ids must be non-null. A null score can
    * still surface in a group with fewer than k non-null rows, where
    * it comes back out as null.
    *
    * Long-keyed convenience wrapper over [[topKPerGroupAs]]. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], scoreCol: String,
                   idCol: String, k: Int): DataFrame =
    topKPerGroupAs[Long](df, groupCols, scoreCol, idCol, k)

  /** Unicode code-point order — equal to UTF-8 lexicographic byte order
    * (a structural property of UTF-8), i.e. Spark's UTF8String binary
    * comparison, for ALL inputs including non-BMP. Scala/Java's natural
    * String ordering is UTF-16 code-UNIT order, which ranks
    * supplementary characters (surrogate pairs, 0xD800-0xDFFF units)
    * BELOW some BMP characters — a silent oracle divergence waiting on
    * the first emoji id.
    *
    * PRECONDITION: well-formed UTF-16. On a LONE surrogate (ill-formed
    * input that cannot come from decoding valid UTF-8 — parquet/JSON
    * strings are safe, but a JVM caller can synthesize one) this
    * ordering compares the raw surrogate value (0xD800-0xDFFF), while
    * UTF8String.fromString replaces the unit with '?' (0x3F), so the
    * two orders diverge there. Spark itself cannot round-trip such a
    * string, so there is no "correct" target order to match; callers
    * feeding JVM-synthesized ids must ensure well-formedness. */
  object Utf8Ordering extends Ordering[String] {
    override def compare(a: String, b: String): Int = {
      val la = a.length
      val lb = b.length
      var i = 0
      while (i < la && i < lb) {
        val ca = a.charAt(i)
        val cb = b.charAt(i)
        if (ca != cb) {
          // unequal UTF-16 units at the first difference: code-point
          // order differs from unit order only when exactly one side
          // is a high surrogate (its code point is >= 0x10000)
          val cpa = a.codePointAt(i)
          val cpb = b.codePointAt(i)
          return Integer.compare(cpa, cpb)
        }
        i += 1
      }
      Integer.compare(la, lb)
    }
  }

  /** Generic-id variant: `I` is the id column's external type (Long,
    * String, …). String ids compare with [[Utf8Ordering]] — Spark's
    * UTF8String binary order for all inputs, non-BMP included (the
    * natural String ordering the caller's implicit would supply
    * diverges on surrogate pairs, so it is swapped out here). */
  def topKPerGroupAs[I: Ordering: TypeTag](
      df: DataFrame, groupCols: Seq[String], scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    implicit val bufEnc: Encoder[Seq[Entry[I]]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry[I]]]()
    val ord0 = implicitly[Ordering[I]]
    val ord =
      if (ord0 eq Ordering.String) Utf8Ordering.asInstanceOf[Ordering[I]]
      else ord0
    val agg = udaf(new TopKAgg[I](k)(ord, bufEnc))
    val kept = df
      .groupBy(groupCols.map(col): _*)
      .agg(agg(coalesce(col(scoreCol), lit(0L)), col(scoreCol).isNull,
        col(idCol)).as("__top"))
    // namespaced generator aliases: posexplode's default `pos`/`col`
    // output names would collide with a group column of the same name
    kept
      .select(groupCols.map(col) :+
        posexplode(col("__top")).as(Seq("__pos", "__e")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("__pos") + 1).cast("long").as("rank"),
        col("__e.id").as(idCol),
        when(col("__e.noScore"), lit(null).cast("long"))
          .otherwise(col("__e.score")).as(scoreCol)): _*)
  }
}
