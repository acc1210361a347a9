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

    private def insert(buf: Seq[Entry[I]], e: Entry[I]): Seq[Entry[I]] = {
      if (buf.size == k && !better(e, buf.last)) buf
      else {
        val i = buf.indexWhere(b => better(e, b)) match {
          case -1 => buf.size
          case j  => j
        }
        (buf.take(i) :+ e) ++ buf.drop(i).take(k - i - 1)
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

  /** Generic-id variant: `I` is the id column's external type (Long,
    * String, …). String ids compare with Scala's natural String
    * ordering — identical to Spark's UTF8String binary order for BMP
    * text (both are code-point order there). */
  def topKPerGroupAs[I: Ordering: TypeTag](
      df: DataFrame, groupCols: Seq[String], scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    implicit val bufEnc: Encoder[Seq[Entry[I]]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry[I]]]()
    val agg = udaf(new TopKAgg[I](k))
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
