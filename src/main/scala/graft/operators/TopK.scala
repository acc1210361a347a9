package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
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

  /** (score, id) pair entering the aggregation. */
  case class Entry(score: Long, id: Long)

  /** Bounded top-k aggregator: merge keeps the k best entries by
    * (score desc, id asc). */
  class TopKAgg(k: Int) extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    require(k > 0, s"k must be positive: $k")

    private def better(a: Entry, b: Entry): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    override def zero: Seq[Entry] = Vector.empty

    override def reduce(buf: Seq[Entry], e: Entry): Seq[Entry] =
      insert(buf, e)

    private def insert(buf: Seq[Entry], e: Entry): Seq[Entry] = {
      if (buf.size == k && !better(e, buf.last)) buf
      else {
        val i = buf.indexWhere(b => better(e, b)) match {
          case -1 => buf.size
          case j  => j
        }
        (buf.take(i) :+ e) ++ buf.drop(i).take(k - i - 1)
      }
    }

    override def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] =
      b.foldLeft(a)(insert)

    override def finish(r: Seq[Entry]): Seq[Entry] = r

    override def bufferEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()

    override def outputEncoder: Encoder[Seq[Entry]] = bufferEncoder
  }

  /** Per-group top-k of `df`: groups by `groupCols`, ranks by
    * (scoreCol desc, idCol asc), returns one row per kept entry:
    * groupCols ++ (rank, idCol, scoreCol). Both rank inputs must be
    * integral (cast upstream — integer ranking is what makes the
    * result engine-exact). A null score ranks below every value
    * (`desc_nulls_last`, like the window formulation) — it can still
    * surface in a group with fewer than k non-null rows, where it
    * comes back out as null. Ids must be non-null. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], scoreCol: String,
                   idCol: String, k: Int): DataFrame = {
    val agg = udaf(new TopKAgg(k))
    // the Entry encoder is non-nullable; carry null scores through the
    // aggregation as MIN_VALUE (below any real score) and restore on
    // the way out. A REAL MIN_VALUE score is indistinguishable — it
    // would round-trip to null — which no integral ranking in practice
    // produces (cents, counts, micros are all far from 2^63-1).
    val kept = df
      .groupBy(groupCols.map(col): _*)
      .agg(agg(coalesce(col(scoreCol), lit(Long.MinValue)), col(idCol))
        .as("__top"))
    kept
      .select(groupCols.map(col) :+ posexplode(col("__top")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as(idCol),
        when(col("col.score") === Long.MinValue, lit(null).cast("long"))
          .otherwise(col("col.score")).as(scoreCol)): _*)
  }
}
