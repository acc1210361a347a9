package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index text search with BM25 ranking — the retrieval side of
  * a training-data pipeline (nearest-neighbor text lookup, quality
  * probes, eval-set mining) expressed as keyed joins over a postings
  * table. No document ever meets a non-matching query: candidate rows
  * come from the term-keyed equi-join of the query's terms with the
  * postings, the standard inverted-index probe.
  *
  * Scale shape: postings (term, doc, tf) shuffle by term once; document
  * frequencies ride the same table; scalars (N, total tokens) attach by
  * broadcast. High-df stop terms can be capped with `dfCap` (same
  * guard as [[Fuzzy.capPostings]]) — at web scale the "the"-posting is
  * the skew killer, and dropping terms above the cap is the published
  * practice. Scoring folds per-term BM25 contributions into integer
  * micro-units before summing, so group-sum order cannot perturb the
  * result (double addition is not associative; integer addition is).
  */
object Search {

  /** BM25 top-k: for each query row, the `k` best documents by summed
    * per-term BM25 score (integer micros; ties broken by doc id).
    *
    * @param docs    corpus: (idCol, textCol)
    * @param queries query set: (qidCol, qTextCol)
    * @param dfCap   drop terms appearing in more than this many docs
    *                (0 = keep all)
    * @return (qid, rank, doc_id, score_micros) */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qidCol: String, qTextCol: String,
               k: Int, k1: Double = 1.2, b: Double = 0.75,
               dfCap: Int = 0, materialize: Boolean = true): DataFrame = {
    def toks(c: org.apache.spark.sql.Column) =
      filter(split(c, "\\s+"), t => t =!= "")

    // tokenize the corpus ONCE, straight into the skinny postings
    // (doc, term, tf) — the ONLY materialized intermediate. One marker
    // row per doc (t = "", impossible as a real token: toks filters
    // empties) rides along so EVERYTHING — dl, df, and both corpus
    // scalars — derives from this single snapshot: a zero-token doc
    // has no postings (and can never be a hit) but its marker keeps it
    // in N for the idf/avgdl denominators, exactly as the oracle
    // counts it, without re-scanning the corpus (round-6 advice: the
    // previous shape read `docs` a second time for the doc count,
    // which with materialize=true could disagree with the postings
    // snapshot on a changing source).
    val tfAllBase = docs
      .select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      .unionByName(docs.select(col(idCol).as("doc_id"),
        lit("").as("t"), lit(0L).as("tf")))
    val tfAll = if (materialize) tfAllBase.localCheckpoint(true)
                else tfAllBase.cache()
    val postings = tfAll.filter(col("t") =!= "")
    // dl keeps ALL tokens (capped stop terms still lengthen their doc);
    // markers add 0, so zero-token docs appear with dl = 0, harmless
    val dl = tfAll.groupBy("doc_id").agg(sum("tf").as("dl"))
    // corpus scalars: one row, broadcast onto every posting, both out
    // of ONE aggregation over the snapshot (single scalar attach, no
    // chained one-row cross joins)
    val scal = broadcast(tfAll.agg(
      sum(when(col("t") === "", 1L).otherwise(0L)).as("n_docs"),
      sum("tf").as("n_toks")))
    // stop-term cap applies to the postings themselves: a capped term
    // neither scores nor fans out in the probe join
    val tf = Fuzzy.capPostings(postings, "t", dfCap)
    val dfT = tf.groupBy("t").agg(count(lit(1)).as("df"))

    val qTerms = queries
      .select(col(qidCol).as("qid"), explode(toks(col(qTextCol))).as("t"))
      .distinct()

    // the inverted-index probe: query terms equi-join the postings on
    // the term, never the documents
    val hits = qTerms
      .join(tf, Seq("t"))
      .join(dfT, Seq("t"))
      .join(dl, Seq("doc_id"))
      .crossJoin(scal)
    // Lucene-style BM25, every float step an IEEE-exact op mirrored in
    // the oracle: idf = ln(1 + (N - df + .5)/(df + .5)), then the tf
    // saturation with dl/avgdl where avgdl = n_toks/n_docs
    val avgdl = col("n_toks").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df") + lit(0.5))
        / (col("df") + lit(0.5)))
    val sat = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) +
        lit(b) * (col("dl").cast("double") / avgdl)))
    val scored = hits
      .withColumn("s_micros", round(idf * sat * lit(1e6)).cast("long"))
      .groupBy("qid", "doc_id")
      .agg(sum("s_micros").as("score_micros"))
    val w = Window.partitionBy("qid")
      .orderBy(col("score_micros").desc, col("doc_id"))
    val out = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "doc_id", "score_micros")
    if (!materialize) out
    else {
      // materialize the (small) top-k, then free the postings
      val ck = out.localCheckpoint(true)
      org.apache.spark.sql.graftshim.Shims.unpersistLocalCheckpoint(tfAll)
      ck
    }
  }
}
