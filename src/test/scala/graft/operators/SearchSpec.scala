package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana cherry"),
    (2L, "apple apple banana"),
    (3L, "durian elderberry fig"),
    (4L, "apple banana cherry durian elderberry fig grape"))
    .toDF("doc_id", "text")

  test("bm25TopK ranks exact term matches by idf-weighted tf") {
    val q = Seq((100L, "durian")).toDF("qid", "qtext")
    val r = Search.bm25TopK(docs, "doc_id", "text", q, "qid", "qtext", k = 3)
      .collect().map(x => (x.getInt(1), x.getLong(2)))
    // only docs 3 and 4 contain "durian"; doc 3 is shorter → higher
    // bm25 length normalization → rank 1
    assert(r.toSeq == Seq((1, 3L), (2, 4L)))
  }

  test("bm25TopK: multi-term queries sum per-term contributions") {
    val q = Seq((100L, "apple durian")).toDF("qid", "qtext")
    val r = Search.bm25TopK(docs, "doc_id", "text", q, "qid", "qtext", k = 4)
      .collect().map(x => x.getLong(2))
    assert(r.length == 4) // every doc matches at least one term
    // doc 4 matches both terms — it must beat the apple-only docs
    val pos = r.indexOf(4L)
    assert(pos >= 0 && pos < 2, s"doc 4 ranked ${pos + 1}")
  }

  test("bm25TopK dfCap drops stop terms from probe and scoring") {
    // "apple" appears in 3 of 4 docs; cap at 2 removes it entirely
    val q = Seq((100L, "apple")).toDF("qid", "qtext")
    val r = Search.bm25TopK(docs, "doc_id", "text", q, "qid", "qtext",
      k = 4, dfCap = 2)
    assert(r.count() == 0L)
  }
}
