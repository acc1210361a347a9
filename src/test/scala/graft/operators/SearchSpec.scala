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

  test("bm25TopKMaxScore equals the exact path at every champion size") {
    // deterministic skewed corpus: common terms appear in most docs
    // (champion prefix ≪ df → certificate genuinely needed), rare
    // terms in few (whole list in champions → c_t = 0)
    val vocab = Seq("the", "of", "apple", "banana", "cherry", "durian",
      "elderberry", "fig", "grape", "honeydew", "kiwi", "lemon")
    val corpus = (1L to 200L).map { i =>
      val words = vocab.zipWithIndex.collect {
        case (wd, j) if i % (j + 2) == 0 =>
          Seq.fill((i % 3).toInt + 1)(wd)
      }.flatten
      (i, if (words.isEmpty) "lonely" else words.mkString(" "))
    }.toDF("doc_id", "text")
    val qs = (1L to 20L)
      .map(q => (q, s"${vocab((q % 12).toInt)} ${vocab(((q * 5) % 12).toInt)}"))
      .toDF("qid", "qtext")
    val exact = Search.bm25TopK(corpus, "doc_id", "text", qs, "qid",
      "qtext", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    // m = 5 (minimum, mostly fallback), 16 (mixed), 200 (all proven:
    // every posting list fits its champion prefix)
    for (m <- Seq(5, 16, 200)) {
      val pruned = Search.bm25TopKMaxScore(corpus, "doc_id", "text", qs,
        "qid", "qtext", k = 5, m = m)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(pruned == exact, s"max-score diverged from exact at m=$m")
    }
  }

  test("bm25MaxScoreCertificates: full champion coverage certifies; shallow prefixes don't lie") {
    val vocab = Seq("the", "of", "apple", "banana", "cherry", "durian",
      "elderberry", "fig", "grape", "honeydew", "kiwi", "lemon")
    val corpus = (1L to 200L).map { i =>
      val words = vocab.zipWithIndex.collect {
        case (wd, j) if i % (j + 2) == 0 =>
          Seq.fill((i % 3).toInt + 1)(wd)
      }.flatten
      (i, if (words.isEmpty) "lonely" else words.mkString(" "))
    }.toDF("doc_id", "text")
    val qs = (1L to 20L)
      .map(q => (q, s"${vocab((q % 12).toInt)} ${vocab(((q * 5) % 12).toInt)}"))
      .toDF("qid", "qtext")
    // m=200 ≥ every df: all posting lists sit inside their champion
    // prefix, every c_t is 0, so every query with a full top-k
    // certifies — the diagnostic must say so
    val full = Search.bm25MaxScoreCertificates(corpus, "doc_id", "text",
      qs, "qid", "qtext", k = 5, m = 200)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(full.size == 20)
    assert(full.values.count(identity) >= 15,
      s"only ${full.values.count(identity)}/20 certified at full coverage")
    // at the minimum prefix most queries must NOT certify (broad terms
    // have deep postings; the bound is honest) — and the ranking path
    // already proved result-equality at m=5 above, so uncertified
    // means fallback, never wrong answers
    val shallow = Search.bm25MaxScoreCertificates(corpus, "doc_id",
      "text", qs, "qid", "qtext", k = 5, m = 5)
      .collect().map(r => r.getBoolean(1))
    assert(shallow.count(identity) < 20)
  }

  test("indexed variants over a shared snapshot equal the direct paths") {
    val q = Seq((100L, "apple durian"), (101L, "fig grape")).toDF("qid", "qtext")
    val snap = Search.tfSnapshot(docs, "doc_id", "text").localCheckpoint(true)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    val exact = rows(Search.bm25TopK(docs, "doc_id", "text", q, "qid",
      "qtext", k = 4))
    assert(rows(Search.bm25TopKIndexed(snap, q, "qid", "qtext", k = 4))
      == exact)
    assert(rows(Search.bm25TopKMaxScoreIndexed(snap, q, "qid", "qtext",
      k = 4, m = 4)) == exact)
    // the caller-owned snapshot must survive the indexed calls' seals
    // (only operator-owned barriers are freed) — a second use works
    assert(rows(Search.bm25TopKIndexed(snap, q, "qid", "qtext", k = 4))
      == exact)
  }

  test("bm25TopKMaxScore rejects champion prefixes smaller than k") {
    val q = Seq((100L, "apple")).toDF("qid", "qtext")
    intercept[IllegalArgumentException] {
      Search.bm25TopKMaxScore(docs, "doc_id", "text", q, "qid", "qtext",
        k = 4, m = 2)
    }
  }

  test("bm25TopK dfCap drops stop terms from probe and scoring") {
    // "apple" appears in 3 of 4 docs; cap at 2 removes it entirely
    val q = Seq((100L, "apple")).toDF("qid", "qtext")
    val r = Search.bm25TopK(docs, "doc_id", "text", q, "qid", "qtext",
      k = 4, dfCap = 2)
    assert(r.count() == 0L)
  }

  test("mergeTfSnapshots: disjoint era partials equal the full " +
    "snapshot; overlap trips the validator") {
    val full = Search.tfSnapshot(docs, "doc_id", "text")
    val merged = Search.mergeTfSnapshots(Seq(
      Search.tfSnapshot(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text"),
      Search.tfSnapshot(docs.filter(col("doc_id") % 2 =!= 0),
        "doc_id", "text")))
    // row-for-row the full snapshot (per-doc independence)
    assert(merged.collect().map(_.toSeq).toSet ==
      full.collect().map(_.toSeq).toSet)
    Search.validateTfSnapshot(merged) // must not throw
    // a re-crawled doc landing in BOTH batches duplicates its marker
    val overlap = Search.mergeTfSnapshots(Seq(full,
      Search.tfSnapshot(docs.filter(col("doc_id") === 1L),
        "doc_id", "text")))
    intercept[IllegalArgumentException] {
      Search.validateTfSnapshot(overlap)
    }
    // an EMPTY snapshot (a crawl era with zero docs) is vacuously
    // well-formed — 0 markers for 0 docs, not an NPE
    Search.validateTfSnapshot(
      Search.tfSnapshot(docs.filter(col("doc_id") < 0L),
        "doc_id", "text"))
  }
}
