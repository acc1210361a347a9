package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1f, 0f, 0f)),
    (1L, Array(0.9f, 0.1f, 0f)), // closest to 0
    (2L, Array(0f, 1f, 0f)),
    (3L, Array(0f, 0.9f, 0.1f)), // closest to 2
    (4L, Array(-1f, 0f, 0f)))    // opposite of 0
    .toDF("vec_id", "embedding")

  test("cosine is exact on hand-checked vectors") {
    val c = vecs.as("a").join(vecs.as("b"),
        col("a.vec_id") === 0 && col("b.vec_id") === 4)
      .select(Similarity.cosine(col("a.embedding"), col("b.embedding")))
      .collect().head.getDouble(0)
    assert(math.abs(c - (-1.0)) < 1e-12)
  }

  test("semanticContamination flags by max cosine with sentinel") {
    val corpus = Seq(
      (10L, Array(1f, 0f, 0f)),   // equals a bench vector → cos 1
      (11L, Array(0f, 0f, 1f)),   // orthogonal to both → cos 0
      (12L, Array(0f, 0f, 0f)))   // zero norm → sentinel
      .toDF("vec_id", "embedding")
    val bench = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.semanticContamination(corpus, bench,
        "vec_id", "embedding", theta = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2))))
      .toMap
    assert(got(10L) == ((1.0, 1)))
    assert(got(11L) == ((0.0, 0)))
    assert(got(12L) == ((-2.0, 0)))
  }

  test("semanticContamination on an EMPTY bench keeps every corpus row") {
    // an empty benchmark must be visible (max_cos null, contaminated 0)
    // rather than row-erasing — a caller inner-joining the flags back
    // would otherwise silently drop the whole corpus
    val corpus = Seq(
      (10L, Array(1f, 0f, 0f)),
      (11L, Array(0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    val bench = corpus.filter(col("vec_id") < 0)
    val got = Similarity.semanticContamination(corpus, bench,
        "vec_id", "embedding", theta = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.isNullAt(1), r.getInt(2))))
      .toMap
    assert(got == Map(10L -> ((true, 0)), 11L -> ((true, 0))))
  }

  test("bruteForceTopKL2 ranks by squared distance; annRecallAtK counts") {
    // L2 ground truth from vec 0: dist² to 1 = .01+.01 = .02, to 2 = 2,
    // to 3 = 1+.81+.01 = 1.82, to 4 = 4
    val exact = Similarity.bruteForceTopKL2(vecs, "vec_id", "embedding",
        k = 3, queryFilter = col("id") === 0L)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(exact.map(_._2).toSeq == Seq(1L, 3L, 2L))
    assert(exact.head._3 == 20000L) // 0.02 in micros, exactly
    // a fake approximate ranking that found 2 of the true top-3 for
    // query 0 and nothing for query 2
    val approx = Seq((0L, 1L), (0L, 2L), (0L, 4L)).toDF("qid", "nid")
    val truth = Seq((0L, 1L), (0L, 3L), (0L, 2L), (2L, 3L), (2L, 1L),
      (2L, 0L)).toDF("qid", "nid")
    val rec = Similarity.annRecallAtK(approx, truth, k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(rec(0L) == ((2L, 0.666667)))
    assert(rec(2L) == ((0L, 0.0)), "missed queries surface with recall 0")
  }

  test("bruteForceTopK ranks by cosine with id tie-break") {
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      k = 2, queryFilter = col("vec_id") === 0).collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(top.head == (1, 1L)) // rank 1 → vec 1
    assert(top.length == 2)
  }

  test("lshTopK achieves full recall on same-bucket neighbors") {
    // nbits=1 → bucket by sign of dim 1: {0,1} vs {4} vs {2,3} buckets
    val r = Similarity.lshTopK(vecs, "vec_id", "embedding", k = 1,
      nbits = 1, queryFilter = col("id") === 0).collect()
    assert(r.length == 1 && r.head.getLong(2) == 1L)
  }

  test("lshTopK recall vs brute force on real embeddings (sf0.001)") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 3,
      col("vec_id") % 20 === 0).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", 3, 4,
      col("id") % 20 === 0).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    // bucketing trades recall for scale: expect a sane overlap
    val recall = (bf & lsh).size.toDouble / bf.size
    assert(recall > 0.2, s"recall $recall suspiciously low")
    // Hamming-2 probing strictly widens the candidate ball → recall is
    // monotone in probe depth (the d10 near-dup query relies on this)
    val lsh2 = Similarity.lshTopK(emb, "vec_id", "embedding", 3, 4,
      col("id") % 20 === 0, maxHamming = 2).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall2 = (bf & lsh2).size.toDouble / bf.size
    assert(recall2 >= recall, s"depth-2 recall $recall2 below depth-1")
  }

  test("lshTopK == bruteForceTopK on planted dim-0 clones (d10 shape)") {
    // a clone differs from its source only in dimension 0; sign buckets
    // hash the leading dims, so clone/source buckets differ in at most
    // bit 0 and Hamming-1 probing visits the source's bucket WITH
    // CERTAINTY — the d10 oracle depends on this structural recall
    val base = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val clones = base.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, lit(0.0f)).otherwise(x)).as("embedding"))
    val aug = base.unionByName(clones)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("cos") >= 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .toSet
    val bf = rows(Similarity.bruteForceTopK(aug, "vec_id", "embedding",
      k = 1, queryFilter = col("id") >= 1000000L))
    val lsh = rows(Similarity.lshTopK(aug, "vec_id", "embedding",
      k = 1, nbits = 8, queryFilter = col("id") >= 1000000L))
    assert(bf.nonEmpty, "planted clones produced no >=0.95 matches")
    assert(lsh == bf, s"lsh result diverged: ${lsh.diff(bf)} vs ${bf.diff(lsh)}")
    // the d10 query probes at depth 2 (slack for natural neighbors) —
    // must agree with brute force there too
    val lsh2 = rows(Similarity.lshTopK(aug, "vec_id", "embedding",
      k = 1, nbits = 8, queryFilter = col("id") >= 1000000L,
      maxHamming = 2))
    assert(lsh2 == bf, s"depth-2 lsh diverged: ${lsh2.diff(bf)}")
  }

  test("rademacherPlanes is seed-deterministic and balanced") {
    val a = Similarity.rademacherPlanes(8, 64, 42L)
    val b = Similarity.rademacherPlanes(8, 64, 42L)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.length == 8 && a.forall(_.length == 64))
    assert(a.flatten.forall(v => v == 1f || v == -1f))
    // a degenerate all-same-sign plane would make its bit constant —
    // with 64 fair coin flips per plane that's a 2^-63 event; assert
    // each plane mixes signs so the bucket genuinely uses all 8 bits
    assert(a.forall(h => h.exists(_ > 0) && h.exists(_ < 0)))
  }

  test("lshTopK with Rademacher planes: recall vs brute force (d8 shape)") {
    // nbits=4 like the axis-aligned recall test above: at sf0.001 the
    // corpus is ~50 vectors, so 8 balanced bits (256 buckets) would
    // shred it into singletons — bucket count must track corpus size
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 3,
      col("vec_id") % 10 === 0).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val planes = Similarity.rademacherPlanes(4, 64, 42L)
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", 3, 4,
      col("id") % 10 === 0, planes = planes).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (bf & lsh).size.toDouble / bf.size
    assert(recall > 0.2, s"recall $recall suspiciously low")
  }

  test("ivfTopK returns k ranked neighbors per query") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val r = Similarity.ivfTopK(emb, "vec_id", "embedding", "label", 3, 2,
      col("id") % 50 === 0).collect()
    val qs = r.map(_.getLong(0)).distinct
    assert(qs.nonEmpty)
    qs.foreach { q =>
      val ranks = r.filter(_.getLong(0) == q).map(_.getInt(1)).sorted
      assert(ranks.toSeq == Seq(1, 2, 3))
    }
  }
}
