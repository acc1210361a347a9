package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exactness baseline (O(Q·N·d), fine
  * when the query side is small or broadcastable); the bucketed variants
  * (sign-LSH, IVF) are the 100 TB path: candidates shuffle by bucket id
  * so no worker ever sees the full cross product.
  *
  * All arithmetic is in double with left-to-right `aggregate` folds, so
  * scores are bit-deterministic across partitionings and engines.
  */
object Similarity {

  /** Deterministic left-to-right dot product of two float-array columns
    * in double precision — a codegen'd native expression; the HOF
    * formulation (`aggregate(zip_with(...))`) computes the identical
    * value but interprets per element (see
    * [[graft.functions.DotProductExpr]]). */
  def dot(a: Column, b: Column): Column =
    graft.functions.NativeExpressions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors by cosine for the query rows (`queryFilter`
    * selects the probe side). Scores rounded to 6 dp before ranking with
    * an id tie-break → deterministic selection.
    *
    * Scale contract: the probe side must be small — it is broadcast, so
    * the plan is a single map-side pass over the corpus (O(|Q|·N·d)
    * flops, no shuffle of the corpus vectors). For corpus×corpus
    * near-dup use the bucketed [[lshTopK]]/[[ivfTopK]] paths. */
  /** Exact L2 brute-force top-k in integer micros — the ground-truth
    * baseline approximate-ANN recall is measured against (same metric
    * and rounding as [[Quantization.ivfPqTopK]]'s ADC scores, so the
    * two rankings are directly comparable). dist² decomposes as
    * |q|² + |v|² − 2·q·v with the per-vector squared norms computed
    * once outside the |Q|×|N| pair join.
    *
    * @return (qid, rank, nid, dist_micros), ascending distance with
    *         ascending-nid tie-break, self-pairs excluded. */
  def bruteForceTopKL2(emb: DataFrame, idCol: String, vecCol: String,
                       k: Int, queryFilter: Column): DataFrame = {
    val withN = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      dot(col(vecCol), col(vecCol)).as("sq"))
    val q = withN.filter(queryFilter)
      .select(col("id").as("qid"), col("v").as("qv"), col("sq").as("qq"))
    val c = withN.select(col("id").as("nid"), col("v").as("nv"),
      col("sq").as("nn"))
    val scored = broadcast(q).join(c, col("qid") =!= col("nid"))
      .withColumn("dist_micros",
        round((col("qq") + col("nn")
          - lit(2d) * dot(col("qv"), col("nv"))) * 1e6).cast("long"))
    val w = Window.partitionBy("qid")
      .orderBy(col("dist_micros").asc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "dist_micros")
  }

  /** Recall@k of an approximate (qid, nid) ranking against the exact
    * one — THE tuning metric for every ANN knob (nprobe, m, champion
    * depth): per query, how many of the true top-k the approximate
    * path found. One (qid, nid)-keyed join plus a per-query rollup;
    * queries the approximate path missed entirely surface with
    * recall 0 rather than vanishing.
    *
    * @return (qid, n_hits, recall) over every query in `exact`. */
  def annRecallAtK(approx: DataFrame, exact: DataFrame,
                   k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val hits = approx.select("qid", "nid")
      .join(exact.select("qid", "nid"), Seq("qid", "nid"))
      .groupBy("qid").agg(count(lit(1)).as("n_hits"))
    exact.select("qid").distinct()
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("recall", round(col("n_hits") / lit(k.toDouble), 6))
  }

  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     k: Int, queryFilter: Column): DataFrame = {
    // precompute norms once per vector — computing them inside the pair
    // join would triple the flops on the |Q|×|N| hot path
    val withN = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nrm"))
    val q = withN.filter(queryFilter)
      .select(col("id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val c = withN.select(col("id").as("nid"), col("v").as("nv"),
      col("nrm").as("nn"))
    val scored = broadcast(q).join(c, col("qid") =!= col("nid"))
      .withColumn("cos",
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cos")
  }

  /** Sign-LSH bucket id: concatenated sign bits of `nbits` leading
    * dimensions (a fixed axis-aligned projection — deterministic,
    * data-independent, shuffle key for bucketed ANN).
    *
    * When to use which projection: axis-aligned buckets carry a
    * structural guarantee for axis-sparse perturbations — a vector that
    * differs from another ONLY in dimension j can flip ONLY bit j (the
    * d10 near-dup query's total-recall argument rests on this). For
    * generic embeddings, prefer [[rademacherPlanes]] +
    * [[planeBucket]]: real embedding dims are correlated, so leading
    * dims give unbalanced buckets → skewed shuffle keys at scale;
    * every Rademacher plane mixes all dimensions, which balances
    * bucket occupancy while staying seeded-deterministic. */
  def signBucket(vec: Column, nbits: Int): Column =
    (0 until nbits)
      .map(i => when(element_at(vec, i + 1) >= 0f, lit(1L << i)).otherwise(0L))
      .reduce((a, b) => a.bitwiseOR(b))

  /** Seeded Rademacher (±1) hyperplane matrix, `nbits` planes × `dim`
    * entries. Data-independent and deterministic across JVMs:
    * `java.util.Random`'s LCG is specified by its Javadoc, so the same
    * seed always yields the same matrix — the DuckDB oracle for
    * `d8_ann_lsh` interpolates this exact matrix into its SQL. */
  def rademacherPlanes(nbits: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val rng = new java.util.Random(seed)
    Array.fill(nbits, dim)(if (rng.nextBoolean()) 1f else -1f)
  }

  /** Sign-LSH bucket id from explicit hyperplanes: bit i is the sign of
    * `dot(vec, planes(i))`. Each projection is a codegen'd
    * [[graft.functions.DotProductExpr]] against a literal array — one
    * map-side pass, no shuffle, no UDF. */
  def planeBucket(vec: Column, planes: Array[Array[Float]]): Column =
    planes.zipWithIndex
      .map { case (h, i) =>
        when(dot(vec, lit(h)) >= lit(0d), lit(1L << i)).otherwise(0L)
      }
      .reduce((a, b) => a.bitwiseOR(b))

  /** Bucketed ANN: exact cosine top-k over sign-LSH buckets with
    * multi-probe — each query also probes every bucket within
    * `maxHamming` sign-bit flips, the standard recall recovery for LSH
    * (1+nbits candidates-balls at distance 1; +C(nbits,2) at distance
    * 2). Still no cross product: candidates shuffle by bucket id.
    * Recall is measured against [[bruteForceTopK]] in tests.
    *
    * Probe depth vs miss rate: a pair at cosine θ disagrees on each
    * sign bit with probability acos(θ)/π, so the expected disagreement
    * at θ=0.95 over 8 bits is ~0.8 bits — Hamming-1 probing misses
    * ~19% of θ=0.95 pairs (≥2 flipped bits) while Hamming-2 misses
    * ~4%; at θ≈0.999 the rates are ~0.5% and ~0.01%. High-threshold
    * near-dup passes should probe at depth 2.
    *
    * `planes`: optional explicit hyperplane matrix (see
    * [[rademacherPlanes]]). Empty → the axis-aligned [[signBucket]]
    * (kept for axis-sparse perturbation workloads and the d10
    * structural-recall argument); non-empty → balanced seeded random
    * projections, the right default for real embeddings. */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
              k: Int, nbits: Int, queryFilter: Column,
              maxHamming: Int = 1,
              planes: Array[Array[Float]] = Array.empty): DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 2,
      s"maxHamming must be 1 or 2 (got $maxHamming): depth-1 probes are " +
        "always included, and depth >2 is not generated")
    require(planes.isEmpty || planes.length == nbits,
      s"planes.length ${planes.length} must equal nbits $nbits")
    val bucketExpr =
      if (planes.isEmpty) signBucket(col(vecCol), nbits)
      else planeBucket(col(vecCol), planes)
    val withB = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nrm"),
      bucketExpr.as("bucket"))
    val flips1 = (0 until nbits)
      .map(i => col("bucket").bitwiseXOR(lit(1L << i)))
    val flips2 =
      if (maxHamming < 2) Seq.empty
      else for {
        i <- 0 until nbits
        j <- (i + 1) until nbits
      } yield col("bucket").bitwiseXOR(lit((1L << i) | (1L << j)))
    val probes = array(col("bucket") +: (flips1 ++ flips2): _*)
    val q = withB.filter(queryFilter)
      .select(col("id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
        explode(probes).as("bucket"))
    val c = withB.select(col("id").as("nid"), col("v").as("nv"),
      col("nrm").as("nn"), col("bucket"))
    val scored = q.join(c, Seq("bucket")).filter(col("qid") =!= col("nid"))
      .dropDuplicates("qid", "nid")
      .withColumn("cos",
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cos")
  }

  /** IVF-style ANN: centroids from a coarse partitioner (here: an
    * existing label / `id % nlist` cell), probe the `nprobe` nearest
    * cells. Centroid table is tiny → broadcast; only cell-local pairs
    * are scored. */
  /** Embedding-level (semantic) decontamination: per corpus vector,
    * the max cosine to ANY benchmark vector, flagged at `theta` — the
    * embedding-space analogue of the n-gram decontamination operator
    * (catches paraphrased benchmark leakage that exact n-grams miss;
    * the train-test-overlap analyses of GPT-3 §4 / Llama-style data
    * work run exactly this screen).
    *
    * Scale shape follows the d18 discipline: the benchmark side
    * broadcasts (benchmarks are small by nature) and the |corpus|×|B|
    * pair cosines reduce map-side to one row per corpus vector — the
    * corpus never shuffles its vectors, only (id, max_cos) rows move.
    * Per-pair cosines round to 6 dp BEFORE the max (round is monotone,
    * so the max is the same value the oracle's round-then-MAX
    * computes); zero norms on either side score the −2.0 sentinel.
    *
    * Every corpus vector appears in the output regardless of the
    * benchmark's size: an EMPTY bench yields (id, max_cos = null,
    * contaminated = 0) rows rather than an empty frame, so a caller
    * that inner-joins the flags back (or treats row presence as
    * "screened") can never silently drop the corpus because the bench
    * load produced nothing. The join-back is skinny on both sides —
    * (id) vs (id, max_cos) — so the corpus still never shuffles its
    * vectors.
    *
    * @return one row per corpus vector: (idCol, max_cos, contaminated
    *         0/1). */
  def semanticContamination(corpus: DataFrame, bench: DataFrame,
                            idCol: String, vecCol: String,
                            theta: Double): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nrm"))
    val b = bench.select(col(vecCol).as("bv"), norm(col(vecCol)).as("bn"))
    val flags = c.crossJoin(broadcast(b))
      .withColumn("cos",
        when(col("nrm") === 0d || col("bn") === 0d, lit(-2d))
          .otherwise(round(dot(col("v"), col("bv"))
            / (col("nrm") * col("bn")), 6)))
      .groupBy("id")
      .agg(max("cos").as("max_cos"))
    c.select(col("id"))
      .join(flags, Seq("id"), "left")
      .select(col("id").as(idCol), col("max_cos"),
        coalesce((col("max_cos") >= theta).cast("int"), lit(0))
          .as("contaminated"))
  }

  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String, labelCol: String,
              k: Int, nprobe: Int, queryFilter: Column): DataFrame = {
    val d = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nrm"), col(labelCol).as("cell"))
    // centroid per cell: dimension-wise mean via posexplode + pivot-free agg
    val cent = d.select(col("cell"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("cell", "i").agg(avg("x").as("m"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("pairs"))
      .select(col("cell"), transform(col("pairs"), p => p.getField("m"))
        .as("centroid"))
    // nearest `nprobe` cells per query vector (centroids broadcast)
    val q = d.filter(queryFilter).select(col("id").as("qid"),
      col("v").as("qv"), col("nrm").as("qn"))
    val probed = q.join(broadcast(cent))
      .withColumn("cdist", round(cosine(col("qv"), col("centroid")), 6))
      .withColumn("crank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cdist").desc, col("cell"))))
      .filter(col("crank") <= nprobe)
      .select("qid", "qv", "qn", "cell")
    val scored = probed.join(d.select(col("id").as("nid"), col("v").as("nv"),
        col("nrm").as("nn"), col("cell")), Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos",
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cos")
  }
}
