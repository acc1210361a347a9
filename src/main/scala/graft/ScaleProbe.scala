package graft

import org.apache.spark.sql.SparkSession

/** Clone-stress micro-benchmark for the MinHash-LSH bucket cap
  * (`Dedup.minHashLshPairs(bucketCap = ...)`).
  *
  * The committed sf1 probe data (tools/make_sf1.py) carries 10-way
  * clone groups — UNDER the default cap of 64, where capped and
  * uncapped plans are identical, and where the d5 output itself is
  * legitimately ~m² per group (every clone pair really is above
  * theta). The cap's target is the m ≫ B regime (boilerplate,
  * licenses, mirrored pages at crawl scale), so this probe builds
  * that regime directly: `groups` clone groups of `m` identical docs
  * (distinct text per group) and times candidate generation + exact
  * re-score with the cap on vs off. theta = 1.01 is unreachable, so
  * the output is empty either way and the timing isolates exactly
  * the quadratic path the cap bounds (uncapped: bands·m²/2 join rows
  * per group; capped: bands·B²/2).
  *
  * Usage: `sbt "runMain graft.ScaleProbe [groups] [m]"` (defaults
  * 4 and 500). Prints one JSON line with both wall times.
  *
  * `runMain graft.ScaleProbe semdedup [m]` probes the analogous
  * [[graft.operators.Dedup.semDedup]] clusterCap instead: m vectors in
  * ONE tight direction cluster (the k-means quantizer's worst case —
  * a cluster it failed to split), theta unreachable so the timing
  * isolates the within-cluster pairwise path (uncapped: m²/2 cosine
  * pairs; capped at B: m·B).
  *
  * `runMain graft.ScaleProbe prefix [n] [n2]` times
  * [[graft.operators.Dedup.prefixJaccardPairs]] against
  * [[graft.operators.Dedup.jaccardPairs]] (both at their lossless
  * defaults) on the regime the prefix filter targets: n docs all
  * sharing one boilerplate sentence plus a unique tail, θ = 0.7 so no
  * pair qualifies. Full inverted-index blocking pairs all n docs
  * through the hot shingles — n(n−1)/2 candidates into the
  * aggregation — while rarest-first prefixes exclude the hot shingles
  * from every prefix, generating ~0 candidates. Run at two sizes
  * (default 2000 and 4000) so the output shows the scaling exponent,
  * not just one ratio: full blocking should ~4× when n doubles,
  * prefix should stay ~flat. This is the "crossover" artifact the
  * prefixJaccardPairs scaladoc cites — at fixture scale the two extra
  * prep shuffles make d42 SLOWER than d4 (BENCH_r09 shows that);
  * here the candidate join dominates and the order reverses.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit =
    if (args.headOption.contains("semdedup"))
      semDedupProbe(args.drop(1).headOption.map(_.toInt).getOrElse(4000))
    else if (args.headOption.contains("prefix"))
      prefixProbe(args.drop(1).headOption.map(_.toInt).getOrElse(2000),
        args.drop(2).headOption.map(_.toInt).getOrElse(4000))
    else if (args.headOption.contains("semdecon"))
      semDeconProbe(args.drop(1).headOption.map(_.toInt).getOrElse(20000),
        args.drop(2).headOption.map(_.toInt).getOrElse(512))
    else if (args.headOption.contains("maxscore"))
      maxScoreProbe(args.drop(1).headOption.map(_.toInt).getOrElse(20000),
        args.drop(2).headOption.map(_.toInt).getOrElse(128))
    else if (args.headOption.contains("ivfpq"))
      ivfPqProbe(args.drop(1).headOption.map(_.toInt).getOrElse(20000),
        args.drop(2).headOption.map(_.toInt).getOrElse(64))
    else if (args.headOption.contains("recall"))
      recallSweepProbe(args.drop(1).headOption.map(_.toInt).getOrElse(20000),
        args.drop(2).headOption.map(_.toInt).getOrElse(64))
    else lshProbe(args)

  /** The recall@10 × marginal-cost FRONTIER over nprobe ∈ {1,2,4,8}
    * for one persisted [[graft.operators.Quantization.ivfPqIndex]] —
    * the number an operator of this engine actually tunes by: how
    * much recall each extra probed cell buys, and what it costs per
    * query at the margin. The corpus is a LOW-INTRINSIC-DIMENSION
    * manifold (64-dim vectors spanned by a 4-dim latent + small
    * ambient noise — the shape real embedding spaces have, and the
    * regime quantizers exist for): cell boundaries cut through the
    * latent space, so a query near a boundary has true neighbors in
    * ADJACENT cells and each extra probe recovers a measurable
    * recall slice. The two degenerate fixtures bracket it — a
    * cluster-aligned corpus is flat-high in nprobe (home cell holds
    * every neighbor) and a full-rank uniform cloud is flat-LOW (the
    * PQ ceiling dominates); both were measured while cutting this
    * probe, and neither exposes the knob. Recall is measured by
    * [[graft.operators.Similarity.annRecallAtK]] against the exact
    * L2 baseline on the same integer-micro metric, and marginal cost
    * uses the ivfpq probe's difference-quotient discipline ((t₈−t₁)/
    * (7·nq)) so the index build — shared, train-once — cancels out.
    * The index is built ONCE and every nprobe probes the same codes
    * table, exactly the serving topology. */
  private def recallSweepProbe(n: Int, nq: Int): Unit = {
    // the difference quotient assumes search(8*nq) really runs 8x the
    // queries — the vec_id < q filter clamps at n, which would
    // silently understate marginal_ms in the emitted artifact
    require(8L * nq <= n,
      s"need 8*nq <= n for the difference quotient: n=$n nq=$nq")
    val spark = session()
    import spark.implicits._
    import org.apache.spark.sql.functions.{avg, col}
    import graft.operators.{Quantization, Similarity}
    val rnd = new scala.util.Random(7L)
    val basis = Array.fill(4)(Array.fill(64)(rnd.nextFloat() - 0.5f))
    val corpus = (0 until n).map { i =>
      val z = Array.fill(4)(rnd.nextFloat())
      val v = Array.tabulate(64)(j =>
        (0 until 4).map(k => z(k) * basis(k)(j)).sum
          + 0.02f * (rnd.nextFloat() - 0.5f))
      (i.toLong, v)
    }.toDF("vec_id", "embedding").localCheckpoint(true)
    val idx = Quantization.ivfPqIndex(corpus, "vec_id", "embedding",
      nlist = 64, coarseIters = 2, m = 16, ksub = 64, pqIters = 2)
    def queries(q: Int) = corpus.filter(col("vec_id") < q)
    val exact = Similarity.bruteForceTopKL2(corpus, "vec_id",
        "embedding", k = 10, queryFilter = col("id") < nq)
      .localCheckpoint(true)
    def time(body: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      body.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val rows = Seq(1, 2, 4, 8).map { nprobe =>
      def search(q: Int) = Quantization.ivfPqSearch(queries(q),
        "vec_id", "embedding", idx, nprobe, topK = 10)
      time(search(nq)) // codegen warm-up per plan shape
      // min of two difference quotients — a single GC pause on one
      // run otherwise lands in the artifact as a fake cost spike
      val marginalMs = Seq.fill(2) {
        val t1 = time(search(nq))
        val t8 = time(search(8 * nq))
        (t8 - t1) / (7 * nq) * 1e3
      }.min
      val recall = Similarity.annRecallAtK(search(nq), exact, k = 10)
        .agg(avg("recall")).collect()(0).getDouble(0)
      s"""{"nprobe":$nprobe,"recall_at_10":${f(recall)},"marginal_ms":${f(marginalMs)}}"""
    }
    // the IVFADC-R refine at the frontier's knee: exact rescore of the
    // ADC top-R — the lever that buys back the PQ ceiling (more
    // probes cannot; the sweep above shows recall flat past the knee)
    val rescoreRows = Seq(20, 40).map { topR =>
      def search(q: Int) = Quantization.ivfPqSearchRescore(queries(q),
        "vec_id", "embedding", idx, corpus, "vec_id", "embedding",
        nprobe = 2, topR = topR, topK = 10)
      time(search(nq)) // codegen warm-up per plan shape
      val marginalMs = Seq.fill(2) {
        val t1 = time(search(nq))
        val t8 = time(search(8 * nq))
        (t8 - t1) / (7 * nq) * 1e3
      }.min
      val recall = Similarity.annRecallAtK(search(nq), exact, k = 10)
        .agg(avg("recall")).collect()(0).getDouble(0)
      s"""{"mode":"rescore","nprobe":2,"topR":$topR,"recall_at_10":${f(recall)},"marginal_ms":${f(marginalMs)}}"""
    }
    println(s"""{"metric":"ivfpq_recall_cost_frontier","unit":"recall x ms/query","n":$n,"nq":$nq,"nlist":64,"sweep":[${(rows ++ rescoreRows).mkString(",")}]}""")
    spark.stop()
  }

  /** IVF pruning vs the full ADC scan on a FIXED corpus, measured as
    * MARGINAL per-query cost: each path runs at `nq` and 8·nq queries
    * and the difference quotient (t₈ − t₁)/(7·nq) isolates the
    * scoring join from the shared training cost (coarse + PQ Lloyd
    * rounds are query-count-independent; an end-to-end ratio at
    * small nq mostly measures them). [[graft.operators.Quantization
    * .pqAdcTopK]] joins every corpus code against every query's LUT —
    * marginal cost ∝ n — while [[graft.operators.Quantization
    * .ivfPqTopK]]'s cell-keyed join touches only the nprobe/nlist
    * slice (here 2/16), so the marginal ratio should sit near the
    * nlist/nprobe corpus-share bound. At a billion vectors the
    * training amortizes across every ingest batch and THIS marginal
    * cost is the steady-state number. */
  private def ivfPqProbe(n: Int, nq: Int): Unit = {
    val spark = session()
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.Quantization
    val rnd = new scala.util.Random(7L)
    val corpus = (0 until n).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat())))
      .toDF("vec_id", "embedding").localCheckpoint(true)
    def time(body: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      body.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def full(q: Int) =
      time(Quantization.pqAdcTopK(corpus, "vec_id", "embedding",
        m = 4, k = 16, iters = 2, topK = 10,
        queryFilter = col("id") < q))
    def ivf(q: Int) =
      time(Quantization.ivfPqTopK(corpus, "vec_id", "embedding",
        nlist = 16, coarseIters = 2, m = 4, ksub = 16, pqIters = 2,
        nprobe = 2, topK = 10, queryFilter = col("id") < q))
    full(nq); ivf(nq) // codegen warm-up per plan shape
    val f1 = full(nq); val f8 = full(8 * nq)
    val i1 = ivf(nq); val i8 = ivf(8 * nq)
    val mf = (f8 - f1) / (7 * nq)
    val mi = (i8 - i1) / (7 * nq)
    println(s"""{"metric":"ivfpq_prune_probe","unit":"sec","n":$n,"nq":$nq,"full_nq":${f(f1)},"full_8nq":${f(f8)},"ivf_nq":${f(i1)},"ivf_8nq":${f(i8)},"marginal_full_ms":${f(mf * 1e3)},"marginal_ivf_ms":${f(mi * 1e3)},"marginal_ratio":${f(mf / mi)}}""")
    spark.stop()
  }

  /** The regime [[graft.operators.Search.bm25TopKMaxScore]] exists
    * for — SKEWED per-term impacts, the shape of real text — measured
    * against the exact probe on the same index. The committed
    * `documents` fixture is the adversarial near-uniform-impact case
    * (d32 runs ~20-35% OVER d24 there with 0/128 certified, by
    * design: the certificate refuses unsafe pruning); this probe
    * builds the complementary corpus so a committed artifact shows
    * the certificate firing and the pruning WINNING.
    *
    * Corpus: every doc carries a unique 8×-repeated head term (rare →
    * its whole posting list fits the champion prefix, c_t = 0) plus
    * ONE occurrence of the broad term "the" — except 8 planted docs
    * where "the" repeats 10× in a short doc (the champion head).
    * "the"'s impact distribution is thus 8 big values and n−8 tiny
    * ones, so its non-champion bound c_t (the 64th-best impact) is a
    * tf=1 long-doc score ≈ the floor. Queries are "u{x} the": θ_q
    * (the unique term's big score) clears B_q = c_the by orders of
    * magnitude → certified, and the exact probe's per-query Σdf ≈ n
    * fan-out on "the" never materializes. */
  private def maxScoreProbe(n: Int, nq: Int): Unit = {
    val spark = session()
    import spark.implicits._
    val docs = (0 until n).map { i =>
      val head = (s"u$i " * 8).trim
      val the = if (i < 8) "the " * 10 else "the "
      val filler = if (i < 8) "" else (s"w${i % 97} " * 12)
      (i.toLong, s"$head $the$filler".trim)
    }.toDF("doc_id", "text").localCheckpoint(true)
    val queries = (0 until nq).map { j =>
      val x = (j.toLong * 37L) % n
      (j.toLong, s"u$x the")
    }.toDF("qid", "qtext").localCheckpoint(true)
    def time(body: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      body.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    import graft.operators.Search
    def exact() = time(Search.bm25TopK(docs, "doc_id", "text",
      queries, "qid", "qtext", k = 3))
    def pruned() = time(Search.bm25TopKMaxScore(docs, "doc_id", "text",
      queries, "qid", "qtext", k = 3, m = 64))
    exact(); pruned() // codegen warm-up per plan shape
    val te = exact()
    val tp = pruned()
    val certified = Search.bm25MaxScoreCertificates(docs, "doc_id",
        "text", queries, "qid", "qtext", k = 3, m = 64)
      .filter("certified").count()
    println(s"""{"metric":"bm25_maxscore_skewed_probe","unit":"sec","docs":$n,"queries":$nq,"certified":$certified,"exact":${f(te)},"maxscore":${f(tp)},"speedup":${f(te / tp)}}""")
    spark.stop()
  }

  /** Semantic-decontamination scaling: n then 10n corpus vectors
    * against a FIXED `benchN`-vector benchmark — the d48 contract
    * (the query's id cap is exactly what makes this the measured
    * regime). Cost is |corpus|·|bench|·d flops map-side + one
    * |corpus|-row rollup, so the 10× run should land near 10×. */
  private def semDeconProbe(n: Int, benchN: Int): Unit = {
    val spark = session()
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    def vecs(m: Int) = (0 until m).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat())))
      .toDF("vec_id", "embedding").localCheckpoint(true)
    val bench = vecs(benchN)
    def run(corpus: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      graft.operators.Similarity.semanticContamination(corpus, bench,
          "vec_id", "embedding", theta = 0.95)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val small = vecs(n)
    val big = vecs(10 * n)
    run(small) // codegen warm-up
    val ts = run(small)
    val tb = run(big)
    println(s"""{"metric":"semdecon_fixed_bench_probe","unit":"sec","bench":$benchN,"n":$n,"t_n":${f(ts)},"t_10n":${f(tb)},"ratio":${f(tb / ts)}}""")
    spark.stop()
  }

  /** Boilerplate-heavy corpus: full blocking vs prefix filtering at
    * two corpus sizes. theta = 0.7 is unreachable for distinct-tail
    * pairs, so timings isolate candidate generation + aggregation. */
  private def prefixProbe(n1: Int, n2: Int): Unit = {
    val spark = session()
    import spark.implicits._
    def corpus(n: Int) = (0 until n).map { i =>
      (i.toLong,
        "all rights reserved by the site operator terms of service apply " +
          s"to every visitor unique$i tail$i words$i here$i now$i end$i")
    }.toDF("doc_id", "text").localCheckpoint(true)
    def time(body: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      body.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def full(df: org.apache.spark.sql.DataFrame) = time(
      graft.operators.Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.7))
    def pref(df: org.apache.spark.sql.DataFrame) = time(
      graft.operators.Dedup.prefixJaccardPairs(df, "doc_id", "text", 3, 0.7))
    val small = corpus(n1)
    val big = corpus(n2)
    full(small); pref(small) // codegen warm-up per plan shape
    val fs = full(small); val ps = pref(small)
    val fb = full(big); val pb = pref(big)
    println(s"""{"metric":"prefix_vs_full_jaccard_probe","unit":"sec","n1":$n1,"n2":$n2,"full_n1":${f(fs)},"prefix_n1":${f(ps)},"full_n2":${f(fb)},"prefix_n2":${f(pb)},"full_growth":${f(fb / fs)},"prefix_growth":${f(pb / ps)}}""")
    spark.stop()
  }

  /** One degenerate k=1 cluster of m near-identical vectors: capped
    * (B = 64) vs uncapped probe-prefix timing. */
  private def semDedupProbe(m: Int): Unit = {
    val spark = session()
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val base = Array.fill(64)(rnd.nextFloat())
    val emb = (0 until m).map { i =>
      val v = base.clone()
      v(i % 64) = v(i % 64) + 0.001f * ((i / 64) % 8)
      (i.toLong, v)
    }.toDF("vec_id", "embedding").localCheckpoint(true)
    def run(cap: Int): Double = {
      val t0 = System.nanoTime()
      graft.operators.Dedup.semDedup(emb, "vec_id", "embedding",
        k = 1, iters = 2, theta = 1.01, clusterCap = cap)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(64); run(m) // codegen warm-up per plan shape
    val capped = run(64)
    val uncapped = run(m)
    println(s"""{"metric":"semdedup_cluster_cap_probe","unit":"sec","vectors":$m,"capped_64":${f(capped)},"uncapped":${f(uncapped)},"speedup":${f(uncapped / capped)}}""")
    spark.stop()
  }

  private def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)

  private def session(): SparkSession = {
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.maxFields", "1024")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def lshProbe(args: Array[String]): Unit = {
    val groups = args.headOption.map(_.toInt).getOrElse(4)
    val m = args.drop(1).headOption.map(_.toInt).getOrElse(500)
    val spark = session()
    import spark.implicits._
    val docs = (0 until groups * m).map { i =>
      val g = i / m
      (i.toLong,
        s"group $g boilerplate license text repeated verbatim across " +
          s"every mirror page of corpus segment $g with identical wording")
    }.toDF("doc_id", "text").localCheckpoint(true)
    def run(cap: Int): Double = {
      val t0 = System.nanoTime()
      graft.operators.Dedup.minHashLshPairs(docs, "doc_id", "text",
        k = 3, theta = 1.01, bucketCap = cap)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // codegen/session warm-up pass per plan shape, then the timed pair
    // (first-run compilation otherwise lands on whichever runs first)
    run(64); run(0)
    val capped = run(64)
    val uncapped = run(0)
    println(s"""{"metric":"lsh_bucket_cap_probe","unit":"sec","groups":$groups,"clones_per_group":$m,"capped_64":${f(capped)},"uncapped":${f(uncapped)},"speedup":${f(uncapped / capped)}}""")
    spark.stop()
  }
}
