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
  */
object ScaleProbe {
  def main(args: Array[String]): Unit =
    if (args.headOption.contains("semdedup"))
      semDedupProbe(args.drop(1).headOption.map(_.toInt).getOrElse(4000))
    else lshProbe(args)

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
