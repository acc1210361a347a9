package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("kMeans assigns every id exactly once, clusters in [0, k)") {
    val r = Clustering.kMeans(emb, "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(x => (x.getLong(0), x.getInt(1)))
    assert(r.length == emb.count())
    assert(r.map(_._1).distinct.length == r.length)
    assert(r.forall { case (_, c) => c >= 0 && c < 4 })
    assert(r.map(_._2).distinct.length > 1, "degenerate single cluster")
  }

  test("kMeans is deterministic across runs and repartitionings") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Clustering.kMeans(df, "vec_id", "embedding", k = 4, iters = 2)
        .collect().map(x => (x.getLong(0), x.getInt(1))).toSet
    assert(run(emb) == run(emb.repartition(7)))
  }

  test("kMeans matches a driver-side Lloyd reference on seeded random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val data = (0L until 60L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f)))
    // Spark's centroid sums may fold in a different order than the
    // reference's left-to-right — a ≤1-ulp difference that survives
    // the 6-dp rounding only on an exact .5e-6 boundary, which random
    // float data does not produce
    val df = data.toDF("vec_id", "embedding")

    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(v: Array[Float], c: Array[Double]): Double = {
      var d = 0.0; var nv = 0.0; var nc = 0.0
      for (i <- v.indices) {
        d += v(i).toDouble * c(i); nv += v(i).toDouble * v(i)
        nc += c(i) * c(i)
      }
      round6(d / (math.sqrt(nv) * math.sqrt(nc)))
    }
    def assign(cents: Seq[(Int, Array[Double])]): Map[Long, Int] =
      data.map { case (id, v) =>
        id -> cents.map { case (ci, cv) => (-cos(v, cv), ci) }.min._2
      }.toMap
    val k = 3
    var cents: Seq[(Int, Array[Double])] = data.sortBy(_._1).take(k)
      .zipWithIndex.map { case ((_, v), i) => i -> v.map(_.toDouble) }
    var ref = assign(cents)
    // one recompute round (iters = 2): dim-wise mean in id order, 6 dp
    cents = ref.toSeq.groupBy(_._2).toSeq.sortBy(_._1).map { case (c, m) =>
      val members = m.map(_._1).sorted.map(id => data(id.toInt)._2)
      c -> Array.tabulate(8) { i =>
        round6(members.map(_(i).toDouble).sum / members.size)
      }
    }
    ref = assign(cents)
    val got = Clustering.kMeans(df, "vec_id", "embedding", k, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == ref)
  }

  test("reference-object assignment path matches driver-side argmax at k=100") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val dim = 8
    val data = (0L until 300L).map(i =>
      (i, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
    val df = data.toDF("vec_id", "embedding")
    val cents: Seq[(Int, Array[Double])] = (0 until 100).map(ci =>
      ci -> Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(v: Array[Float], c: Array[Double]): Double = {
      var d = 0.0; var nv = 0.0; var nc = 0.0
      for (i <- v.indices) {
        d += v(i).toDouble * c(i); nv += v(i).toDouble * v(i)
        nc += c(i) * c(i)
      }
      round6(d / (math.sqrt(nv) * math.sqrt(nc)))
    }
    val ref = data.map { case (id, v) =>
      id -> cents.map { case (ci, cv) => (-cos(v, cv), ci) }.min._2
    }.toMap
    val got = df.select(col("vec_id"),
        graft.functions.NativeExpressions
          .nearestCentroid(col("embedding"), cents).as("cluster"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == ref)
  }

  test("k=256 kMeans completes with codegen fallback disabled") {
    // above LiteralKMax the assignment must NOT be a k-wide literal
    // expression: with fallback off, a Janino failure (the literal
    // path's failure mode at large k) would throw instead of silently
    // interpreting — completing here proves constant-size codegen
    val prevWs = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = Clustering.kMeans(emb, "vec_id", "embedding", k = 256,
          iters = 2)
        .collect().map(x => (x.getLong(0), x.getInt(1)))
      assert(r.length == emb.count())
      assert(r.forall { case (_, c) => c >= 0 && c < 256 })
      assert(r.map(_._2).distinct.length > 10)
    } finally spark.conf.set("spark.sql.codegen.fallback", prevWs)
  }

  test("zero-norm vectors assign to the lowest cluster id, no NaN") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val dim = 4
    // id 0 is a zero vector AND becomes centroid 0 (k lowest ids init)
    val data = (0L until 80L).map(i =>
      (i, if (i == 0L) Array.fill(dim)(0f)
          else Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
    val df = data.toDF("vec_id", "embedding")
    for (k <- Seq(4, 70)) { // literal path and reference-object path
      val got = Clustering.kMeans(df, "vec_id", "embedding", k, iters = 2)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got.size == 80)
      assert(got(0L) == 0, s"zero vector must tie-break to cluster 0 at k=$k")
      assert(got.values.forall(c => c >= 0 && c < k))
    }
  }

  test("a Lloyd round does not worsen mean assigned similarity") {
    // mean cosine(v, centroid-of-assigned-cluster) must be monotone
    // non-decreasing in iterations — the k-means objective
    def meanSim(iters: Int): Double = {
      val a = Clustering.kMeans(emb, "vec_id", "embedding", k = 4, iters)
      val joined = emb.select(col("vec_id"), col("embedding"))
        .join(a, "vec_id")
      val cents = joined
        .select(col("cluster"), posexplode(col("embedding")).as(Seq("i", "x")))
        .groupBy("cluster", "i").agg(avg("x").as("m"))
        .groupBy("cluster")
        .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("p"))
        .select(col("cluster"),
          transform(col("p"), e => e.getField("m")).as("cv"))
      joined.join(cents, "cluster")
        .select(avg(Similarity.cosine(col("embedding"), col("cv"))).as("s"))
        .collect().head.getDouble(0)
    }
    val s1 = meanSim(1)
    val s2 = meanSim(2)
    assert(s2 >= s1 - 1e-9, s"iteration worsened objective: $s1 -> $s2")
  }

  test("kMeansWithSim: same clusters as kMeans, csim = cosine to own centroid") {
    val plain = Clustering.kMeans(emb, "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val withSim = Clustering
      .kMeansWithSim(emb, "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(withSim.map(t => t._1 -> t._2).toMap == plain)
    // csim is a 6-dp cosine: bounded, and each vector should sit closer
    // to its own centroid than a random direction — mean well above 0
    assert(withSim.forall(t => t._3 >= -1.0 - 1e-9 && t._3 <= 1.0 + 1e-9))
    val mean = withSim.map(_._3).sum / withSim.length
    assert(mean > 0.1, s"implausible mean centroid similarity $mean")
  }

  test("kMeansWithSim k>LiteralKMax rides the reference-object path") {
    // 80 rows, k = 70 > LiteralKMax: the assignment dispatches to
    // NearestCentroidExpr and csim comes from the broadcast centroid
    // join — clusters must still match kMeans exactly
    import spark.implicits._
    val rnd = new scala.util.Random(9L)
    val data = (0L until 80L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    val plain = Clustering.kMeans(data, "vec_id", "embedding", k = 70, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val withSim = Clustering
      .kMeansWithSim(data, "vec_id", "embedding", k = 70, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(withSim == plain)
  }
}
