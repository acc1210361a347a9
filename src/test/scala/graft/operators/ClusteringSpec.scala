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
}
