package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Tables => T}
import graft.operators.Dedup

/** Throwaway profiling main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.maxFields", "1024")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val k = 5; val numPerm = 256; val bands = 64; val rows = numPerm / bands
    val df = T.documents(spark, sfDir)
    // warmup read
    time("warmup count")(df.count())

    val sh = time("shingle+hash checkpoint") {
      df.select(col("doc_id").as("id"), Dedup.hashedShingles(col("text"), k).as("hs"))
        .filter(size(col("hs")) > 0)
        .localCheckpoint(true)
    }
    val permAggs = (0 until numPerm).map(i =>
      min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    val sig = time("signature groupBy") {
      sh.select(col("id"), explode(col("hs")).as("h"))
        .groupBy("id").agg(permAggs.head, permAggs.tail: _*)
        .localCheckpoint(true)
    }
    val bandCols = (0 until bands).map(b =>
      xxhash64((b * rows until (b + 1) * rows).map(i => col(s"m$i")): _*))
    val banded = sig.select(col("id"),
      posexplode(array(bandCols: _*)).as(Seq("band", "bh")))
    val cand = time("band self-join + dedup") {
      banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
            && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .dropDuplicates("id_a", "id_b")
        .localCheckpoint(true)
    }
    time("re-score + collect") {
      cand
        .join(sh.select(col("id").as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
        .join(sh.select(col("id").as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
        .withColumn("shared", size(array_intersect(col("hs_a"), col("hs_b"))))
        .withColumn("jac", round(col("shared").cast("double")
          / (size(col("hs_a")) + size(col("hs_b")) - col("shared")), 6))
        .filter(col("jac") >= 0.7)
        .select("id_a", "id_b", "jac").count()
    }
    spark.stop()
  }
}
