package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MixingSpec extends SparkSpec {
  import spark.implicits._

  test("bucket is deterministic and in [0, 10000)") {
    val df = spark.range(0, 2000).toDF("id")
    val b1 = df.select(Mixing.bucket(col("id"))).collect().map(_.getLong(0))
    val b2 = df.select(Mixing.bucket(col("id"))).collect().map(_.getLong(0))
    assert(b1.sameElements(b2))
    assert(b1.forall(v => v >= 0 && v < 10000))
    // buckets actually spread (md5, not id order)
    assert(b1.distinct.length > 1500)
  }

  test("stratifiedSample keeps ~rate per stratum, exactly reproducibly") {
    val df = spark.range(0, 3000)
      .select(col("id"), (col("id") % 3).cast("string").as("s"))
    val out = Mixing.stratifiedSample(df, "id", "s",
      Map("0" -> 0, "1" -> 5000), defaultBp = 10000)
    val byS = out.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byS.contains("0"))           // rate 0 → nothing
    assert(byS("2") == 1000L)            // default keeps all
    assert(math.abs(byS("1") - 500L) < 100) // ~half of 1000
    // reproducible: same kept set both runs
    val again = Mixing.stratifiedSample(df, "id", "s",
      Map("0" -> 0, "1" -> 5000), defaultBp = 10000)
    assert(out.select("id").collect().map(_.getLong(0)).sorted
      .sameElements(again.select("id").collect().map(_.getLong(0)).sorted))
  }

  test("packByBudget: pre-row cumulative bins per shard") {
    val df = Seq((0L, 300L), (8L, 300L), (16L, 300L), (1L, 600L))
      .toDF("id", "n")
    val out = Mixing.packByBudget(df, "id", "n", budget = 512, shards = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    // shard 0: ids 0,8,16 with cums 0,300,600 → bins 0,0,1
    assert(out(0L) == ((0L, 0L, 0L)))
    assert(out(8L) == ((0L, 0L, 300L)))
    assert(out(16L) == ((0L, 1L, 88L))) // 600 % 512
    // shard 1: id 1 starts fresh
    assert(out(1L) == ((1L, 0L, 0L)))
  }

  test("sampleN keeps exactly nPer rows per stratum, reproducibly") {
    val df = spark.range(0, 900)
      .select(col("id"), (col("id") % 3).cast("string").as("s"))
    val out = Mixing.sampleN(df, "id", "s", nPer = 50)
    val byS = out.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS.values.forall(_ == 50L), byS)
    // a stratum smaller than nPer survives whole
    val tiny = Mixing.sampleN(df.filter(col("id") < 10), "id", "s", 50)
    assert(tiny.count() == 10L)
    // deterministic: the same ids win on a re-run
    val a = out.collect().map(_.getLong(0)).sorted
    val b = Mixing.sampleN(df, "id", "s", 50).collect()
      .map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }

  test("shuffleShards: reproducible deal, contiguous positions, seed re-deals") {
    val df = spark.range(0, 2000).toDF("id")
    val a = Mixing.shuffleShards(df, "id", seed = 7, shards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every row lands exactly once, shards within range
    assert(a.length == 2000 && a.map(_._1).distinct.length == 2000)
    assert(a.forall(t => t._2 >= 0 && t._2 < 8))
    // positions are contiguous 1..n inside each shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length))
    }
    // same seed → identical deal; different seed → a different order
    val b = Mixing.shuffleShards(df, "id", seed = 7, shards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.sortBy(_._1).sameElements(b.sortBy(_._1)))
    val c = Mixing.shuffleShards(df, "id", seed = 8, shards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(!a.sortBy(_._1).sameElements(c.sortBy(_._1)))
    // the md5 deal spreads evenly-ish: no shard holds >2x its share
    val sizes = a.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.values.forall(n => n > 125 && n < 500), sizes.toMap)
  }

  test("dsirScores matches a driver-side reference on seeded random docs") {
    val rnd = new scala.util.Random(20260813L)
    val vocabA = Vector("alpha", "beta", "gamma", "delta")
    val vocabB = Vector("omega", "sigma", "tau", "beta")
    val docs = (0L until 40L).map { i =>
      val tgt = i % 2 == 0
      val v = if (tgt) vocabA else vocabB
      (i, (1 to 1 + rnd.nextInt(10)).map(_ => v(rnd.nextInt(v.size)))
        .mkString(" "), if (tgt) "en" else "xx")
    }
    val df = spark.createDataFrame(docs).toDF("doc_id", "text", "lang")
    // reference: exact integer counts, per-term micro-rounded log ratio
    val toks = docs.map { case (id, t, l) => (id, t.split("\\s+").toSeq, l) }
    val srcCt = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val tgtCt = toks.filter(_._3 == "en").flatMap(_._2)
      .groupBy(identity).view.mapValues(_.size).toMap
    val ns = srcCt.values.sum.toLong
    val nt = tgtCt.values.sum.toLong
    val v = srcCt.size.toLong
    def round0(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val wm = srcCt.map { case (t, cs) =>
      val ct = tgtCt.getOrElse(t, 0)
      t -> round0((math.log((ct + 1.0) / (nt + v)) -
        math.log((cs + 1.0) / (ns + v))) * 1e6)
    }.toMap
    val ref = toks.map { case (id, ts, _) =>
      id -> ts.map(wm).sum
    }.toMap
    val got = Mixing.dsirScores(df, "doc_id", "text",
        org.apache.spark.sql.functions.col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // ≤1-ulp log differences can move a term weight by one micro; a
    // doc's drift is bounded by its token count
    val tokCount = toks.map(t => t._1 -> t._2.size.toLong).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (id, s) =>
      assert(math.abs(s - ref(id)) <= tokCount(id),
        s"doc $id: got $s want ${ref(id)}")
    }
  }

  test("dsirScores separates the target subcorpus from the rest") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val scored = Mixing.dsirScores(docs, "doc_id", "text",
        targetFilter = col("lang") === "en")
      .join(docs.select("doc_id", "lang"), "doc_id")
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("score_micros")))
    assert(scored.nonEmpty)
    // an importance sampler trained on the en slice must rank en docs
    // above the rest on average — not a tautology: the LM only sees
    // token frequencies, never the lang column
    val en = scored.collect { case ("en", s) => s.toDouble }
    val rest = scored.collect { case (l, s) if l != "en" => s.toDouble }
    assert(en.nonEmpty && rest.nonEmpty)
    assert(en.sum / en.length > rest.sum / rest.length)
    // scores are exact integer sums → a repartitioned rerun is
    // bit-identical
    def run(df: org.apache.spark.sql.DataFrame) =
      Mixing.dsirScores(df, "doc_id", "text",
        targetFilter = col("lang") === "en")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(run(docs) == run(docs.repartition(7)))
  }
}
