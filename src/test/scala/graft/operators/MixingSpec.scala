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

  test("weightedSampleN matches an independent replay of the Gumbel draw") {
    val rows = (0L until 500L).map(i => (i, (i % 17 + 1).toDouble))
    val df = rows.toDF("id", "w")
    val got = Mixing.weightedSampleN(df, "id", "w", n = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    // independent replay: same md5-derived uniform, same key
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Double): Double = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
      BigDecimal(math.log(w) - math.log(-math.log(u)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = rows.map { case (i, w) => (i, key(i, w)) }
      .sortBy { case (i, k) => (-k, i) }.take(20)
    assert(got.toSeq == want)
    // weight monotonicity in expectation: the kept set's mean weight
    // exceeds the corpus mean (weights 1..17, md5 keys fixed → exact)
    val meanAll = rows.map(_._2).sum / rows.size
    val meanKept = got.map { case (i, _) => rows(i.toInt)._2 }.sum / got.length
    assert(meanKept > meanAll)
  }

  test("weightedSampleN excludes non-positive weights; reruns identical") {
    val df = Seq((1L, 0.0), (2L, -3.0), (3L, 5.0), (4L, 2.0))
      .toDF("id", "w")
    val out = Mixing.weightedSampleN(df, "id", "w", n = 10)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(3L, 4L))
    val again = Mixing.weightedSampleN(df, "id", "w", n = 10)
      .collect().map(_.getLong(0)).toSet
    assert(again == out)
  }

  test("sourceAudit: blocklist, row gate, and conservation by hand") {
    val df = Seq(
      ("a", 100L), ("a", 10L), ("a", 50L),   // gate drops the 10
      ("bad", 100L), ("bad", 200L),          // blocklisted entirely
      ("c", 5L))                             // survives source, fails gate
      .toDF("src", "n")
    val got = Mixing.sourceAudit(df, "src", "n",
      blocklist = Set("bad"), rowGate = col("n") >= 20)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))).toMap
    assert(got("a") == ((3L, 160L, 2L, 150L, 0.666667)))
    assert(got("bad") == ((2L, 300L, 0L, 0L, 0.0)))
    assert(got("c") == ((1L, 5L, 0L, 0L, 0.0)))
    // audit sums back to the corpus: nothing vanishes
    assert(got.values.map(_._1).sum == 6L)
    assert(got.values.map(_._2).sum == 465L)
  }

  test("mixturePlan: saturation, deficit, and unlisted strata by hand") {
    val df = Seq.tabulate(10)(i => ("web", 100L)) ++
      Seq.tabulate(4)(i => ("code", 50L)) ++
      Seq.tabulate(2)(i => ("books", 10L))
    val plan = Mixing.mixturePlan(df.toDF("src", "n"), "src", "n",
      targets = Map("web" -> 0.4, "books" -> 0.5, "wiki" -> 0.1),
      budget = 400L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4),
          r.getLong(5), r.getLong(6))).toMap
    // web: 1000 available, desired 160 → rate 0.16, planned 160, no deficit
    assert(plan("web") == ((1000L, 0.4, 160L, 0.16, 160L, 0L)))
    // books: 20 available, desired 200 → saturates at rate 1, deficit 180
    assert(plan("books") == ((20L, 0.5, 200L, 1.0, 20L, 180L)))
    // code: unlisted → share 0, planned 0, inventory still visible
    assert(plan("code") == ((200L, 0.0, 0L, 0.0, 0L, 0L)))
    // wiki: targeted but ZERO inventory → the row still appears, with
    // its entire desired budget surfaced as deficit (the shortfall must
    // be visible, not silently redistributed)
    assert(plan("wiki") == ((0L, 0.1, 40L, 0.0, 0L, 40L)))
    assert(plan.size == 4)
  }

  test("sampleN is mergeable: per-part top-N re-ranked equals global") {
    import spark.implicits._
    val rows = (1L to 60L).map(i =>
      (i, if (i % 3 == 0) "x" else "y")).toDF("id", "st")
    def topn(df: org.apache.spark.sql.DataFrame) =
      Mixing.sampleN(df, "id", "st", nPer = 7)
    val full = topn(rows).collect().map(_.toSeq).toSet
    // arbitrary split: min-N by md5 rank is a semilattice, so merging
    // per-part top-Ns and re-ranking recovers the global answer —
    // the property the st_sample_n streaming fold relies on
    val merged = topn(
        topn(rows.filter(col("id") <= 20))
          .unionByName(topn(rows.filter(col("id") > 20))))
      .collect().map(_.toSeq).toSet
    assert(merged == full && full.nonEmpty)
  }

  test("temperatureMixture flattens shares toward uniform at alpha=0.5") {
    import spark.implicits._
    val df = Seq(("en", 900L), ("sw", 100L))
      .flatMap { case (l, n) => Seq((l, n)) }
      .toDF("lang", "toks")
    val out = Mixing.temperatureMixture(df, "lang", "toks", alpha = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val (_, pEn, qEn, bEn) = out("en")
    val (_, pSw, qSw, bSw) = out("sw")
    assert(pEn == 0.9 && pSw == 0.1)
    // temperature pulls the head down and the tail up, total stays 1
    assert(qEn < pEn && qSw > pSw)
    assert(math.abs(qEn + qSw - 1.0) < 2e-6)
    assert(bSw > 1.0 && bEn < 1.0)
    // hand numbers: sqrt(.9)=.948683, sqrt(.1)=.316228 (micros) →
    // q_en = 948683/1264911, q_sw = 316228/1264911
    assert(qEn == 0.75, s"qEn $qEn")
    assert(qSw == 0.25, s"qSw $qSw")

    // alpha = 1 is the identity temperature: q == p
    val id = Mixing.temperatureMixture(df, "lang", "toks", alpha = 1.0)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(id.values.forall { case (p, q) => p == q })
  }

  test("packSequences: hand-computed placement, stride-invariant") {
    import spark.implicits._
    // budget 10; docs (id, tokens): 1→4, 2→9, 5→0, 7→10, 9→3
    // concat stream: 1 at [0,4), 2 at [4,13), 5 empty at 13,
    // 7 at [13,23), 9 at [23,26)
    val docs = Seq((1L, 4L), (2L, 9L), (5L, 0L), (7L, 10L), (9L, 3L))
      .toDF("doc_id", "toks")
    def run(stride: Long) =
      Mixing.packSequences(docs, "doc_id", "toks", budget = 10,
          idStride = stride)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val expected = Set(
      (1L, 4L, 0L, 0L, 0L, 0L),    // [0,4) in seq 0
      (2L, 9L, 4L, 0L, 1L, 4L),    // [4,13) straddles 0→1
      (5L, 0L, 13L, 1L, 1L, 3L),   // empty doc: occupies nothing
      (7L, 10L, 13L, 1L, 2L, 3L),  // [13,23) straddles 1→2
      (9L, 3L, 23L, 2L, 2L, 3L))   // [23,26) in seq 2
    assert(run(8192) == expected)
    // the two-level scan equals the global cumsum for ANY bucketing —
    // associativity of addition, the distributed-correctness claim
    assert(run(1) == expected && run(3) == expected
      && run(1000) == expected)
  }

  test("assignSplit: total, disjoint, and growth-stable") {
    import spark.implicits._
    val ids = (0L until 500L).toDF("id")
    val ratios = Seq("train" -> 9000, "valid" -> 500, "test" -> 500)
    val full = Mixing.assignSplit(ids, "id", ratios)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // total: every doc gets exactly one split
    assert(full.size == 500 && full.values.toSet.subsetOf(
      Set("train", "valid", "test")))
    // growth-stability: assignments computed on a PREFIX of the
    // corpus agree with the full corpus — docs never migrate splits
    val prefix = Mixing.assignSplit(ids.filter(col("id") < 100), "id",
        ratios)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(prefix.forall { case (id, s) => full(id) == s })
    // ratios must account for every basis point
    intercept[IllegalArgumentException] {
      Mixing.assignSplit(ids, "id", Seq("a" -> 5000, "b" -> 4000))
    }
  }

  test("packSequences: conservation and contiguity on 200 random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (0 until 200).map(i =>
      (i * 10L + rnd.nextInt(9), rnd.nextInt(50).toLong))
    val out = Mixing.packSequences(rows.toDF("doc_id", "toks"),
        "doc_id", "toks", budget = 64, idStride = 37)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // the concat stream is gapless: doc k+1 starts where doc k ended,
    // the first doc starts at 0, and the derived fields are pure
    // functions of (start, n) — the full distributed-cumsum contract
    assert(out.head._3 == 0L)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._3 + a._2, s"gap between ${a._1} and ${b._1}")
    }
    out.foreach { case (id, n, start, s0, s1, off) =>
      assert(s0 == start / 64 && off == start % 64, s"doc $id")
      assert(s1 == (if (n == 0) s0 else (start + n - 1) / 64), s"doc $id")
    }
  }

  test("temperatureMixture keeps sub-microshare tail strata in the mix") {
    import spark.implicits._
    // regression: p^alpha was taken on p already rounded to 6 dp, so a
    // stratum with natural share < 5e-7 got q = boost = 0 — the tail
    // temperature sampling exists to up-weight was silently dropped.
    // Here xx's share is 1e-13: reported p rounds to 0, but q must be
    // positive (the 1-micro floor) and boost > 1.
    val df = Seq(("en", 10000000000000L), ("xx", 1L)).toDF("lang", "toks")
    val out = Mixing.temperatureMixture(df, "lang", "toks", alpha = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (pXx, qXx, bXx) = out("xx")
    assert(pXx == 0.0)           // reported share rounds to zero...
    assert(qXx > 0.0, s"tail stratum dropped: q = $qXx")  // ...but stays
    assert(bXx > 1.0, s"tail boost must up-weight: $bXx")
    val (_, qEn, bEn) = out("en")
    assert(qEn > 0.99 && bEn <= 1.0)

    // the second regression regime: with 5+ heads the micro
    // normalizer exceeds 1e6, so round(1 micro / qt, 6) = 0 — the
    // REPORTED q needs its own floor, not just the summed weight
    val many = (Seq.tabulate(5)(i => (s"h$i", 2000000000000L))
      :+ (("yy", 1L))).toDF("lang", "toks")
    val tail = Mixing.temperatureMixture(many, "lang", "toks",
        alpha = 0.5)
      .filter(col("lang") === "yy")
      .select("q", "boost").collect()(0)
    assert(tail.getDouble(0) > 0.0,
      s"5-strata tail q dropped: ${tail.getDouble(0)}")
    assert(tail.getDouble(1) > 1.0)
  }

  test("boostKeepRatesBp: head samples down, max keeps all, " +
    "integer cut") {
    // boosts 0.5 / 1.0 / 2.0 (in micros): the 2.0 stratum keeps
    // everything, the others scale down proportionally by exact
    // integer division — 0.5/2.0 -> 2500 bp, 1.0/2.0 -> 5000 bp
    val rates = Mixing.boostKeepRatesBp(Seq(
      "head" -> 500000L, "mid" -> 1000000L, "tail" -> 2000000L))
    assert(rates == Map("head" -> 2500, "mid" -> 5000, "tail" -> 10000))
    // truncation, not rounding: 333333/1000000 -> 3333 bp exactly
    val r2 = Mixing.boostKeepRatesBp(Seq(
      "a" -> 333333L, "b" -> 1000000L))
    assert(r2("a") == 3333 && r2("b") == 10000)
    // a zero-boost (empty) stratum keeps nothing
    assert(Mixing.boostKeepRatesBp(
      Seq("x" -> 0L, "y" -> 1L))("x") == 0)
    // but a POSITIVE boost below max/10000 floors at 1 bp instead of
    // truncating to 0 — a skewed recipe must not silently vanish a
    // living stratum (the 1-micro tail-floor discipline in bp)
    val r3 = Mixing.boostKeepRatesBp(Seq(
      "tiny" -> 3L, "huge" -> 900000000L))
    assert(r3("tiny") == 1 && r3("huge") == 10000)
    intercept[IllegalArgumentException] {
      Mixing.boostKeepRatesBp(Seq("x" -> 0L))
    }
    // duplicate stratum keys reject rather than silently dropping one
    intercept[IllegalArgumentException] {
      Mixing.boostKeepRatesBp(Seq(
        "en" -> 2000000L, "en" -> 500000L, "fr" -> 1000000L))
    }
    // micros big enough to wrap m*10000 reject rather than emitting a
    // negative (= keep-nothing) rate
    intercept[IllegalArgumentException] {
      Mixing.boostKeepRatesBp(Seq("x" -> (Long.MaxValue / 10000L + 1)))
    }
  }
}
