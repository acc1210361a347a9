package graft

/** Physical-plan audits: the properties that decide whether these
  * queries survive a 100× scale-up — broadcast joins where a side is
  * small, predicate pushdown reaching the parquet scan, column pruning
  * in ReadSchema, and no cartesian products in the near-dup pipelines.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("j1 dimension lookup is a broadcast hash join") {
    assert(plan("j1_broadcast_lookup").contains("BroadcastHashJoin"))
  }

  test("j2 enrichment chain broadcasts both dims") {
    val p = plan("j2_left_enrich")
    assert(p.sliding("BroadcastHashJoin".length)
      .count(_ == "BroadcastHashJoin") >= 2)
  }

  test("p8 prefix filter is pushed to the parquet scan") {
    val p = plan("p8_prefix_filter")
    assert(p.contains("PushedFilters") && p.contains("StartsWith"))
  }

  test("q1 scan prunes to the referenced columns only") {
    val p = plan("q1_pricing_summary")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_partkey"),
      "scan reads columns the query never touches")
    assert(readSchema.contains("l_quantity"))
  }

  test("q1 quantity filter is pushed down") {
    assert(plan("q1_pricing_summary").contains("PushedFilters: [IsNotNull(l_quantity)"))
  }

  test("s18 partition filter prunes to the matching year directory") {
    val df = SparkEntry.queries("s18_partition_prune")(spark, sf0001)
    val top = df.queryExecution.executedPlan
    val inner = top match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case o => o
    }
    val scan = inner.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metadata("PartitionFilters").contains("o_year"),
      s"no partition filter in scan:\n${scan.metadata}")
    // pruning is real, not just planned: the executed scan reads ONLY
    // the o_year=1995 directory's file(s), not all ~7 year partitions
    // (df.inputFiles would lie here — it lists pre-pruning)
    df.collect()
    val read = scan.metrics("numFiles").value
    assert(read >= 1 && read <= 2, s"scan read $read files — unpruned")
  }

  test("near-dup pipelines contain no cartesian product") {
    // d10/d8 ride the bucketed LSH path — an equi-join on the bucket
    // id — so no O(N²) nested-loop scan anywhere (round-3 verdict #4).
    // These queries don't checkpoint, so the query-level plan is the
    // real pipeline plan.
    // fz_tfidf carries a one-row broadcast nested-loop: the idf N
    // scalar attaching in-plan (the bm25 pattern; build side is a
    // single aggregate row, so each occurrence is O(rows), not
    // O(rows²)). The un-checkpointed lineage repeats that attach once
    // per consumer of the weighted postings (norms + both sides of the
    // pair join, plus AQE's restated subtree) — hence 4 textual nodes,
    // all the same single-row build. Everything else allows zero.
    val scalarAttach = Map("fz_tfidf_cosine" -> 4).withDefaultValue(0)
    Seq("fz_tf_cosine",
        "fz_tfidf_cosine", "d10_emb_neardup", "d8_ann_lsh").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
      assert(bnlj <= scalarAttach(q),
        s"$q has $bnlj nested-loop joins (allowed: ${scalarAttach(q)})")
    }
    // d4/d5's operators eagerly checkpoint their outputs (the query
    // plan ends at a LogicalRDD scan), so probe the un-materialized
    // constructions directly — same discipline as the er-waterfall test
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    Seq(
      "jaccard" -> Dedup.jaccardPairs(docs, "doc_id", "text",
        k = 5, theta = 0.3, materialize = false),
      "minhash" -> Dedup.minHashLshPairs(docs, "doc_id", "text",
        k = 5, theta = 0.7, materialize = false),
      "crossnear" -> Dedup.crossDedupNear(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 7 === 0),
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 7 =!= 0),
        "doc_id", "text", k = 5, theta = 0.5, materialize = false)
    ).foreach { case (tag, df) =>
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$tag has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$tag has a nested-loop join")
    }
    spark.sharedState.cacheManager.clearCache() // drop the lazy barriers
  }

  test("d5 bucket cap pre-trims map-side (WindowGroupLimit) and stays keyed") {
    val p = graft.operators.Dedup.minHashLshPairs(
        spark.read.parquet(s"$sf0001/documents.parquet"), "doc_id", "text",
        k = 5, theta = 0.7, bucketCap = 64, materialize = false)
      .queryExecution.executedPlan.toString
    spark.sharedState.cacheManager.clearCache() // drop the lazy barriers
    // the rank≤B filter must plan as WindowGroupLimit Partial+Final:
    // each map partition trims its buckets to B rows BEFORE the
    // exchange, so the cap's own shuffle is bucket-capped map-side —
    // without the Partial phase the full uncapped banded rows would
    // cross the wire just to be dropped after
    assert(p.contains("WindowGroupLimit"), "cap not planned as a group limit")
    assert("WindowGroupLimit.*Partial".r.findFirstIn(p).nonEmpty,
      "no map-side partial group limit before the exchange")
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"))
  }

  test("span family: no self-join, broadcast join-back, one merge exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val plan = graft.operators.Dedup
      .duplicateSpans(docs, "doc_id", "text", w = 8)
      .queryExecution.executedPlan
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty)
    assert(plan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty)
    // exactly the designed exchanges: the gram-count aggregation, the
    // (broadcast-probed) gram side feeding it, and the per-doc merge
    // window — the corpus gram stream must NOT shuffle for the join
    // itself (frequent-hash set broadcasts; AQE nodes hide inside
    // AdaptiveSparkPlan only at runtime, this is the static plan)
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.size <= 3,
      s"span pipeline grew ${exchanges.size} exchanges")
    val p = plan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "frequent-hash join-back is not broadcast in the static plan")
  }

  test("cutSpans rebuild never explodes tokens (no Generate after the join)") {
    import org.apache.spark.sql.execution.GenerateExec
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val spans = graft.operators.Dedup
      .duplicateSpans(docs, "doc_id", "text", w = 8)
    val plan = graft.operators.Dedup
      .cutSpans(docs, "doc_id", "text", spans)
      .queryExecution.executedPlan
    // the rebuild path itself is generator-free: tokens are filtered
    // by an indexed HOF inside the row, never exploded. The only
    // Generate nodes allowed are the span SOURCE's gram posexplode.
    val gens = plan.collect { case g: GenerateExec => g }
    assert(gens.size <= 2,
      s"cutSpans rebuild introduced token explosion (${gens.size} Generates)")
  }

  test("d32 max-score pipeline stays keyed (no cartesian beyond scalar attaches)") {
    import org.apache.spark.sql.functions.{col, concat_ws, slice, split}
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val qs = docs.filter(col("doc_id") % 40 === 0)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(split(col("text"), "\\s+"), 1, 6)).as("qt"))
    val plan = graft.operators.Search.bm25TopKMaxScore(docs, "doc_id",
        "text", qs, "qid", "qt", k = 5, m = 16, materialize = false)
      .queryExecution.executedPlan
    spark.sharedState.cacheManager.clearCache()
    // programmatic collect, not textual grep: the textual plan
    // restates the cached perPost subtree (holding the ONE allowed
    // one-row scalar attach) at every InMemoryTableScan site, so a
    // grep would count the same physical node a dozen times. Outside
    // that cached index, every champion/candidate/bound/fallback join
    // must be keyed — zero nested loops, zero cartesians.
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty)
    val bnlj = plan.collect { case b: BroadcastNestedLoopJoinExec => b }
    assert(bnlj.isEmpty,
      s"d32 has ${bnlj.size} nested-loop joins outside the cached index")
  }

  test("round-6 queries: keyed joins only, and the profiler scans once") {
    // the markup/shuffle/sample family must stay equi-join / scan-side
    // (none of these checkpoint — the query plan is the real plan)
    Seq("d21_markup_strip",
        "d22_shuffle_shards", "d25_sample_n", "st_attrib_join").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q has a nested-loop join")
    }
    // BM25 materializes its output, so probe the un-materialized form.
    // It attaches its two corpus scalars via crossJoin(broadcast(
    // one-row agg)) — a BroadcastNestedLoopJoin with a 1-row build side
    // is O(N·1) and the right scalar-attach shape, so exactly one is
    // allowed; the term probe itself must stay an equi-join
    import org.apache.spark.sql.functions.{col, concat_ws, slice, split}
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val qs = docs.filter(col("doc_id") % 40 === 0)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(split(col("text"), "\\s+"), 1, 6)).as("qt"))
    val bm25 = graft.operators.Search.bm25TopK(docs, "doc_id", "text",
        qs, "qid", "qt", k = 5, materialize = false)
      .queryExecution.executedPlan.toString
    assert(!bm25.contains("CartesianProduct"))
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(bm25).length
    assert(bnlj == 1, s"d24 has $bnlj nested-loop joins (1 scalar attach allowed)")
    spark.sharedState.cacheManager.clearCache() // drop the lazy barriers
    // the column profiler's one-pass claim: a single parquet scan
    // feeds the whole wide aggregate
    val scans = "Scan parquet".r.findAllIn(plan("rp_profile")).length
    assert(scans == 1, s"rp_profile reads the table $scans times")
  }

  test("round-4 step queries are all keyed joins — no nested loops") {
    Seq("pl_infer_works", "pl_infer_composers", "pl_compilations",
        "pl_releasetype").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q has a nested-loop join")
    }
  }

  test("er waterfall: fuzzy stage consumes anti-join residue only") {
    // the query materializes stage boundaries (checkpoints hide the
    // upstream plan), so probe the un-materialized form directly
    import spark.implicits._
    import graft.operators.{EntityResolution, MatchStage}
    val left = Seq((1L, "alpha beta", "alpha beta", "alpha", "beta"))
      .toDF("lid", "lname", "lkey", "ladj", "lnoun")
    val right = Seq((2L, "alpha beta", "alpha beta", "alpha", "beta"))
      .toDF("rid", "rname", "rkey", "radj", "rnoun")
    val p = EntityResolution.waterfall(left, "lid", right, "rid",
      Seq(MatchStage("exact", "lkey", "rkey"),
        MatchStage("positional", "ladj", "radj"),
        MatchStage("unique", "lnoun", "rnoun", uniqueOnly = true)),
      fuzzyNames = Some(("lname", "rname")), materialize = false)
      .queryExecution.executedPlan.toString
    // three key stages x two sides = six residue anti-joins ahead of
    // the fuzzy gram join (round-3 verdict next-step #6)
    val antis = "LeftAnti".r.findAllIn(p).length
    assert(antis >= 6, s"expected >=6 left-anti residue joins, got $antis")
    // and the fuzzy terminal is the gram inverted index, not a cross
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("near-dup shingling runs as codegen'd expressions, not UDFs") {
    // the checkpoint barrier hides the shingle stage from the final
    // executed plan, so audit the stage's own plan directly
    import org.apache.spark.sql.functions.col
    val sh = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(graft.operators.Dedup.hashedShingles(col("text"), 5).as("hs"))
    val shPlan = sh.queryExecution.executedPlan.toString
    assert(shPlan.contains("hashed_shingles") && !shPlan.contains("ScalaUDF"))
    val sig = sh.select(
      graft.operators.Dedup.minHashSig(col("hs"), 256).as("sig"))
    assert(sig.queryExecution.executedPlan.toString.contains("minhash_sig"))
    // and the assembled pipelines must not fall back to UDFs anywhere
    Seq("d4_jaccard_pairs", "d5_minhash_lsh").foreach { q =>
      assert(!plan(q).contains("ScalaUDF"), s"$q fell back to a UDF")
    }
  }

  test("multimodal scans prune to payload + id only") {
    val p = plan("mm_features")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("doc_id") && readSchema.contains("text"))
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      "feature extraction reads columns it never uses")
  }

  test("aggregations use partial+final hash aggregation (map-side combine)") {
    val p = plan("a1_group_countdistinct")
    assert(p.contains("HashAggregate"))
  }

  test("topk plans as TakeOrderedAndProject, not a global sort") {
    assert(plan("topk_orders").contains("TakeOrderedAndProject"))
  }

  test("weighted sampling is a scan-side draw + distributed top-n") {
    val p = plan("d43_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"),
      "the Gumbel draw must select via per-partition top-n, not a " +
        "global sort")
    assert(!p.contains("ScalaUDF") && !p.contains("Window"))
  }

  test("sq8 encode: skinny agg + one-row broadcast, no row-side shuffle") {
    val p = plan("d45_sq8_codes")
    // the trained scales attach as a broadcast one-row array; the
    // embeddings side must not shuffle to meet them
    assert(p.contains("BroadcastExchange"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("prefix-Jaccard candidates join on the shingle key, never nested-loop") {
    val p = plan("d42_prefix_jaccard")
    assert(!p.contains("BroadcastNestedLoopJoin")
      && !p.contains("CartesianProduct"))
  }

  test("multi-value codec is a single scan-stage projection, no UDFs") {
    // HOF lambdas (transform/filter) are CodegenFallback in Spark, so
    // no WholeStageCodegen marker — but the codec must stay one Project
    // directly over the pruned scan: no UDF, no shuffle before the
    // output sort.
    val p = plan("mv_normalize")
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"))
    assert(p.linesIterator.find(_.contains("ReadSchema")).get
      .matches(".*struct<doc_id:bigint,text:string>.*"))
    assert(p.sliding("Exchange".length).count(_ == "Exchange") == 1,
      "codec should add no shuffle beyond the output sort")
  }

  test("priority dedup: one fingerprint aggregation, literal ranks") {
    val p = plan("d72_priority_dedup")
    // the priority table rides as a literal map — no join for ranks,
    // no UDF, no nested loop; the only joins/exchanges serve the agg
    assert(!p.contains("ScalaUDF") && !p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"))
    // struct-min survivors aren't hash-aggregable — Spark plans a
    // SortAggregate, still one fingerprint-keyed exchange
    assert(p.contains("SortAggregate") || p.contains("HashAggregate"))
  }

  test("grouped line dedup: keyed joins only, no cartesian") {
    val p = plan("d74_grouped_line_dedup")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("sequence packing: partitioned row window, broadcast offsets") {
    // the global-cumsum scale-killer would show as a corpus-sized
    // Window with an empty partition spec; the two-level scan instead
    // partitions the row-level window by the id bucket and broadcasts
    // the config-sized bucket-offset table
    val p = plan("d67_pack_sequences")
    assert(p.contains("hashpartitioning(__b"),
      s"row-level window must partition by the id bucket:\n$p")
    assert(p.contains("BroadcastExchange"),
      "bucket offsets must attach as a broadcast, not a shuffle join")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }
}
