package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.cdc.Cdc
import graft.operators.{Decisions, Dedup, EntityResolution, Fuzzy,
  GraphOps, MatchStage, Mixing, Similarity, TextAnalysis, WorkInference}
import graft.ops.{Pipeline, Steps, Transform}

/** User-facing facade — the library surface a reference user programs
  * against. Everything is a thin delegation to the operator modules;
  * see COVERAGE.md for the full operator → module map.
  *
  * {{{
  * import graft.Graft
  *
  * // audited cleanup pipeline over an alib-style table
  * val (clean, changelog) = Graft.runPipeline(alib, "__path",
  *   Steps.defaultPipeline(Seq("title"), Seq("genre"), Seq("year")))
  *
  * // near-duplicate detection + canonical survivors
  * val survivors = Graft.dedupNearExact(docs, "doc_id", "text",
  *   k = 5, theta = 0.7)
  *
  * // ANN over an embedding column
  * val nn = Graft.annTopK(emb, "vec_id", "embedding", k = 10,
  *   queryFilter = col("vec_id") % 100 === 0)
  * }}}
  */
object Graft {

  /** Run an audited transform pipeline (each step diff-and-logged). */
  def runPipeline(table: DataFrame, keyCol: String,
                  steps: Seq[Transform]): (DataFrame, DataFrame) =
    Pipeline.run(table, keyCol, steps)

  /** Field-level CDC between two keyed table states. */
  def diff(orig: DataFrame, next: DataFrame, keyCol: String,
           cols: Seq[String], script: String): (DataFrame, DataFrame) =
    Cdc.diffAndLog(orig, next, keyCol, cols, script)

  /** Exact dedup groups (fingerprint, keeper, copies). */
  def dedupExact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.exactDedup(df, idCol, textCol)

  /** Source-precedence exact dedup: the preferred source's copy of
    * duplicated content survives (Dolma multi-dump rule); unlisted
    * sources rank last, lowest id breaks ties. */
  def dedupByPriority(df: DataFrame, idCol: String, textCol: String,
                      sourceCol: String,
                      priority: Map[String, Int]): DataFrame =
    Dedup.priorityDedup(df, idCol, textCol, sourceCol, priority)

  /** Near-dup survivors: cluster Jaccard pairs ≥ theta, keep the
    * min-id member of each cluster plus everything unclustered. */
  def dedupNearExact(df: DataFrame, idCol: String, textCol: String,
                     k: Int, theta: Double): DataFrame = {
    import org.apache.spark.sql.functions.col
    val pairs = Dedup.jaccardPairs(df, idCol, textCol, k, theta)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val drop = GraphOps.connectedComponents(pairs)
      .filter(col("node") =!= col("comp"))
      .select(col("node").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** Exact Jaccard pairs via PPJoin-style prefix filtering —
    * output-identical to the inverted-index blocking inside
    * [[dedupNearExact]], but candidate volume shrinks quadratically on
    * boilerplate-heavy corpora with zero misses (see
    * [[operators.Dedup.prefixJaccardPairs]] for the lemma). */
  def dedupPrefixPairs(df: DataFrame, idCol: String, textCol: String,
                       k: Int, theta: Double): DataFrame =
    Dedup.prefixJaccardPairs(df, idCol, textCol, k, theta)

  /** MinHash-LSH near-dup pairs (probabilistic candidate generation,
    * exact re-score) — the very-large-corpus path. `bucketCap` bounds
    * per-(band, hash) bucket population against clone-heavy skew
    * (see [[operators.Dedup.minHashLshPairs]] for the miss bound). */
  def dedupLshPairs(df: DataFrame, idCol: String, textCol: String,
                    k: Int, theta: Double, bucketCap: Int = 64): DataFrame =
    Dedup.minHashLshPairs(df, idCol, textCol, k, theta,
      bucketCap = bucketCap)

  /** Embedding-level decontamination: per corpus vector, max cosine to
    * any benchmark vector with a contamination flag at `theta`.
    *
    * Scale contract: the BENCH side is broadcast in full to every
    * executor, so this operator is safe only while the benchmark stays
    * broadcast-bounded (thousands of vectors, not millions — a real
    * eval benchmark, which by nature does not scale with the crawl).
    * Callers feeding a growing frame as `bench` must cap it first, as
    * the d48 query does with its fixed id-range bound; an oversized
    * bench side fails at the broadcast threshold rather than silently
    * going quadratic. An EMPTY bench yields one (id, null, 0) row per
    * corpus vector, never an empty frame. */
  def semanticContamination(corpus: DataFrame, bench: DataFrame,
                            idCol: String, vecCol: String,
                            theta: Double): DataFrame =
    Similarity.semanticContamination(corpus, bench, idCol, vecCol, theta)

  /** Exact cosine top-k for a probe subset. */
  def annTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int,
              queryFilter: Column): DataFrame =
    Similarity.bruteForceTopK(emb, idCol, vecCol, k, queryFilter)

  /** Bucketed ANN (multi-probe sign-LSH) — the scale path. Pass
    * `planes` (see [[operators.Similarity.rademacherPlanes]]) for
    * balanced seeded random projections on real embeddings; empty →
    * axis-aligned sign buckets. */
  def annTopKLsh(emb: DataFrame, idCol: String, vecCol: String, k: Int,
                 nbits: Int, queryFilter: Column,
                 maxHamming: Int = 1,
                 planes: Array[Array[Float]] = Array.empty): DataFrame =
    Similarity.lshTopK(emb, idCol, vecCol, k, nbits, queryFilter,
      maxHamming, planes)

  /** Fuzzy name-match pairs by char-ngram cosine. */
  def fuzzyPairs(df: DataFrame, nameCol: String, n: Int,
                 theta: Double): DataFrame =
    Fuzzy.tfCosinePairs(df, nameCol, n, theta)

  /** One-pass text quality stats struct (tokens / distinct / mean word
    * length / stopword ratio). */
  def textStats(c: Column): Column =
    graft.operators.TextAnalysis.textStats(c)

  /** Stopword-vote language ID ('en'/'de'/'fr'/'es'/'und'). */
  def langId(c: Column): Column =
    graft.operators.TextAnalysis.langIdHeuristic(c)

  /** Engine-portable SimHash signatures (hex, md5-based bit votes). */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.simHashPortable(df, idCol, textCol)

  /** Weighted PageRank centrality over an undirected (src, dst,
    * weight) edge list — fixed-iteration, cross-engine-deterministic
    * (see [[operators.GraphOps.pageRank]]). */
  def pageRank(edges: DataFrame, iters: Int = 5,
               damping: Double = 0.85): DataFrame =
    GraphOps.pageRank(edges, iters, damping)

  /** Staged entity-resolution waterfall: cheap key stages with
    * anti-join residues, fuzzy terminal on what remains. */
  def resolveWaterfall(left: DataFrame, leftId: String,
                       right: DataFrame, rightId: String,
                       stages: Seq[MatchStage],
                       fuzzyNames: Option[(String, String)] = None)
      : DataFrame =
    EntityResolution.waterfall(left, leftId, right, rightId, stages,
      fuzzyNames)

  /** Step-18/23 disambiguation flows: auto-assign unique candidates,
    * consult persisted decisions, queue the rest as pending. */
  def resolveWithDecisions(candidates: DataFrame,
                           decisions: DataFrame): (DataFrame, DataFrame) =
    Decisions.resolveWithDecisions(candidates, decisions)

  /** Conservative work-inference scoring with confidence tiers and
    * guardrailed auto-apply. */
  def inferWorks(tracks: DataFrame, trackId: String, titleNorm: String,
                 workidCol: String, roleCols: Map[String, String],
                 mbidCols: Seq[String], lookup: DataFrame): DataFrame =
    WorkInference.inferWorks(tracks, trackId, titleNorm, workidCol,
      roleCols, mbidCols, lookup)

  /** Redact emails / IPs / card numbers / phones to typed markers. */
  def piiRedact(c: Column): Column = TextAnalysis.piiRedact(c)

  /** Canonicalize a URL for dedup/blocklist matching (fragment and
    * utm_* stripped — query substring only, the path is never
    * touched — lowercased head, default ports dropped). */
  def urlCanonicalize(c: Column): Column =
    TextAnalysis.urlCanonicalize(c)

  /** Registered domain (two-label rule, www.-stripped). IP-literal
    * hosts pass through whole, and a ~30-entry embedded multi-label
    * public-suffix table keeps three labels under co.uk/com.au/co.jp
    * etc. (bbc.co.uk stays bbc.co.uk); suffixes OUTSIDE that table
    * still collapse to two labels — an approximation of the full
    * Mozilla public-suffix list. */
  def registeredDomain(c: Column): Column =
    TextAnalysis.registeredDomain(c)

  /** C4's line/page cleanup rules (terminal punctuation, >= 5 words,
    * no javascript; page needs >= 5 kept lines — the c4_utils
    * sentence floor — and no lorem-ipsum / brace) — all docs emitted
    * with flags + rebuilt text. */
  def c4LineRules(docs: DataFrame, idCol: String,
                  textCol: String): DataFrame =
    TextAnalysis.c4LineRules(docs, idCol, textCol)

  /** Gopher's full n-gram repetition battery: top-{2,3,4}-gram char
    * fractions + duplicate-{5..10}-gram char fractions (overlaps
    * counted once). */
  def gopherNgramStats(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame =
    TextAnalysis.gopherNgramStats(docs, idCol, textCol)

  /** Gopher-style repetition quality stats per document. */
  def repetitionStats(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    TextAnalysis.repetitionStats(docs, idCol, textCol)

  /** Within-doc line-repetition stats (Gopher A1.2 at line
    * granularity): duplicate-line and duplicate-line-character
    * fractions — the per-doc templated-page filter signal. */
  def lineRepetitionStats(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame =
    TextAnalysis.lineRepetitionStats(docs, idCol, textCol)

  /** Kneser-Ney bigram LM score per document (D = 0.75) — the
    * smoothing real perplexity filters use. */
  def knBigramScore(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame =
    TextAnalysis.knBigramScore(docs, idCol, textCol)

  /** The KN LM's maintained state: per-doc bigram-count rows plus a
    * per-doc marker — doc-disjoint partials union-merge exactly. */
  def knSnapshot(docs: DataFrame, idCol: String,
                 textCol: String): DataFrame =
    TextAnalysis.knSnapshot(docs, idCol, textCol)

  /** Union-merge doc-disjoint [[knSnapshot]] partials — the LM's
    * incremental refresh; merged == full recompute by construction. */
  def mergeKnSnapshots(parts: Seq[DataFrame]): DataFrame =
    TextAnalysis.mergeKnSnapshots(parts)

  /** Loud detector for the [[mergeKnSnapshots]] disjointness
    * contract: one marker per distinct doc or it throws. */
  def validateKnSnapshot(snap: DataFrame): Unit =
    TextAnalysis.validateKnSnapshot(snap)

  /** Score a (fresh or merged) [[knSnapshot]] — the scoring tail
    * shared with [[knBigramScore]]. */
  def knScoreFromSnapshot(snap: DataFrame): DataFrame =
    TextAnalysis.knScoreFromSnapshot(snap)

  /** The CCNet per-language head/middle/tail cut over the KN score —
    * the companion of [[knBigramScore]], as `perplexityBuckets`
    * pairs the add-one score. */
  def knPerplexityBuckets(docs: DataFrame, idCol: String,
                          textCol: String, langCol: String,
                          buckets: Int = 3): DataFrame =
    TextAnalysis.knPerplexityBuckets(docs, idCol, textCol, langCol,
      buckets)

  /** Flag corpus docs sharing any word n-gram with a benchmark set. */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchTextCol: String,
                    n: Int = 8): DataFrame =
    Dedup.decontaminate(corpus, idCol, textCol, bench, benchTextCol, n)

  /** Deterministic stratified sampling by basis-point mixing weights. */
  def mixSample(df: DataFrame, idCol: String, stratumCol: String,
                ratesBp: Map[String, Int],
                defaultBp: Int = 10000): DataFrame =
    Mixing.stratifiedSample(df, idCol, stratumCol, ratesBp, defaultBp)

  /** Sharded token-budget sequence packing (bin + offset per doc). */
  def packByBudget(df: DataFrame, idCol: String, tokensCol: String,
                   budget: Int, shards: Int): DataFrame =
    Mixing.packByBudget(df, idCol, tokensCol, budget, shards)

  /** BPE merge-candidate pair counts (vocabulary-weighted adjacent
    * character pairs) — the counting kernel of tokenizer training. */
  def bpePairCounts(docs: DataFrame, textCol: String,
                    topN: Int): DataFrame =
    TextAnalysis.bpePairCounts(docs, textCol, topN)

  /** Deterministic weighted sampling without replacement
    * (Efraimidis-Spirakis Gumbel keys; distributed top-n, no RNG). */
  def weightedSampleN(df: DataFrame, idCol: String, weightCol: String,
                      n: Int): DataFrame =
    Mixing.weightedSampleN(df, idCol, weightCol, n)

  /** Per-stratum keep rates for a token-budget corpus recipe;
    * saturating strata surface their shortfall as `deficit_tokens`. */
  def mixturePlan(df: DataFrame, stratumCol: String, tokensCol: String,
                  targets: Map[String, Double], budget: Long): DataFrame =
    Mixing.mixturePlan(df, stratumCol, tokensCol, targets, budget)

  /** Per-source blocklist + quality-gate audit (docs/tokens in vs
    * kept, survival rate) — the URL-filtering stage's accounting. */
  def sourceAudit(df: DataFrame, srcCol: String, tokensCol: String,
                  blocklist: Set[String],
                  rowGate: Column): DataFrame =
    Mixing.sourceAudit(df, srcCol, tokensCol, blocklist, rowGate)

  /** HTML/markup boilerplate strip (tags, script/style blocks,
    * entities) — the first cleanup pass of a web-crawl ingest. */
  def stripMarkup(c: Column): Column = TextAnalysis.stripMarkup(c)

  /** Deterministic epoch shuffle into training shards (shard + pos). */
  def shuffleShards(df: DataFrame, idCol: String, seed: Int,
                    shards: Int): DataFrame =
    Mixing.shuffleShards(df, idCol, seed, shards)

  /** Dedupe a new batch against the existing corpus by fingerprint. */
  def crossDedup(incoming: DataFrame, existing: DataFrame,
                 idCol: String, textCol: String): DataFrame =
    Dedup.crossDedup(incoming, existing, idCol, textCol)

  /** Prefix-filtered variant of [[crossDedupNear]] — output-identical,
    * quadratically fewer candidates on boilerplate-heavy corpora, df
    * order reusable across ingest batches. */
  def crossDedupNearPrefix(incoming: DataFrame, existing: DataFrame,
                           idCol: String, textCol: String,
                           k: Int, theta: Double): DataFrame =
    Dedup.prefixCrossJaccard(incoming, existing, idCol, textCol, k, theta)

  /** Near-dup arm of the incremental import: incoming×existing Jaccard
    * pairs ≥ theta (the existing corpus never self-joins). */
  def crossDedupNear(incoming: DataFrame, existing: DataFrame,
                     idCol: String, textCol: String,
                     k: Int, theta: Double): DataFrame =
    Dedup.crossDedupNear(incoming, existing, idCol, textCol, k, theta)

  /** The LSH family's MAINTAINED serving artifact: one (id, band,
    * bucket-hash) row per doc per band — persist it in the generic
    * snapshot store and screen every crawl batch against it. */
  def minHashBands(df: DataFrame, idCol: String, textCol: String,
                   k: Int, numPerm: Int = 256,
                   bands: Int = 64): DataFrame =
    Dedup.minHashBands(df, idCol, textCol, k, numPerm, bands)

  /** Loud structural validator for a maintained band table: every
    * present id carries exactly `bands` rows; pass `expectedIds` to
    * also refuse wholly-missing band sets (the completeness hole the
    * per-id count cannot see). */
  def validateMinHashBands(bandsTable: DataFrame, idCol: String,
                           bands: Int = 64,
                           expectedIds: Option[DataFrame] = None): Unit =
    Dedup.validateMinHashBands(bandsTable, idCol, bands, expectedIds)

  /** Ingest-time near-dup screen against a maintained [[minHashBands]]
    * table: band the batch, probe stored buckets, exact-rescore the
    * candidates only — per-batch cost, zero corpus signatures
    * recomputed; equals full pairwise incoming×existing Jaccard at
    * theta (banding miss ≈2e-8 at θ≥0.7 with the defaults). */
  def lshScreenAgainst(incoming: DataFrame, storedBands: DataFrame,
                       existing: DataFrame, idCol: String,
                       textCol: String, k: Int, theta: Double,
                       numPerm: Int = 256, bands: Int = 64): DataFrame =
    Dedup.lshScreenAgainst(incoming, storedBands, existing, idCol,
      textCol, k, theta, numPerm, bands)

  /** Exactly `nPer` rows per stratum by deterministic md5 rank. */
  def sampleN(df: DataFrame, idCol: String, stratumCol: String,
              nPer: Int): DataFrame =
    Mixing.sampleN(df, idCol, stratumCol, nPer)

  /** One-pass column profile (rows / nulls / distinct / min / max);
    * `approx = true` switches distinct counts to HyperLogLog++. */
  def profile(df: DataFrame, cols: Seq[String],
              approx: Boolean = false): DataFrame =
    graft.operators.Profile.profile(df, cols, approx)

  /** Z-order a frame across `numFiles` range partitions so min/max
    * stats prune scans on either of the two dimensions. */
  def zOrderBy(df: DataFrame, xCol: String, yCol: String,
               bits: Int, numFiles: Int): DataFrame =
    graft.operators.Layout.zOrderBy(df, xCol, yCol, bits, numFiles)

  /** BM25 top-k document search over an inverted index (term-keyed
    * joins only; `dfCap` guards stop-term skew). */
  def searchTopK(docs: DataFrame, idCol: String, textCol: String,
                 queries: DataFrame, qidCol: String, qTextCol: String,
                 k: Int, dfCap: Int = 0): DataFrame =
    graft.operators.Search.bm25TopK(docs, idCol, textCol,
      queries, qidCol, qTextCol, k, dfCap = dfCap)

  /** Impact-ordered BM25 top-k (max-score pruning, exact-certified
    * per query with exact-probe fallback). Run
    * [[searchCertificates]] first: on near-uniform-impact corpora
    * the certificate never fires and [[searchTopK]] is cheaper. */
  def searchTopKPruned(docs: DataFrame, idCol: String, textCol: String,
                       queries: DataFrame, qidCol: String,
                       qTextCol: String, k: Int, m: Int = 64,
                       dfCap: Int = 0): DataFrame =
    graft.operators.Search.bm25TopKMaxScore(docs, idCol, textCol,
      queries, qidCol, qTextCol, k, m, dfCap = dfCap)

  /** Per-query (qid, certified) outcomes of the max-score pruning —
    * the m-tuning / path-selection diagnostic. */
  def searchCertificates(docs: DataFrame, idCol: String, textCol: String,
                         queries: DataFrame, qidCol: String,
                         qTextCol: String, k: Int, m: Int = 64,
                         dfCap: Int = 0): DataFrame =
    graft.operators.Search.bm25MaxScoreCertificates(docs, idCol, textCol,
      queries, qidCol, qTextCol, k, m, dfCap = dfCap)

  /** Build the BM25 index snapshot once (materialize it yourself)
    * and serve many query batches via [[searchTopKIndexed]]. */
  def searchSnapshot(docs: DataFrame, idCol: String,
                     textCol: String): DataFrame =
    graft.operators.Search.tfSnapshot(docs, idCol, textCol)

  /** Merge [[searchSnapshot]] partials from doc-disjoint batches —
    * append-only postings maintenance; check a merge of uncertain
    * provenance with [[validateSearchSnapshot]]. */
  def mergeSearchSnapshots(parts: Seq[DataFrame]): DataFrame =
    graft.operators.Search.mergeTfSnapshots(parts)

  /** Fail loudly if a (merged) snapshot has duplicate doc ids —
    * silent N/df inflation otherwise. */
  def validateSearchSnapshot(tfAll: DataFrame): Unit =
    graft.operators.Search.validateTfSnapshot(tfAll)

  /** [[searchTopK]] against a pre-built [[searchSnapshot]]. */
  def searchTopKIndexed(tfAll: DataFrame, queries: DataFrame,
                        qidCol: String, qTextCol: String, k: Int,
                        dfCap: Int = 0): DataFrame =
    graft.operators.Search.bm25TopKIndexed(tfAll, queries, qidCol,
      qTextCol, k, dfCap = dfCap)

  /** Append an aggregate-only snapshot to a run-keyed store (the
    * `_SNAP_runs` discipline, ref tm_snapshots.py:56-83): compare
    * dashboards then diff STORED rows — one snapshot pass per run,
    * the "before" side read from disk, never recomputed. */
  def snapshotAppendRun(snap: DataFrame, runId: String, runSeq: Int,
                        dir: String, overwrite: Boolean = false): Unit =
    graft.core.Snapshots.appendRun(snap, runId, runSeq, dir, overwrite)

  /** Read a [[snapshotAppendRun]] store from disk with the
    * schema-merge [[snapshotLastTwoRuns]]' retry detector needs on
    * mid-life-upgraded stores (a plain read can infer from a
    * pre-stamp footer and silently blind it). */
  def snapshotLoadRunStore(spark: SparkSession, dir: String): DataFrame =
    graft.core.Snapshots.loadRunStore(spark, dir)

  /** The latest and previous runs of a [[snapshotAppendRun]] store,
    * as (before, after) — the 90/91 compare inputs. */
  def snapshotLastTwoRuns(store: DataFrame): (DataFrame, DataFrame) =
    graft.core.Snapshots.lastTwoRuns(store)

  /** Left as-of join: latest build-side state at or before each probe
    * row's timestamp (one keyed shuffle, no join node). */
  def asofJoin(probe: DataFrame, build: DataFrame, key: String,
               tsCol: String, tieCol: String,
               payloadCols: Seq[String] = Seq.empty,
               prefix: String = "asof_",
               tolerance: Long = 0L): DataFrame =
    graft.operators.Temporal.asofJoin(probe, build, key, tsCol, tieCol,
      payloadCols, prefix, tolerance)

  /** Interval containment join with no equi key — bucketed cell
    * equi-join, never a broadcast nested loop. */
  def rangeJoin(intervals: DataFrame, startCol: String, endCol: String,
                points: DataFrame, ptCol: String,
                bucketWidth: Long): DataFrame =
    graft.operators.Temporal.rangeJoin(intervals, startCol, endCol,
      points, ptCol, bucketWidth)

  /** Corpus-unigram LM quality score (integer-micro exact). */
  def unigramLmScore(docs: DataFrame, idCol: String,
                     textCol: String): DataFrame =
    TextAnalysis.unigramLmScore(docs, idCol, textCol)

  /** Corpus-bigram LM quality score (Laplace-smoothed transitions,
    * integer-micro exact) — ranks fluent text above shuffled tokens,
    * which unigram statistics cannot. */
  def bigramLmScore(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame =
    TextAnalysis.bigramLmScore(docs, idCol, textCol)

  /** CCNet-style per-language perplexity tiers over the bigram LM
    * (rank-exact NTILE cut; bucket 1 = head, last = tail). */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        langCol: String, buckets: Int = 3): DataFrame =
    TextAnalysis.perplexityBuckets(docs, idCol, textCol, langCol, buckets)

  /** Sliding token-window chunking (map-side generator). */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int, overlap: Int = 0): DataFrame =
    TextAnalysis.chunkByTokens(docs, idCol, textCol, chunkTokens, overlap)

  /** Per-group top-k via a bounded typed Aggregator — k-sized partial
    * buffers shuffle instead of every row (no window sort). String ids:
    * [[operators.TopK.topKPerGroupAs]]. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], scoreCol: String,
                   idCol: String, k: Int): DataFrame =
    graft.operators.TopK.topKPerGroup(df, groupCols, scoreCol, idCol, k)

  /** Deterministic embedding k-means (Lloyd rounds with broadcast
    * centroids) — IVF coarse-quantizer trainer / topic bucketing. */
  def kMeans(emb: DataFrame, idCol: String, vecCol: String,
             k: Int, iters: Int): DataFrame =
    graft.operators.Clustering.kMeans(emb, idCol, vecCol, k, iters)

  /** [[kMeans]] plus each vector's 6-dp cosine to its final cluster
    * centroid — the SemDeDup ranking quantity. */
  def kMeansWithSim(emb: DataFrame, idCol: String, vecCol: String,
                    k: Int, iters: Int): DataFrame =
    graft.operators.Clustering.kMeansWithSim(emb, idCol, vecCol, k, iters)

  /** SemDeDup-style semantic dedup: k-means clusters, then greedy
    * within-cluster removal of cos≥theta near-duplicates, keeping the
    * far-from-centroid member of each similar group. `clusterCap`
    * bounds the per-cluster probe prefix (see
    * [[operators.Dedup.semDedup]] for the miss characterization). */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
               k: Int, iters: Int, theta: Double,
               clusterCap: Int = 4096): DataFrame =
    graft.operators.Dedup.semDedup(emb, idCol, vecCol, k, iters, theta,
      clusterCap)

  /** Exact duplicate-substring spans (Lee et al. 2022 EXACTSUBSTR,
    * re-expressed as rolling w-gram runs): merged 1-based word ranges
    * whose every w-gram occurs ≥ minCount times corpus-wide. Linear
    * output, no self-join — see [[operators.Dedup.duplicateSpans]]. */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                     w: Int = 8, minCount: Int = 2): DataFrame =
    graft.operators.Dedup.duplicateSpans(docs, idCol, textCol, w, minCount)

  /** WHERE benchmark contamination sits in each corpus doc: merged
    * 1-based word ranges whose every w-gram appears in the bench
    * suite — cut the range, keep the doc. See
    * [[operators.Dedup.decontaminateSpans]]. */
  def decontaminateSpans(corpus: DataFrame, idCol: String,
                         textCol: String, bench: DataFrame,
                         benchTextCol: String, w: Int = 8): DataFrame =
    graft.operators.Dedup.decontaminateSpans(corpus, idCol, textCol,
      bench, benchTextCol, w)

  /** Cross-corpus duplicate-substring spans: incoming word ranges
    * whose every w-gram exists in the existing corpus (the existing
    * side never self-compares). See
    * [[operators.Dedup.crossDupSpans]]. */
  def crossDupSpans(incoming: DataFrame, existing: DataFrame,
                    idCol: String, textCol: String,
                    w: Int = 8): DataFrame =
    graft.operators.Dedup.crossDupSpans(incoming, existing, idCol,
      textCol, w)

  /** Rebuild text with span-table ranges cut (whitespace-normalizing;
    * the "cut the range, keep the doc" step for [[duplicateSpans]] /
    * [[decontaminateSpans]] output). */
  def cutSpans(docs: DataFrame, idCol: String, textCol: String,
               spans: DataFrame): DataFrame =
    graft.operators.Dedup.cutSpans(docs, idCol, textCol, spans)

  /** DSIR-style importance scores for target-matched data selection
    * (Laplace unigram-LM log-ratio, integer-micro exact). */
  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
                 targetFilter: Column): DataFrame =
    graft.operators.Mixing.dsirScores(docs, idCol, textCol, targetFilter)

  /** Report 94: per-album missing-critical-tags exception table. */
  def missingCriticalTags(tracks: DataFrame, dirCol: String,
                          criticalCols: Seq[String],
                          compilationCol: Option[String] = None): DataFrame =
    graft.reports.Insights.missingCriticalTags(tracks, dirCol,
      criticalCols, compilationCol)

  /** Library-Health radar axes: per critical field, track-level
    * non-compliance and album-level impact (the report-92 radar). */
  def healthRadar(tracks: DataFrame, dirCol: String,
                  criticalCols: Seq[String],
                  compilationCol: Option[String] = None): DataFrame =
    graft.reports.Insights.healthRadar(tracks, dirCol, criticalCols,
      compilationCol)

  /** Per-album ReplayGain quality/dynamics quantile rollup. */
  def qualityQuantiles(tracks: DataFrame): DataFrame =
    graft.reports.Insights.qualityQuantiles(tracks)

  /** Top-N role tokens per role column by distinct-album count. */
  def topRoles(tracks: DataFrame, roleCols: Seq[String],
               topN: Int): DataFrame =
    graft.reports.Insights.topRoles(tracks, roleCols, topN)

  /** Album-level role co-occurrence: each side's top partner, top-N
    * rows per direction. */
  def rolePairs(tracks: DataFrame, roleA: String, roleB: String,
                topN: Int): DataFrame =
    graft.reports.Insights.rolePairs(tracks, roleA, roleB, topN)

  /** Persona-sliced top roles: [[topRoles]] over tracks whose genre
    * tokens hit `vocab` (track-scoped, the classical-roles shape). */
  def genreTopRoles(tracks: DataFrame, vocab: Seq[String],
                    roleCols: Seq[String], topN: Int): DataFrame =
    graft.reports.Insights.genreTopRoles(tracks, vocab, roleCols, topN)

  /** Album-scoped persona top artists: albums qualify on ANY matching
    * track; artists counted over all the album's tracks. */
  def genreAlbumTopArtists(tracks: DataFrame, vocab: Seq[String],
                           roleCol: String, topN: Int): DataFrame =
    graft.reports.Insights.genreAlbumTopArtists(tracks, vocab, roleCol,
      topN)

  /** Lossless/lossy format breakdown with share-of-class percentages. */
  def formatBreakdown(tracks: DataFrame): DataFrame =
    graft.reports.Insights.formatBreakdown(tracks)

  /** Skew-salted equi-join (fact salts into n buckets, dim replicates). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 spreadCol: String, n: Int = 16): DataFrame =
    graft.core.Scale.saltedJoin(fact, dim, key, spreadCol, n)

  /** Bloom-pruned exact semi-join: misses drop in the fact scan stage,
    * false positives are removed by the exact join — row-identical to
    * the plain semi-join at any fpp. */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame,
                    factKey: String, dimKey: String,
                    expectedItems: Long = 1000000L): DataFrame =
    graft.operators.RuntimeFilter.bloomSemiJoin(fact, dim, factKey,
      dimKey, expectedItems)

  /** Bloom-pruned exact anti-join: probe-false rows are definite
    * non-members and bypass the join entirely. */
  def bloomAntiJoin(fact: DataFrame, dim: DataFrame,
                    factKey: String, dimKey: String,
                    expectedItems: Long = 1000000L): DataFrame =
    graft.operators.RuntimeFilter.bloomAntiJoin(fact, dim, factKey,
      dimKey, expectedItems)

  /** Train PQ codebooks and encode: (idCol, code array<int> of m
    * sub-codes) — the 64× vector-compression step of billion-scale ANN. */
  def pqCodes(emb: DataFrame, idCol: String, vecCol: String,
              m: Int, k: Int, iters: Int = 2): DataFrame =
    graft.operators.Quantization.pqCodes(emb, idCol, vecCol, m, k, iters)

  /** ADC top-k cosine over the PQ-compressed corpus (full-precision
    * queries, integer-micro LUT scoring). */
  def pqAdcTopK(emb: DataFrame, idCol: String, vecCol: String,
                m: Int, k: Int, topK: Int, queryFilter: Column,
                iters: Int = 2): DataFrame =
    graft.operators.Quantization.pqAdcTopK(emb, idCol, vecCol, m, k,
      iters, topK, queryFilter)

  /** IVF-PQ end-to-end search (FAISS IndexIVFPQ / IVFADC): coarse
    * cells + PQ residual codes + nprobe-bounded integer-micro ADC —
    * a query pays for nprobe/nlist of the corpus, not all of it. */
  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String,
                nlist: Int, m: Int, ksub: Int, nprobe: Int, topK: Int,
                queryFilter: Column, coarseIters: Int = 2,
                pqIters: Int = 2): DataFrame =
    graft.operators.Quantization.ivfPqTopK(emb, idCol, vecCol, nlist,
      coarseIters, m, ksub, pqIters, nprobe, topK, queryFilter)

  /** Train and persist the IVF-PQ index (the serving artifact);
    * probe it per query batch with [[ivfPqSearch]]. */
  def ivfPqIndex(emb: DataFrame, idCol: String, vecCol: String,
                 nlist: Int, m: Int, ksub: Int, coarseIters: Int = 2,
                 pqIters: Int = 2): graft.operators.Quantization.IvfPqIndex =
    graft.operators.Quantization.ivfPqIndex(emb, idCol, vecCol, nlist,
      coarseIters, m, ksub, pqIters)

  /** Probe a trained [[ivfPqIndex]] with a batch of queries — safe to
    * call per micro-batch (per-query work is index-static). */
  def ivfPqSearch(queries: DataFrame, idCol: String, vecCol: String,
                  idx: graft.operators.Quantization.IvfPqIndex,
                  nprobe: Int, topK: Int): DataFrame =
    graft.operators.Quantization.ivfPqSearch(queries, idCol, vecCol,
      idx, nprobe, topK)

  /** Persist a trained [[ivfPqIndex]] as the cell-partitioned
    * serving layout (codes hive-partitioned by cell, codebooks +
    * meta beside them). `manifest = true` also writes the opt-in
    * nid→cell manifest, which scopes `ivfPqRemoveBatch` takedown
    * DISCOVERY to one doc-count-sized probe instead of a
    * full-layout id-column scan. */
  def persistIvfPqIndex(idx: graft.operators.Quantization.IvfPqIndex,
                        dir: String, manifest: Boolean = false): Unit =
    graft.operators.Quantization.persistIvfPqIndex(idx, dir, manifest)

  /** Loud exact-sync detector for the nid→cell manifest (a missing
    * pair lets future takedowns MISS their cells);
    * [[rebuildIvfPqNidManifest]] repairs. */
  def validateIvfPqNidManifest(spark: SparkSession, dir: String): Unit =
    graft.operators.Quantization.validateIvfPqNidManifest(spark, dir)

  /** (Re)build the nid→cell manifest from the layout's own codes —
    * exact by construction; also the repair for crash-residue
    * drift. */
  def rebuildIvfPqNidManifest(spark: SparkSession, dir: String): Unit =
    graft.operators.Quantization.rebuildIvfPqNidManifest(spark, dir)

  /** Load a [[persistIvfPqIndex]] layout — codebooks to the driver,
    * the code table as a lazy cell-pruned scan. */
  def loadIvfPqIndex(spark: SparkSession, dir: String)
      : graft.operators.Quantization.IvfPqIndex =
    graft.operators.Quantization.loadIvfPqIndex(spark, dir)

  /** Loud detector for the add path's id-uniqueness contract:
    * m code rows per id or it throws. */
  def validateIvfPqCodes(spark: SparkSession, dir: String): Unit =
    graft.operators.Quantization.validateIvfPqCodes(spark, dir)

  /** FAISS `imbalance_factor` + per-cell occupancy — the retrain
    * trigger for a drifting maintained index. */
  def ivfPqImbalance(idx: graft.operators.Quantization.IvfPqIndex)
      : DataFrame =
    graft.operators.Quantization.ivfPqImbalance(idx)

  /** The periodic retrain/compact the imbalance number schedules:
    * fresh codebooks on the union corpus, re-encode, overwrite. */
  def ivfPqRetrain(emb: DataFrame, idCol: String, vecCol: String,
                   dir: String, nlist: Int, coarseIters: Int, m: Int,
                   ksub: Int, pqIters: Int): Unit =
    graft.operators.Quantization.ivfPqRetrain(emb, idCol, vecCol, dir,
      nlist, coarseIters, m, ksub, pqIters)

  /** Symmetric per-dim int8 scalar quantization (absmax SQ8). */
  def sq8Codes(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    graft.operators.Quantization.sq8Codes(emb, idCol, vecCol)

  /** The SQ8 → PQ residual compression ladder: per-vector squared
    * reconstruction error of SQ8 alone vs SQ8 + PQ residual, micros. */
  def sq8PqLadder(emb: DataFrame, idCol: String, vecCol: String,
                  m: Int, ksub: Int, iters: Int = 2): DataFrame =
    graft.operators.Quantization.sq8PqLadder(emb, idCol, vecCol, m,
      ksub, iters)

  /** Full BPE merge-rule training over the corpus vocabulary —
    * returns the learned (step, left, right, merged, n) merge table. */
  def bpeTrain(docs: DataFrame, textCol: String, merges: Int): DataFrame =
    TextAnalysis.bpeTrain(docs, textCol, merges)

  /** Tokenizer inference: per-doc BPE token counts under a trained
    * merge table — each distinct corpus word segments once. */
  def bpeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                     merges: Seq[(String, String)]): DataFrame =
    TextAnalysis.bpeTokenCounts(docs, idCol, textCol, merges)

  /** Gopher quality-rule suite (word count / word length / symbol /
    * bullet / ellipsis / alpha / stop-word rules) with per-rule
    * booleans and a conjunction `pass` flag — scan-side only. */
  def gopherRules(docs: DataFrame, idCol: String,
                  textCol: String): DataFrame =
    TextAnalysis.gopherRules(docs, idCol, textCol)

  /** Exact L2 brute-force top-k in integer micros — the ground truth
    * for ANN recall (same metric/rounding as [[ivfPqTopK]]). */
  def bruteForceTopKL2(emb: DataFrame, idCol: String, vecCol: String,
                       k: Int, queryFilter: Column): DataFrame =
    Similarity.bruteForceTopKL2(emb, idCol, vecCol, k, queryFilter)

  /** Recall@k of an approximate (qid, nid) ranking vs the exact one —
    * the tuning metric for nprobe / m / champion depth. */
  def annRecallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame =
    Similarity.annRecallAtK(approx, exact, k)

  /** Temperature-scaled mixture shares (mT5/XLM-R sampling):
    * q_i = p_i^α / Σ p_j^α — flattens natural token shares toward
    * uniform, up-weighting tail strata. α = 0.5 (sqrt) is the
    * engine-exact choice. */
  def temperatureMixture(df: DataFrame, stratumCol: String,
                         tokensCol: String,
                         alpha: Double = 0.5): DataFrame =
    Mixing.temperatureMixture(df, stratumCol, tokensCol, alpha)

  /** Shingle df histogram — the dfCap / prefix-path tuning diagnostic
    * for the near-dup family (heavy top bucket ⇒ the boilerplate
    * regime where prefix filtering wins and dfCap loses recall). */
  def shingleDfStats(df: DataFrame, idCol: String, textCol: String,
                     k: Int): DataFrame =
    Dedup.shingleDfStats(df, idCol, textCol, k)

  /** One-sided containment near-dup: C(a→b) = |A∩B|/|A| both
    * directions — catches short-doc-quoted-in-long-doc reuse whose
    * Jaccard vanishes as the host grows. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       k: Int, theta: Double,
                       dfCap: Int = 0): DataFrame =
    Dedup.containmentPairs(df, idCol, textCol, k, theta, dfCap)

  /** Corpus-wide exact line dedup (the C4 boilerplate screen): lines
    * occurring ≥ minCount times are cut everywhere except one
    * canonical lowest-(doc, pos) survivor; whitespace-only lines
    * always stay. Returns (id, rebuilt text, n_removed). */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
                minCount: Int = 3): DataFrame =
    graft.operators.Dedup.lineDedup(docs, idCol, textCol, minCount)

  /** Per-group (per-site) line dedup: a line is boilerplate only if
    * it repeats within its own group — the surgical site-template
    * screen. Returns (id, group, rebuilt text, n_removed). */
  def groupedLineDedup(docs: DataFrame, idCol: String, groupCol: String,
                       textCol: String, minCount: Int = 3): DataFrame =
    graft.operators.Dedup.groupedLineDedup(docs, idCol, groupCol,
      textCol, minCount)

  /** Model-based quality scoring (fastText-filter shape): hashed-BoW
    * logistic regression trained in-engine with deterministic unrolled
    * GD, scoring every doc with a keep probability in micros. */
  def lrQualityScores(docs: DataFrame, idCol: String, textCol: String,
                      label: Column, dims: Int = 64, steps: Int = 2,
                      eta: Double = 0.5): DataFrame =
    graft.operators.QualityModel.lrQualityScores(docs, idCol, textCol,
      label, dims, steps, eta)

  /** Merge mergeable partial rollups (sum/min/max state) key-wise —
    * incremental aggregate maintenance without a corpus rescan. */
  def mergeRollups(partials: Seq[DataFrame], keys: Seq[String],
                   specs: Seq[(String, String)]): DataFrame =
    graft.operators.Incremental.mergeRollups(partials, keys, specs)

  /** Deterministic train/valid/test split by md5 basis-point ranges
    * — stable as the corpus grows (docs never migrate splits). */
  def assignSplit(df: DataFrame, idCol: String,
                  ratiosBp: Seq[(String, Int)]): DataFrame =
    Mixing.assignSplit(df, idCol, ratiosBp)

  /** Turn a temperature-plan boost column (integer micros) into the
    * per-stratum keep rates a [[stratifiedSample]] consumes — rates
    * scale down vs the most-boosted stratum; exact integer cut. */
  def boostKeepRatesBp(boostMicros: Seq[(String, Long)])
      : Map[String, Int] =
    Mixing.boostKeepRatesBp(boostMicros)

  /** Concat-and-cut sequence packing: map each doc to its
    * budget-token training sequences (seq_start..seq_end + offset)
    * via a distributed two-level prefix sum over id order. */
  def packSequences(docs: DataFrame, idCol: String, tokensCol: String,
                    budget: Long, idStride: Long = 8192L): DataFrame =
    graft.operators.Mixing.packSequences(docs, idCol, tokensCol,
      budget, idStride)

  /** Per-batch line-count partial of the boilerplate screen (no
    * threshold); merge with [[mergeLineCounts]], threshold with
    * [[boilerplateFromCounts]] — the refresh path a production ingest
    * runs per committed batch instead of rescanning the corpus. */
  def lineCountPartial(batch: DataFrame, textCol: String): DataFrame =
    graft.operators.Dedup.lineCountPartial(batch, textCol)

  /** Merge [[lineCountPartial]] tables key-wise (sum-mergeable). */
  def mergeLineCounts(partials: Seq[DataFrame]): DataFrame =
    graft.operators.Dedup.mergeLineCounts(partials)

  /** Threshold a (merged) line-count table into the boilerplate set
    * `lineDedupAgainst` probes. */
  def boilerplateFromCounts(counts: DataFrame,
                            minCount: Int = 3): DataFrame =
    graft.operators.Dedup.boilerplateFromCounts(counts, minCount)

  /** Merge existing-gram-set partials (distinct union — idempotent,
    * associative, commutative; replay-safe). */
  def mergeGramSets(sets: Seq[DataFrame]): DataFrame =
    graft.operators.Dedup.mergeGramSets(sets)

  /** Per-batch (group, line)-keyed count partial of the PER-SITE
    * boilerplate screen; merge with [[mergeGroupedLineCounts]],
    * threshold with [[groupedBoilerplateFromCounts]]. */
  def groupedLineCountPartial(batch: DataFrame, groupCol: String,
                              textCol: String): DataFrame =
    graft.operators.Dedup.groupedLineCountPartial(batch, groupCol,
      textCol)

  /** Merge [[groupedLineCountPartial]] tables (group, line)-key-wise. */
  def mergeGroupedLineCounts(partials: Seq[DataFrame]): DataFrame =
    graft.operators.Dedup.mergeGroupedLineCounts(partials)

  /** Threshold a (merged) grouped line-count table into the per-group
    * boilerplate set [[groupedLineDedupAgainst]] probes. */
  def groupedBoilerplateFromCounts(counts: DataFrame,
                                   minCount: Int = 3): DataFrame =
    graft.operators.Dedup.groupedBoilerplateFromCounts(counts, minCount)

  /** Cut incoming lines that are boilerplate IN THEIR OWN GROUP —
    * the ingest-time per-site screen (null-safe group key). */
  def groupedLineDedupAgainst(incoming: DataFrame,
                              boilerplate: DataFrame, idCol: String,
                              groupCol: String,
                              textCol: String): DataFrame =
    graft.operators.Dedup.groupedLineDedupAgainst(incoming,
      boilerplate, idCol, groupCol, textCol)

  /** FAISS-style `add` for a persisted IVF-PQ index: encode a new
    * batch against the FROZEN codebooks and append to the cell
    * partitions — add-then-search equals the build that encoded the
    * union; periodic re-train is the separate compaction step. On a
    * MANIFESTED layout the refusals run inline (null ids, ids the
    * manifest already claims), but post-write sync CERTIFICATION is
    * deliberately CALLER-DRIVEN — run [[validateIvfPqNidManifest]]
    * at audit/recovery time, the fact stores' `validate = recovery`
    * posture; the crash ordering (manifest appends BEFORE codes)
    * keeps every uncertified window in the self-healing
    * over-approximation direction, never the silent-miss one. */
  def ivfPqAddBatch(newEmb: DataFrame, idCol: String, vecCol: String,
                    dir: String): Unit =
    graft.operators.Quantization.ivfPqAddBatch(newEmb, idCol, vecCol,
      dir)

  /** FAISS-style `remove_ids` for a persisted IVF-PQ layout — the
    * retraction path (takedowns, right-to-be-forgotten): rewrites
    * only the cell directories holding the removed ids, deletes
    * emptied cells; remove-then-search equals a build that never
    * encoded the vectors (codebooks stay frozen — retrain is the
    * separate step the imbalance factor schedules). As with
    * [[ivfPqAddBatch]], manifest sync certification is CALLER-DRIVEN
    * ([[validateIvfPqNidManifest]] at audit time): removals rewrite
    * the manifest AFTER the codes, so a crash between the two leaves
    * it over-approximating — later discoveries probe a few dead
    * cells and self-heal, never skip a live one. */
  def ivfPqRemoveBatch(removeIds: DataFrame, idCol: String,
                       dir: String): Unit =
    graft.operators.Quantization.ivfPqRemoveBatch(removeIds, idCol, dir)

  /** Retract documents from a per-doc fact snapshot (BM25 tf /
    * KN bigram): one anti-join IS the complete removal — every
    * corpus rollup derives downstream in the shared scorer, so the
    * result is row-for-row a fresh build on the remaining docs. */
  def retractDocs(snapshot: DataFrame, removeIds: DataFrame,
                  idCol: String = "doc_id"): DataFrame =
    graft.operators.Incremental.retractDocs(snapshot, removeIds, idCol)

  /** Refresh a prefix-cross index with a newly committed batch:
    * shingles append, df counts merge key-wise, only the prefix
    * postings re-derive — no existing text rescanned. */
  def refreshPrefixCrossIndex(idx: graft.operators.Dedup.PrefixCrossIndex,
                              batch: DataFrame, idCol: String,
                              textCol: String)
      : graft.operators.Dedup.PrefixCrossIndex =
    graft.operators.Dedup.refreshPrefixCrossIndex(idx, batch, idCol,
      textCol)

  /** Retract documents from a prefix-cross index — the removal
    * mirror of the refresh, also with no text rescanned: shingle
    * rows come from the index itself, df counts subtract key-wise,
    * only the prefix postings re-derive. */
  def retractPrefixCrossIndex(idx: graft.operators.Dedup.PrefixCrossIndex,
                              removeIds: DataFrame, idCol: String)
      : graft.operators.Dedup.PrefixCrossIndex =
    graft.operators.Dedup.retractPrefixCrossIndex(idx, removeIds, idCol)

  /** Subtract a retracted batch's line-count partial from a
    * maintained UNGROUPED count table — exact un-count; zeros drop,
    * negatives stay visible for [[validateLineCounts]]. Grouped
    * (grp, key) tables must go through
    * [[subtractGroupedLineCounts]]: this join keys on `key` alone,
    * and a line hash shared across groups would cross-multiply. */
  def subtractLineCounts(total: DataFrame, removed: DataFrame): DataFrame =
    graft.operators.Dedup.subtractLineCounts(total, removed)

  /** Per-site variant of [[subtractLineCounts]] ((grp, key) keys). */
  def subtractGroupedLineCounts(total: DataFrame,
                                removed: DataFrame): DataFrame =
    graft.operators.Dedup.subtractGroupedLineCounts(total, removed)

  /** Loud detector for count-table retraction contract violations
    * (negative counts: a batch retracted twice or never merged in). */
  def validateLineCounts(counts: DataFrame): Unit =
    graft.operators.Dedup.validateLineCounts(counts)

  /** Loud detector for prefix-cross-index df corruption (non-positive
    * dfs from doubly-subtracted or overlapping-partial state). */
  def validatePrefixCrossIndex(idx: graft.operators.Dedup.PrefixCrossIndex)
      : Unit =
    graft.operators.Dedup.validatePrefixCrossIndex(idx)

  /** Generic sum-rollup subtraction — the inverse of [[mergeRollups]]
    * for sum-mergeable state (min/max and distinct-set sketches are
    * NOT invertible; see the operator scaladoc). */
  def subtractRollups(total: DataFrame, removed: DataFrame,
                      keys: Seq[String], sums: Seq[String]): DataFrame =
    graft.operators.Incremental.subtractRollups(total, removed, keys,
      sums)

  /** Initialize (or reset) a DURABLE snapshot store: a per-doc fact
    * snapshot (tf / KN rows) persisted as a batch-partitioned
    * parquet layout, `dir/batch=<n>/` — the ivfPq persistence
    * discipline applied to the text-index families. Pass
    * `manifestIdCol` to also create the id→batch MANIFEST, which
    * scopes [[retractFromSnapshotStore]]'s discovery to one
    * doc-count-sized probe instead of a full-store id scan.
    * `validate` tiers the post-write certification: "full" (default)
    * certifies per operation, "recovery" defers it to audit time
    * (run [[validateSnapshotStoreManifest]] once then) — both land
    * byte-identical stores on a crash-free run. */
  def initSnapshotStore(snap: DataFrame, dir: String,
                        manifestIdCol: Option[String] = None,
                        validate: String = "full"): Unit =
    graft.operators.Incremental.initSnapshotStore(snap, dir,
      manifestIdCol, validate)

  /** Land a crawl batch's snapshot partial as its OWN partition
    * directory (landed data never rewritten); a duplicate batch id
    * refuses loudly — re-committing would duplicate markers. On a
    * manifested store `manifestIdCol` is REQUIRED (and refused
    * otherwise): a commit that skipped the manifest would silently
    * scope future retractions past its batch. */
  def commitSnapshotBatch(snap: DataFrame, dir: String, batch: Long,
                          manifestIdCol: Option[String] = None,
                          validate: String = "full"): Unit =
    graft.operators.Incremental.commitSnapshotBatch(snap, dir, batch,
      manifestIdCol, validate)

  /** Assert a manifested store's id→batch manifest is exactly in
    * sync with the store — the loud detector for the silent miss
    * (an id absent from the manifest would keep serving after its
    * retraction); [[compactSnapshotStore]]'s rebuild repairs. */
  def validateSnapshotStoreManifest(spark: SparkSession,
                                    dir: String): Unit =
    graft.operators.Incremental.validateSnapshotStoreManifest(spark,
      dir)

  /** Reload the full snapshot from a store, ready for the shared
    * scorers ([[bm25TopKIndexed]] / [[knScoreFromSnapshot]]) — no
    * other state to rebuild after a restart. */
  def loadSnapshotStore(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Incremental.loadSnapshotStore(spark, dir)

  /** File-level retraction from a snapshot store: only the batch
    * partitions holding the retracted ids rewrite (dynamic
    * overwrite); a retraction that would EMPTY a partition refuses
    * — see the operator scaladoc. */
  def retractFromSnapshotStore(spark: SparkSession, dir: String,
                               removeIds: DataFrame,
                               idCol: String = "doc_id",
                               validate: String = "full"): Unit =
    graft.operators.Incremental.retractFromSnapshotStore(spark, dir,
      removeIds, idCol, validate)

  /** Fold a snapshot store's batch partitions into a single batch-0
    * layout via the crash-safe tempdir swap — reader-invisible,
    * bounds the per-partial planning cost a long-lived store
    * accumulates, resets the batch-id space (the one sanctioned
    * rewrite of the append-only contract), and rebuilds the id
    * manifest exactly on a manifested store. */
  def compactSnapshotStore(spark: SparkSession, dir: String): Unit =
    graft.operators.Incremental.compactSnapshotStore(spark, dir)

  /** Fold an append-only ROLLUP store (sum-mergeable partials as
    * batch partitions; [[initSnapshotStore]]/[[commitSnapshotBatch]]
    * write it) to its current table — tombstones cancel key-wise,
    * zero rows drop, negatives survive for [[validateLineCounts]]. */
  def loadRollupStore(spark: SparkSession, dir: String,
                      keys: Seq[String], sums: Seq[String]): DataFrame =
    graft.operators.Incremental.loadRollupStore(spark, dir, keys, sums)

  /** Retract a slice from a rollup store by APPENDING its partial
    * negated — nothing landed is rewritten; the write path never
    * contends with readers. */
  def retractFromRollupStore(removedPartial: DataFrame, dir: String,
                             keys: Seq[String], sums: Seq[String],
                             batch: Long): Unit =
    graft.operators.Incremental.retractFromRollupStore(removedPartial,
      dir, keys, sums, batch)

  /** Fold a rollup store's partials into a single batch-0 layout —
    * bounds partition count on a long-lived store; reader-invisible. */
  def compactRollupStore(spark: SparkSession, dir: String,
                         keys: Seq[String], sums: Seq[String]): Unit =
    graft.operators.Incremental.compactRollupStore(spark, dir, keys,
      sums)

  /** Compaction-scheduling stats for a batch-partitioned store —
    * per-batch rows/tombstones plus store-level batch count, skew
    * and tombstone mass, with a `compact_due` verdict against the
    * caller's thresholds. The monitoring number that decides when
    * [[compactSnapshotStore]]/[[compactRollupStore]] pays. */
  def storeStats(spark: SparkSession, dir: String,
                 sums: Seq[String] = Nil, maxBatches: Int = 32,
                 maxTombstoneShare: Double = 0.10): DataFrame =
    graft.operators.Incremental.storeStats(spark, dir, sums,
      maxBatches, maxTombstoneShare)

  /** Register graft's SQL functions (`uuid5`, `title_case`) and the
    * codec-collapse optimizer rule on a session. */
  def install(spark: SparkSession): Unit = {
    graft.functions.NativeExpressions.register(spark)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+
        graft.plans.CollapseRedundantArrayOps
  }
}
