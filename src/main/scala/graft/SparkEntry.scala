package graft

import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, TextSql}
import graft.ljot.{LeftJoinOnTimeout, LeftJoinOnTimeoutConfig}
import graft.operators.{AsOfJoin, Corpus, DedupClusters, Multimodal, Relational, TextDedup, VectorOps}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 *
 * Every operator from SURVEY.md §2 (and the training-data extension set,
 * §7.2-M7) is exposed as a named batch query over the shared parquet
 * tables, with an ANSI-SQL oracle for the driver's DuckDB compare. Column
 * names are aliased identically on both sides (the compare sorts columns
 * by name before hashing). */
object SparkEntry {

  /** Join band D for the flagship left-join-on-timeout queries. */
  private val D = Duration.ofMinutes(5)
  private val ljotCfg = LeftJoinOnTimeoutConfig(D, Duration.ofMinutes(15))
  /** Lookback horizon for the as-of join query. */
  private val AsOfHorizon = Duration.ofMinutes(10)

  /** lhs/rhs of the flagship query: purchases left-joined to errors by user
   * within ±D (FIXTURES.md §2). value = event_id as string — mirrors the
   * reference's opaque string values (`LeftJoinOnTimeoutTest.java:201-208`)
   * with deterministic cross-engine formatting. */
  private def eventsSide(s: SparkSession, dir: String, eventType: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type") === eventType)
      .select(col("user_id").as("key"),
              col("event_id").cast("string").as("value"),
              col("ts"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
   * The driver builds this session itself, so the nanos-timestamp read
   * flag (see [[Tables.events]]) is set here — the one entry point whose
   * session build graft does not own. */
  def entry(spark: SparkSession): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Queries.ljotEvents(spark, "/root/testdata/sf0.001")
  }

  object Queries {
    /** O5: the novel operator, batch restatement — left-join-on-timeout of
     * purchase events to error events per user within ±D. */
    def ljotEvents(s: SparkSession, dir: String): DataFrame =
      LeftJoinOnTimeout(
        eventsSide(s, dir, "purchase"),
        eventsSide(s, dir, "error"),
        LeftJoinOnTimeout.testJoiner, ljotCfg)

    /** O4: windowed interval equi-join, inner form. */
    def intervalJoinInner(s: SparkSession, dir: String): DataFrame =
      LeftJoinOnTimeout.innerJoin(
        eventsSide(s, dir, "purchase"),
        eventsSide(s, dir, "error"),
        LeftJoinOnTimeout.testJoiner, ljotCfg)

    /** The anti-join (timeout-only) branch in isolation: lefts with NO
     * in-window right — semantically NOT EXISTS (SURVEY.md §2.1-O5). */
    def timeoutOnly(s: SparkSession, dir: String): DataFrame = {
      val l = eventsSide(s, dir, "purchase")
        .select(col("key").as("lkey"), col("value").as("lvalue"), col("ts").as("lts"))
      val r = eventsSide(s, dir, "error")
        .select(col("key").as("rkey"), col("ts").as("rts"))
      val dMs = D.toMillis
      l.join(r,
          col("lkey") === col("rkey") &&
            col("rts") >= expr(s"lts - INTERVAL $dMs MILLISECONDS") &&
            col("rts") <= expr(s"lts + INTERVAL $dMs MILLISECONDS"),
          "left_anti")
        .select(col("lkey").as("key"),
                concat(col("lvalue"), lit("+")).as("joined"),
                col("lts").as("ts"))
    }

    /** Text-analysis scalar pipeline (language-ID, quality, whitespace +
     * BPE-ish token counts, fingerprint) — no shuffle. The token array is
     * materialized ONCE through a Generate barrier
     * ([[TextFunctions.withTokens]]); the naive flat projection
     * re-tokenized per derived column after CollapseProject inlining. */
    def textStats(s: SparkSession, dir: String): DataFrame =
      TextFunctions.withTokens(Tables.documents(s, dir), "text", "toks").select(
        col("doc_id"),
        TextFunctions.tokenCountFromToks(col("toks")).as("n_tokens"),
        TextFunctions.tokenCountBpe(col("text")).as("n_tokens_bpe"),
        TextFunctions.langIdFromToks(col("toks")).as("lang_id"),
        TextFunctions.qualityScoreFromToks(col("text"), col("toks")).as("quality"),
        TextFunctions.fingerprintFromToks(col("toks")).as("fp"))

    /** Rolling-hash winnowing fingerprint per document — the
     * shift-invariant near-dup sketch (no shuffle; a dedup would
     * groupBy any shared minimal hash). */
    def fingerprintRolling(s: SparkSession, dir: String): DataFrame =
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextFunctions.rollingFingerprint(col("text")).as("rolling_fp"))
  }

  private val dMin = D.toMinutes

  private def eventsSideSql(eventType: String): String =
    s"SELECT user_id AS key, CAST(event_id AS VARCHAR) AS value, ts " +
      s"FROM events WHERE event_type = '$eventType'"

  /** One entry per implemented operator from SURVEY.md §2 + §7.2-M7. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // reference operator surface (LJOT)
    "ljot_events"         -> ((s, d) => Queries.ljotEvents(s, d)),
    "interval_join_inner" -> ((s, d) => Queries.intervalJoinInner(s, d)),
    // symmetric completion of the interval family: right-side orphans too
    "interval_join_full"  -> ((s, d) => LeftJoinOnTimeout.fullOuterJoin(
      eventsSide(s, d, "purchase"), eventsSide(s, d, "error"), ljotCfg)),
    "timeout_only"        -> ((s, d) => Queries.timeoutOnly(s, d)),
    "asof_purchase_error" -> ((s, d) => AsOfJoin.backward(
      eventsSide(s, d, "purchase"), eventsSide(s, d, "error"), AsOfHorizon)),
    // forward mirror: each error's NEXT purchase within the horizon
    // (time-to-recovery alignment)
    "asof_error_recovery" -> ((s, d) => AsOfJoin.forward(
      eventsSide(s, d, "error"), eventsSide(s, d, "purchase"), AsOfHorizon)),
    // approximate aggregate — algorithm-specific, no SQL oracle (driver
    // records the weaker rows-only check)
    "approx_distinct_users" -> ((s, d) =>
      Tables.events(s, d).groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("n_users_approx"))),
    // deterministic KMV bottom-k sketch — the oracle-checkable
    // approximate-distinct (Relational.kmvDistinctUsers)
    "kmv_distinct_users"  -> ((s, d) => Relational.kmvDistinctUsers(s, d)),
    // the same sketch as a native TypedImperativeAggregate: one
    // partial-agg pass, O(k) state, no distinct shuffle or window sort —
    // and still FULLY hash-checked (KMV bottom-k is merge-order-free)
    "kmv_distinct_agg"    -> ((s, d) => Relational.kmvDistinctAggUsers(s, d)),
    // the grouped sketch form: distinct users per (event_type, day) —
    // k = 48 so sf0.01 groups (42-67 distinct) exercise BOTH branches
    "kmv_users_by_day"    -> ((s, d) => Relational.kmvUsersByDay(s, d)),
    // estimator-error audit: exact distinct vs the KMV estimate per
    // event_type (the ann_recall-style design-point check of the sketch)
    "kmv_error_audit"     -> ((s, d) => Relational.kmvErrorAudit(s, d)),
    // design-point guarantee audits for the three rows-only sketches:
    // SQL-derivable exact values + bounds, sketch-dependent booleans that
    // the sketch's deterministic guarantee forces true — the hash-green
    // accuracy gate for HLL / GK / MG (round-12 verdict item #3)
    "hll_error_audit"     -> ((s, d) => Relational.hllErrorAudit(s, d)),
    "gk_error_audit"      -> ((s, d) => Corpus.gkErrorAudit(Tables.documents(s, d))),
    "mg_error_audit"      -> ((s, d) => Corpus.mgErrorAudit(Tables.documents(s, d))),
    // Count-Min point-frequency sketch: LINEAR, so the oracle rebuilds
    // the exact grid relationally and hash-checks the sketch's INTERIOR
    // estimates — value-level coverage the HLL/GK/MG audits can't have
    "cm_error_audit"      -> ((s, d) => Corpus.cmErrorAudit(Tables.documents(s, d))),
    // trailing-7-day rolling distinct users: per-day KMV sketches merged
    // RELATIONALLY per window (bottom-k of a union = bottom-k of the
    // per-day bottom-k's) — exact rolling distinct is unaffordable at
    // raw scale; this is one corpus pass + an O(days*k)-row merge
    "kmv_rolling_users"   -> ((s, d) => Relational.kmvRollingUsers(s, d)),
    // set-operation estimation from per-side sketches: |A∪B| and |A∩B|
    // of purchase-vs-error user sets from two O(k) arrays (the
    // join-cardinality pricing primitive), with exact audit columns
    "kmv_overlap_audit"   -> ((s, d) => Relational.kmvOverlapAudit(s, d)),
    // corpus distribution profiling: EXACT per-language length quantiles
    // (Spark `percentile` and DuckDB `quantile_cont` share the R-7
    // linear-interpolation definition — verified value-identical)
    "length_quantiles" -> ((s, d) =>
      Tables.documents(s, d).groupBy(col("lang"))
        .agg(percentile(col("n_chars"), lit(0.25)).as("q25"),
          percentile(col("n_chars"), lit(0.5)).as("q50"),
          percentile(col("n_chars"), lit(0.9)).as("q90"),
          count(lit(1)).as("n_docs"))),
    // the EXACT scale path for bounded-cardinality columns: one
    // histogram pass (state O(distinct values), not O(rows)), quantiles
    // read off the cumulative counts — bit-identical to length_quantiles
    "length_quantiles_hist" -> ((s, d) =>
      Corpus.lengthQuantilesHist(Tables.documents(s, d))),
    // the raw-scale form of length_quantiles: `approx_percentile` is a
    // mergeable GK sketch with bounded per-group state (vs `percentile`
    // buffering every group value — a memory hazard when a group holds
    // billions of rows at 100 TB). Sketch results are engine-specific, so
    // no SQL oracle (rows-only check); exactness is pinned by the sbt
    // spec asserting accuracy-bound agreement with the exact query.
    "length_quantiles_approx" -> ((s, d) =>
      Tables.documents(s, d).groupBy(col("lang"))
        .agg(approx_percentile(col("n_chars"), lit(0.25), lit(10000)).as("q25"),
          approx_percentile(col("n_chars"), lit(0.5), lit(10000)).as("q50"),
          approx_percentile(col("n_chars"), lit(0.9), lit(10000)).as("q90"),
          count(lit(1)).as("n_docs"))),
    // text analysis + dedup (training-data pipeline ops)
    "text_stats"          -> ((s, d) => Queries.textStats(s, d)),
    "fingerprint_rolling" -> ((s, d) => Queries.fingerprintRolling(s, d)),
    "dedup_exact"         -> ((s, d) => TextDedup.exact(Tables.documents(s, d))),
    "dedup_minhash_lsh"   -> ((s, d) => TextDedup.minhashLsh(Tables.documents(s, d))),
    "minhash_sig_audit"   -> ((s, d) => TextDedup.minhashSigAudit(Tables.documents(s, d))),
    // threshold-tuning curve: exact-Jaccard histogram of surviving pairs
    "neardup_sim_hist"    -> ((s, d) => TextDedup.neardupSimHist(Tables.documents(s, d))),
    "dedup_simhash"       -> ((s, d) => TextDedup.simhashDedupAuto(Tables.documents(s, d))),
    "dedup_ngram_jaccard" -> ((s, d) => TextDedup.ngramJaccard(Tables.documents(s, d))),
    // asymmetric overlap: catches a short doc lifted into a long one,
    // which union-normalized Jaccard scores near zero
    "ngram_containment"   -> ((s, d) => TextDedup.ngramContainment(Tables.documents(s, d))),
    // incremental (cross-corpus) dedup: new crawl vs existing corpus
    "dedup_incremental"   -> ((s, d) => TextDedup.incremental(Tables.documents(s, d))),
    // sub-document (line-level) boilerplate removal
    "line_dedup"          -> ((s, d) => TextDedup.lineDedup(Tables.documents(s, d))),
    // shift-invariant substring dedup (winnowing / MOSS sketch)
    "dedup_winnow"        -> ((s, d) => TextDedup.winnowDedup(Tables.documents(s, d))),
    // EXACT duplicated-substring spans at arbitrary alignment (stride-1
    // windows — the Lee et al. 2022 ExactSubstr half next to line_dedup)
    "dedup_substr"        -> ((s, d) => TextDedup.substrDedup(Tables.documents(s, d))),
    "ngram_novelty"       -> ((s, d) => TextDedup.ngramNovelty(Tables.documents(s, d))),
    // cluster assignment over the minhash pair graph (connected
    // components); the four cluster-family queries share the
    // session-memoized labeling (DedupClusters.minhashLabels) — same
    // audited plan on a cold session, no recompute per consumer
    "dedup_clusters"      -> ((s, d) => DedupClusters.minhashLabels(Tables.documents(s, d))),
    "cluster_keepers"     -> ((s, d) => DedupClusters.keepersFromLabeled(
      DedupClusters.minhashLabels(Tables.documents(s, d)), Tables.documents(s, d))),
    // leakage-safe split: train/val/test hashed on the dup CLUSTER id
    "cluster_safe_split"  -> ((s, d) => Corpus.clusterSafeSplit(
      DedupClusters.minhashLabels(Tables.documents(s, d)))),
    // per-source token-mass savings forecast of cluster-collapse dedup
    "dedup_savings"       -> ((s, d) => DedupClusters.dedupSavingsFromLabeled(
      DedupClusters.minhashLabels(Tables.documents(s, d)), Tables.documents(s, d))),
    // corpus management: quality pre-filter + deterministic splits
    "quality_filter"      -> ((s, d) => Corpus.qualityFilter(Tables.documents(s, d))),
    // the end-to-end capstone: quality pass -> exact-dedup keeper ->
    // temperature-mixed source sampling -> (shard, pos) training order
    "epoch_plan"          -> ((s, d) => Corpus.epochPlan(Tables.documents(s, d))),
    "sample_split"        -> ((s, d) => Corpus.sampleSplit(Tables.documents(s, d))),
    // deterministic global training-order shuffle -> (shard, pos) addresses
    "global_shuffle"      -> ((s, d) => Corpus.globalShuffle(Tables.documents(s, d))),
    "stratified_sample"   -> ((s, d) => Corpus.stratifiedSample(Tables.documents(s, d))),
    "decontaminate"       -> ((s, d) => Corpus.decontaminate(Tables.documents(s, d))),
    // Bloom pre-screen + exact gram-join verify on the flagged sliver —
    // deterministic (no false negatives => equals `decontaminate`), checked
    // against the exact decontamination oracle
    "bloom_decontaminate" -> ((s, d) => Corpus.bloomDecontaminateVerified(Tables.documents(s, d))),
    // the raw scan-side membership screen — approximate (no-false-negative
    // superset of `decontaminate`), rows-only like the HLL twin
    "bloom_screen_raw"    -> ((s, d) => Corpus.bloomDecontaminate(Tables.documents(s, d))),
    // sequence packing: docs -> (bucket, bin, offset) under a token budget
    "pack_sequences"      -> ((s, d) => Corpus.packSequences(Tables.documents(s, d))),
    "pii_scan"            -> ((s, d) => Corpus.piiScan(Tables.documents(s, d))),
    "pii_redact"          -> ((s, d) => Corpus.piiRedact(Tables.documents(s, d))),
    "repetition_stats"    -> ((s, d) => Corpus.repetitionStats(Tables.documents(s, d))),
    // corpus profiling: training-mixture table + vocabulary heavy hitters
    "source_mix"          -> ((s, d) => Corpus.sourceMix(Tables.documents(s, d))),
    // per-language tokenizer fertility (chars/token, tokens/word)
    "token_fertility"     -> ((s, d) => Corpus.tokenFertility(Tables.documents(s, d))),
    // per-doc duplicated-content fraction over the shared sampled grams
    "doc_dup_fraction"    -> ((s, d) => TextDedup.dupFraction(Tables.documents(s, d))),
    "dup_rate_by_source"  -> ((s, d) => Corpus.dupRateBySource(Tables.documents(s, d))),
    // mirror-vs-repost: near-dup pairs classified by their source pair
    "neardup_source_mix"  -> ((s, d) => TextDedup.neardupSourceMix(Tables.documents(s, d))),
    "lang_confusion"      -> ((s, d) => Corpus.langConfusion(Tables.documents(s, d))),
    "vocab_topk"          -> ((s, d) => Corpus.vocabTopK(Tables.documents(s, d))),
    // first-iteration BPE merge statistics: adjacent char pairs weighted
    // by token frequency, counted over the O(vocab) word-frequency
    // relation (the Sennrich trick) — never the raw character stream
    "bpe_merge_topk"      -> ((s, d) => Corpus.bpeMergeCandidates(Tables.documents(s, d))),
    // the iterated merge LOOP: top pair applied relationally to the
    // O(vocab) symbol relation, recounted, k times — no corpus re-scan
    "bpe_merges_iter"     -> ((s, d) => Corpus.bpeMerges(Tables.documents(s, d))),
    // per-language Zipf exponent over the bounded frequency head —
    // integer floor-log2 regression sums, one final IEEE divide
    "zipf_slope"          -> ((s, d) => Corpus.zipfSlope(Tables.documents(s, d))),
    // sequence-length curriculum: exact quartile stages in (n_tokens,
    // doc_id) order with NO global sort (two-level bucket positions)
    "curriculum_stages"   -> ((s, d) => Corpus.curriculumStages(Tables.documents(s, d))),
    // per-doc char-distribution entropy (gibberish/base64 detector) —
    // bounded-alphabet length-replace counts, zero explode, zero shuffle
    "char_entropy"        -> ((s, d) => Corpus.charEntropy(Tables.documents(s, d))),
    // per-shard source balance of the deterministic training shuffle —
    // the data-loader order-bias audit; O(shards) output
    "shard_mix_audit"     -> ((s, d) => Corpus.shardMixAudit(Tables.documents(s, d))),
    // per-language token-length histogram (subword fragmentation curve)
    "token_len_hist"      -> ((s, d) => Corpus.tokenLenHist(Tables.documents(s, d))),
    // dup-cluster size distribution over the memoized CC labeling;
    // includes singletons so the histogram conserves the corpus size
    "cluster_size_hist"   -> ((s, d) => DedupClusters.clusterSizeHist(Tables.documents(s, d))),
    // tokenizer coverage: per-language OOV rate vs the broadcast top-V vocab
    "oov_rate"            -> ((s, d) => Corpus.oovRate(Tables.documents(s, d))),
    // per-language token-budget rebalance + per-doc TF-IDF distinctive terms
    "budget_sample"       -> ((s, d) => Corpus.budgetSample(Tables.documents(s, d))),
    "tfidf_topk"          -> ((s, d) => Corpus.tfidfTopK(Tables.documents(s, d))),
    // collocation mining: corpus-wide bigram heavy hitters
    "bigram_topk"         -> ((s, d) => Corpus.bigramTopK(Tables.documents(s, d))),
    // observed/expected collocation score (un-logged PMI — integer-exact)
    "colloc_lift"         -> ((s, d) => Corpus.collocLift(Tables.documents(s, d))),
    // per-group top-k via WindowGroupLimit rank pushdown
    "top_docs_per_source" -> ((s, d) => Corpus.topDocsPerSource(Tables.documents(s, d))),
    // per-language length-distribution outliers (exact-moment z-score)
    "length_outliers"     -> ((s, d) => Corpus.lengthOutliers(Tables.documents(s, d))),
    // τ=0.5 temperature source-mixing weights (sqrt smoothing)
    "mix_weights"         -> ((s, d) => Corpus.mixWeights(Tables.documents(s, d))),
    // context-window chunking with overlap (retrieval / long-doc splitting)
    "doc_chunks"          -> ((s, d) => Corpus.docChunks(Tables.documents(s, d))),
    // domain-level quality profile + keep verdict (drop bad domains wholesale)
    "source_quality"      -> ((s, d) => Corpus.sourceQuality(Tables.documents(s, d))),
    // robust (median/MAD) per-language length score + outlier flag
    "robust_length_score" -> ((s, d) => Corpus.robustLengthScore(Tables.documents(s, d))),
    // quantized unigram-LM surprisal quality profile (CCNet-style filter)
    "doc_surprisal"       -> ((s, d) => Corpus.docSurprisal(Tables.documents(s, d))),
    // exact shingle-Jaccard top-k document retrieval (bounded query set)
    "text_simsearch"      -> ((s, d) => TextDedup.simSearch(Tables.documents(s, d))),
    // vector similarity
    "emb_neardup"         -> ((s, d) => VectorOps.embeddingNearDup(Tables.embeddings(s, d))),
    // incremental (new-batch x standing-corpus) semantic dedup: cross-
    // side-only band candidates, old buckets capped — the vector twin
    // of dedup_incremental
    "semantic_incremental" -> ((s, d) => VectorOps.semanticIncremental(Tables.embeddings(s, d))),
    // semantic dedup: cluster-then-prune per-vector keep verdict (SemDeDup)
    "semantic_dedup"      -> ((s, d) => VectorOps.semanticDedup(Tables.embeddings(s, d))),
    "ann_brute_topk"      -> ((s, d) => VectorOps.annBruteTopK(Tables.embeddings(s, d))),
    // kNN majority-vote auto-labeling over the bounded query set
    "knn_label"           -> ((s, d) => VectorOps.knnLabel(Tables.embeddings(s, d))),
    "hard_negatives"      -> ((s, d) => VectorOps.hardNegatives(Tables.embeddings(s, d))),
    "ann_lsh_topk"        -> ((s, d) => VectorOps.annLshTopK(Tables.embeddings(s, d))),
    "ann_ivf_topk"        -> ((s, d) => VectorOps.annIvfTopK(Tables.embeddings(s, d))),
    // ANN QA: measured recall of the LSH path vs the brute ground truth
    "ann_recall"          -> ((s, d) => VectorOps.annRecall(Tables.embeddings(s, d))),
    // storage-precision audit: int8-grade vs full-precision top-k overlap
    "quant_recall_audit"  -> ((s, d) => VectorOps.quantRecallAudit(Tables.embeddings(s, d))),
    // k-means E-step over the seed centroids (curriculum / mixture partitioning)
    "kmeans_assign"       -> ((s, d) => VectorOps.kmeansAssign(Tables.embeddings(s, d))),
    // k-means M-step: refined per-cell centroids over the E-step labeling
    "kmeans_refine"       -> ((s, d) => VectorOps.kmeansRefine(Tables.embeddings(s, d))),
    // IVF inverted-list balance (probe-latency skew check)
    "ivf_balance"         -> ((s, d) => VectorOps.ivfBalance(Tables.embeddings(s, d))),
    // embedding QA: per-label norm profile + degenerate-vector counts
    "emb_norm_profile"    -> ((s, d) => VectorOps.embNormProfile(Tables.embeddings(s, d))),
    "label_centroids"     -> ((s, d) => VectorOps.labelCentroids(Tables.embeddings(s, d))),
    "emb_covariance"      -> ((s, d) => VectorOps.embCovariance(Tables.embeddings(s, d))),
    "emb_pca_power"       -> ((s, d) => VectorOps.embPcaPower(Tables.embeddings(s, d))),
    "emb_pca_topk"        -> ((s, d) => VectorOps.embPcaTopk(Tables.embeddings(s, d))),
    "pca_residual_outliers" -> ((s, d) => VectorOps.pcaResidualOutliers(Tables.embeddings(s, d))),
    "lsh_band_curve"      -> ((s, d) => VectorOps.lshBandCurve(Tables.embeddings(s, d))),
    "label_spectral_drift" -> ((s, d) => VectorOps.labelSpectralDrift(Tables.embeddings(s, d))),
    // embedding-space benchmark decontamination (semantic twin of the gram screen)
    "semantic_decontaminate" -> ((s, d) => VectorOps.semanticDecontaminate(Tables.embeddings(s, d))),
    // RAG capstone: chunk -> deterministic embed -> IVF build -> bounded
    // cross-document top-k, one lazy plan (the epoch_plan of retrieval)
    "retrieval_plan"      -> ((s, d) => VectorOps.retrievalPlan(Tables.documents(s, d))),
    // multimodal plumbing
    "mm_features"         -> ((s, d) => Multimodal.features(Tables.documents(s, d))),
    // checksum-first exact dedup of binary media payloads
    "mm_payload_dedup"    -> ((s, d) => Multimodal.payloadDedup(Tables.documents(s, d))),
    // perceptual (histogram-SimHash) near-dup over the binary payload —
    // the near-dup completion of the checksum pass
    "mm_phash_neardup"    -> ((s, d) => Multimodal.phashNearDup(Tables.documents(s, d))),
    // relational built-in coverage (SURVEY.md §2.2)
    "q1_pricing"          -> ((s, d) => Relational.pricingSummary(s, d)),
    "shipping_priority"   -> ((s, d) => Relational.shippingPriority(s, d)),
    "topk_orders"         -> ((s, d) => Relational.topOrdersPerSegment(s, d)),
    "revenue_nation"      -> ((s, d) => Relational.revenueByNation(s, d)),
    "semi_big_spenders"   -> ((s, d) => Relational.bigSpenders(s, d)),
    "anti_no_orders"      -> ((s, d) => Relational.customersWithoutOrders(s, d)),
    "setop_intersect"     -> ((s, d) => Relational.activeHighBalance(s, d)),
    "setop_except"        -> ((s, d) => Relational.inactiveHighBalance(s, d)),
    "scalar_part"         -> ((s, d) => Relational.partScalars(s, d)),
    "orders_by_month"     -> ((s, d) => Relational.ordersByMonth(s, d)),
    "json_event_props"    -> ((s, d) => Relational.eventProps(s, d)),
    "window_running_rev"  -> ((s, d) => Relational.runningRevenue(s, d)),
    // RANGE-frame window: per-user trailing-hour spend
    "window_trailing_hour" -> ((s, d) => Relational.trailingHourValue(s, d)),
    // gap-based sessionization (batch twin of the streaming session_window)
    "sessionize_events"   -> ((s, d) => Relational.sessionizeEvents(s, d)),
    // session-local Markov transition matrix over event types
    "session_transitions" -> ((s, d) => Relational.sessionTransitions(s, d)),
    // duplicate-click / redelivery suppression (burst collapse)
    "debounce_events"     -> ((s, d) => Relational.debounceEvents(s, d)),
    // feature-store densification: per-user daily grid with LOCF fill
    "gap_fill_locf"       -> ((s, d) => Relational.gapFillLocf(s, d)),
    // per-hour peak concurrent sessions (interval sweep, two-level prefix)
    "peak_concurrency"    -> ((s, d) => Relational.peakConcurrency(s, d)),
    // hourly ingestion-rate anomalies per event type (pipeline health)
    "event_rate_outliers" -> ((s, d) => Relational.eventRateOutliers(s, d)),
    "event_value_hist"    -> ((s, d) => Relational.eventValueHistogram(s, d)),
    "user_retention"      -> ((s, d) => Relational.userRetention(s, d)),
    // robust (median, MAD) dispersion per event type
    "event_value_mad"     -> ((s, d) => Relational.eventValueMad(s, d)),
    // step-function integral: time-weighted average value per user
    "time_weighted_value" -> ((s, d) => Relational.timeWeightedValue(s, d)),
    // financial reconciliation: stored vs recomputed order totals
    "order_price_audit"   -> ((s, d) => Relational.orderPriceAudit(s, d)),
    // DAU/WAU engagement rollup with stickiness ratio
    "active_users_rollup" -> ((s, d) => Relational.activeUsersRollup(s, d)),
    // (dow, hour) load heatmap with uniform-expectation load factor
    "hourly_seasonality"  -> ((s, d) => Relational.hourlySeasonality(s, d)),
    // gaps-and-islands run collapsing into SCD2 validity intervals
    "value_islands"       -> ((s, d) => Relational.valueIslands(s, d)),
    // leakage-free point-in-time state lookup over the SCD2 islands
    "pit_state_lookup"    -> ((s, d) => Relational.pitStateLookup(s, d)),
    // rational-arithmetic behavioral diversity (Gini, not entropy)
    "user_type_gini"      -> ((s, d) => Relational.userTypeGini(s, d)),
    // top-1-per-group via partial-agg struct-max (no window sort)
    "latest_order_profile" -> ((s, d) => Relational.latestOrderProfile(s, d)),
    // fixed-n content-hash sample per stratum (WindowGroupLimit)
    "sample_per_source"   -> ((s, d) => Corpus.samplePerSource(Tables.documents(s, d))),
    // fabricated-numbers screen over exact cents
    "benford_profile"     -> ((s, d) => Relational.benfordProfile(s, d)),
    // referential-integrity audit over every FK edge of the star schema
    "fk_orphans"          -> ((s, d) => Relational.fkOrphans(s, d)),
    // lag-1 Pearson persistence of each type's hourly arrival series
    "hourly_autocorr"     -> ((s, d) => Relational.hourlyAutocorr(s, d)),
    // per-column null/blank/distinct schema-health profile
    "null_profile"        -> ((s, d) => Corpus.nullProfile(Tables.documents(s, d))),
    // raw-scale twin of null_profile's distinct column: per-column KMV
    // cardinality estimates, one scan, O(k)-per-column exchange
    "sketch_profile"      -> ((s, d) => Corpus.sketchProfile(Tables.documents(s, d))),
    // snapshot-diff audit: added/removed/changed/unchanged per source
    // between two (deterministically derived) corpus versions
    "corpus_diff"         -> ((s, d) => Corpus.corpusDiff(Tables.documents(s, d))),
    "dsir_weights"        -> ((s, d) => Corpus.dsirWeights(Tables.documents(s, d))),
    "bigram_surprisal"    -> ((s, d) => Corpus.bigramSurprisal(Tables.documents(s, d))),
    "filter_funnel"       -> ((s, d) => Corpus.filterFunnel(Tables.documents(s, d))),
    "pack_audit"          -> ((s, d) => Corpus.packAudit(Tables.documents(s, d))),
    "vocab_coverage"      -> ((s, d) => Corpus.vocabCoverage(Tables.documents(s, d))),
    // certified vocabulary heavy hitters: MG sketch nominates ≤k candidates,
    // one broadcast re-count join restores exact counts — deterministic,
    // hash-checked (the KMV find-then-verify move applied to Misra-Gries)
    "mg_heavy_hitters"    -> ((s, d) => Corpus.mgHeavyHitters(Tables.documents(s, d))),
    // grouped MG: per-language certified hitters (stopword/domain-term
    // discovery), same sketch-then-exact-recount shape per language
    "mg_hitters_by_lang"  -> ((s, d) => Corpus.mgHittersByLang(Tables.documents(s, d))),
    // the raw one-pass sketch forms (est within ±n/(k+1), merge-order-
    // dependent → rows-only check; the sbt spec pins the bounds)
    "mg_hitters_raw"      -> ((s, d) => Corpus.mgHittersSketch(Tables.documents(s, d))),
    "mg_hitters_by_lang_raw" -> ((s, d) => Corpus.mgHittersByLangSketch(Tables.documents(s, d))),
    // repeated document openings per source (scraped-site boilerplate)
    "boilerplate_prefixes" -> ((s, d) => Corpus.boilerplatePrefixes(Tables.documents(s, d))),
    // top-spender segmentation: exact totals + NTILE decile
    "user_ltv_deciles"    -> ((s, d) => Relational.userLtvDeciles(s, d)),
    // staged conversion funnel (view -> click -> purchase, strictly ordered)
    "funnel_stages"       -> ((s, d) => Relational.funnelStages(s, d)),
    // per-type inter-arrival gap profile (lag window + rollup)
    "interevent_gaps"     -> ((s, d) => Relational.intereventGaps(s, d)),
    // wide cross-tab: languages x pinned source list, single agg pass
    "doc_source_pivot"    -> ((s, d) => Relational.docSourcePivot(s, d)),
    // CUBE subtotals over (status, priority)
    "orders_cube"         -> ((s, d) => Relational.ordersCube(s, d)),
    "rollup_customers"    -> ((s, d) => Relational.customerRollup(s, d)),
    "distinct_customers"  -> ((s, d) => Relational.distinctCustomers(s, d)),
    // key-skew profile: heavy hitters on the flagship join key
    "skew_profile"        -> ((s, d) => Relational.eventKeySkew(s, d)),
    "skew_join_salted"    -> ((s, d) => Relational.saltedSegmentJoin(s, d)),
    "format_roundtrip"    -> ((s, d) => graft.sources.TextFormats.formatRoundtrip(s, d)),
    // deepest join tree in the suite: 2 facts + 5 broadcast dimension arms
    "market_share"        -> ((s, d) => Relational.marketShare(s, d)),
    // before/after window contrast: step changes in hourly arrival rates
    "level_shift"         -> ((s, d) => Relational.levelShiftDetect(s, d)),
    // order-independent per-source corpus audit fingerprint
    "corpus_checksum"     -> ((s, d) => Corpus.corpusChecksum(Tables.documents(s, d))),
    // edit-distance near-dup pairs over normalized document openings
    "fuzzy_prefix_dedup"  -> ((s, d) => TextDedup.fuzzyPrefixDedup(Tables.documents(s, d))),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
   * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "ljot_events" ->
      s"""SELECT l.key AS key, concat(l.value, '+', coalesce(r.value, '')) AS joined, l.ts AS ts
         |FROM (${eventsSideSql("purchase")}) l
         |LEFT JOIN (${eventsSideSql("error")}) r
         |ON l.key = r.key AND r.ts BETWEEN l.ts - INTERVAL $dMin MINUTE AND l.ts + INTERVAL $dMin MINUTE""".stripMargin,
    "interval_join_inner" ->
      s"""SELECT l.key AS key, concat(l.value, '+', r.value) AS joined, l.ts AS ts
         |FROM (${eventsSideSql("purchase")}) l
         |JOIN (${eventsSideSql("error")}) r
         |ON l.key = r.key AND r.ts BETWEEN l.ts - INTERVAL $dMin MINUTE AND l.ts + INTERVAL $dMin MINUTE""".stripMargin,
    "interval_join_full" ->
      s"""SELECT coalesce(l.key, r.key) AS key, l.value AS lvalue, r.value AS rvalue,
         |       l.ts AS lts, r.ts AS rts
         |FROM (${eventsSideSql("purchase")}) l
         |FULL JOIN (${eventsSideSql("error")}) r
         |ON l.key = r.key AND r.ts BETWEEN l.ts - INTERVAL $dMin MINUTE AND l.ts + INTERVAL $dMin MINUTE""".stripMargin,
    "timeout_only" ->
      s"""SELECT l.key AS key, concat(l.value, '+') AS joined, l.ts AS ts
         |FROM (${eventsSideSql("purchase")}) l
         |WHERE NOT EXISTS (SELECT 1 FROM (${eventsSideSql("error")}) r
         |  WHERE r.key = l.key AND r.ts BETWEEN l.ts - INTERVAL $dMin MINUTE AND l.ts + INTERVAL $dMin MINUTE)""".stripMargin,
    "asof_purchase_error" ->
      AsOfJoin.backwardSql(eventsSideSql("purchase"), eventsSideSql("error"), AsOfHorizon),
    "asof_error_recovery" ->
      AsOfJoin.forwardSql(eventsSideSql("error"), eventsSideSql("purchase"), AsOfHorizon),
    "text_stats" ->
      s"""SELECT doc_id, ${TextSql.tokenCount("text")} AS n_tokens,
         | ${TextSql.tokenCountBpe("text")} AS n_tokens_bpe,
         | ${TextSql.langId("text")} AS lang_id,
         | ${TextSql.qualityScore("text")} AS quality,
         | ${TextSql.fingerprint("text")} AS fp
         |FROM documents""".stripMargin,
    "fingerprint_rolling" -> TextSql.rollingFingerprintSql("documents"),
    "length_quantiles" ->
      """SELECT lang, quantile_cont(n_chars, 0.25) AS q25,
        | quantile_cont(n_chars, 0.5) AS q50,
        | quantile_cont(n_chars, 0.9) AS q90,
        | count(*) AS n_docs
        |FROM documents GROUP BY lang""".stripMargin,
    // deliberately the SAME oracle text as length_quantiles: the
    // histogram plan must be value-indistinguishable from the buffering one
    "length_quantiles_hist" ->
      """SELECT lang, quantile_cont(n_chars, 0.25) AS q25,
        | quantile_cont(n_chars, 0.5) AS q50,
        | quantile_cont(n_chars, 0.9) AS q90,
        | count(*) AS n_docs
        |FROM documents GROUP BY lang""".stripMargin,
    "dedup_exact"         -> TextDedup.exactSql("documents"),
    "dedup_minhash_lsh"   -> TextDedup.minhashLshSql("documents"),
    "minhash_sig_audit"   -> TextDedup.minhashSigAuditSql("documents"),
    "neardup_sim_hist"    -> TextDedup.neardupSimHistSql("documents"),
    "dedup_simhash"       -> TextDedup.simhashDedupSql("documents"),
    "dedup_ngram_jaccard" -> TextDedup.ngramJaccardSql("documents"),
    "ngram_containment"   -> TextDedup.ngramContainmentSql("documents"),
    "dedup_incremental"   -> TextDedup.incrementalSql("documents"),
    "line_dedup"          -> TextDedup.lineDedupSql("documents"),
    "dedup_winnow"        -> TextDedup.winnowDedupSql("documents"),
    "dedup_substr"        -> TextDedup.substrDedupSql("documents"),
    "ngram_novelty"       -> TextDedup.ngramNoveltySql("documents"),
    "dedup_clusters"      -> DedupClusters.assignSql("documents", TextDedup.minhashLshSql("documents")),
    "cluster_keepers"     -> DedupClusters.keepersSql("documents", TextDedup.minhashLshSql("documents")),
    "cluster_safe_split"  -> Corpus.clusterSafeSplitSql(
      DedupClusters.assignSql("documents", TextDedup.minhashLshSql("documents"))),
    "quality_filter"      -> Corpus.qualityFilterSql("documents"),
    "epoch_plan"          -> Corpus.epochPlanSql("documents"),
    "sample_split"        -> Corpus.sampleSplitSql("documents"),
    "global_shuffle"      -> Corpus.globalShuffleSql("documents"),
    "stratified_sample"   -> Corpus.stratifiedSampleSql("documents"),
    "decontaminate"       -> Corpus.decontaminateSql("documents"),
    // the bloom pre-screen is exact-verified, so its oracle IS the exact
    // decontamination query (superset screen -> exact prune = same rows)
    "bloom_decontaminate" -> Corpus.decontaminateSql("documents"),
    "pack_sequences"      -> Corpus.packSequencesSql("documents"),
    "pii_scan"            -> Corpus.piiScanSql("documents"),
    "pii_redact"          -> Corpus.piiRedactSql("documents"),
    "repetition_stats"    -> Corpus.repetitionStatsSql("documents"),
    "source_mix"          -> Corpus.sourceMixSql("documents"),
    "token_fertility"     -> Corpus.tokenFertilitySql("documents"),
    "doc_dup_fraction"    -> TextDedup.dupFractionSql("documents"),
    "dup_rate_by_source"  -> Corpus.dupRateBySourceSql("documents"),
    "neardup_source_mix"  -> TextDedup.neardupSourceMixSql("documents"),
    "lang_confusion"      -> Corpus.langConfusionSql("documents"),
    "vocab_topk"          -> Corpus.vocabTopKSql("documents"),
    "bpe_merge_topk"      -> Corpus.bpeMergeCandidatesSql("documents"),
    "bpe_merges_iter"     -> Corpus.bpeMergesSql("documents"),
    "zipf_slope"          -> Corpus.zipfSlopeSql("documents"),
    "curriculum_stages"   -> Corpus.curriculumStagesSql("documents"),
    "char_entropy"        -> Corpus.charEntropySql("documents"),
    "shard_mix_audit"     -> Corpus.shardMixAuditSql("documents"),
    "token_len_hist"      -> Corpus.tokenLenHistSql("documents"),
    "cluster_size_hist"   -> DedupClusters.clusterSizeHistSql("documents", TextDedup.minhashLshSql("documents")),
    "oov_rate"            -> Corpus.oovRateSql("documents"),
    "budget_sample"       -> Corpus.budgetSampleSql("documents"),
    "tfidf_topk"          -> Corpus.tfidfTopKSql("documents"),
    "bigram_topk"         -> Corpus.bigramTopKSql("documents"),
    "colloc_lift"         -> Corpus.collocLiftSql("documents"),
    "top_docs_per_source" -> Corpus.topDocsPerSourceSql("documents"),
    "length_outliers"     -> Corpus.lengthOutliersSql("documents"),
    "mix_weights"         -> Corpus.mixWeightsSql("documents"),
    "doc_chunks"          -> Corpus.docChunksSql("documents"),
    "source_quality"      -> Corpus.sourceQualitySql("documents"),
    "robust_length_score" -> Corpus.robustLengthScoreSql("documents"),
    "doc_surprisal"       -> Corpus.docSurprisalSql("documents"),
    "text_simsearch"      -> TextDedup.simSearchSql("documents"),
    "emb_neardup"         -> VectorOps.embeddingNearDupSql("embeddings"),
    "semantic_incremental" -> VectorOps.semanticIncrementalSql("embeddings"),
    "semantic_dedup"      -> VectorOps.semanticDedupSql("embeddings"),
    "ann_brute_topk"      -> VectorOps.annBruteTopKSql("embeddings"),
    "knn_label"           -> VectorOps.knnLabelSql("embeddings"),
    "hard_negatives"      -> VectorOps.hardNegativesSql("embeddings"),
    "ann_lsh_topk"        -> VectorOps.annLshTopKSql("embeddings"),
    "ann_ivf_topk"        -> VectorOps.annIvfTopKSql("embeddings"),
    "ann_recall"          -> VectorOps.annRecallSql("embeddings"),
    "quant_recall_audit"  -> VectorOps.quantRecallAuditSql("embeddings"),
    "kmeans_assign"       -> VectorOps.kmeansAssignSql("embeddings"),
    "kmeans_refine"       -> VectorOps.kmeansRefineSql("embeddings"),
    "ivf_balance"         -> VectorOps.ivfBalanceSql("embeddings"),
    "emb_norm_profile"    -> VectorOps.embNormProfileSql("embeddings"),
    "label_centroids"     -> VectorOps.labelCentroidsSql("embeddings"),
    "emb_covariance"      -> VectorOps.embCovarianceSql("embeddings"),
    "emb_pca_power"       -> VectorOps.embPcaPowerSql("embeddings"),
    "emb_pca_topk"        -> VectorOps.embPcaTopkSql("embeddings"),
    "pca_residual_outliers" -> VectorOps.pcaResidualOutliersSql("embeddings"),
    "lsh_band_curve"      -> VectorOps.lshBandCurveSql("embeddings"),
    "label_spectral_drift" -> VectorOps.labelSpectralDriftSql("embeddings"),
    "semantic_decontaminate" -> VectorOps.semanticDecontaminateSql("embeddings"),
    "retrieval_plan"      -> VectorOps.retrievalPlanSql("documents"),
    "mm_features"         -> Multimodal.featuresSql("documents"),
    "mm_payload_dedup"    -> Multimodal.payloadDedupSql("documents"),
    "mm_phash_neardup"    -> Multimodal.phashNearDupSql("documents"),
    "q1_pricing"          -> Relational.pricingSummarySql,
    "shipping_priority"   -> Relational.shippingPrioritySql,
    "topk_orders"         -> Relational.topOrdersPerSegmentSql,
    "revenue_nation"      -> Relational.revenueByNationSql,
    "semi_big_spenders"   -> Relational.bigSpendersSql,
    "anti_no_orders"      -> Relational.customersWithoutOrdersSql,
    "setop_intersect"     -> Relational.activeHighBalanceSql,
    "setop_except"        -> Relational.inactiveHighBalanceSql,
    "scalar_part"         -> Relational.partScalarsSql,
    "orders_by_month"     -> Relational.ordersByMonthSql,
    "json_event_props"    -> Relational.eventPropsSql,
    "window_running_rev"  -> Relational.runningRevenueSql,
    "window_trailing_hour" -> Relational.trailingHourValueSql,
    "sessionize_events"   -> Relational.sessionizeEventsSql,
    "session_transitions" -> Relational.sessionTransitionsSql,
    "debounce_events"     -> Relational.debounceEventsSql,
    "gap_fill_locf"       -> Relational.gapFillLocfSql,
    "peak_concurrency"    -> Relational.peakConcurrencySql,
    "event_rate_outliers" -> Relational.eventRateOutliersSql,
    "event_value_hist"    -> Relational.eventValueHistogramSql,
    "user_retention"      -> Relational.userRetentionSql,
    "event_value_mad"     -> Relational.eventValueMadSql,
    "time_weighted_value" -> Relational.timeWeightedValueSql,
    "order_price_audit"   -> Relational.orderPriceAuditSql,
    "active_users_rollup" -> Relational.activeUsersRollupSql,
    "hourly_seasonality"  -> Relational.hourlySeasonalitySql,
    "value_islands"       -> Relational.valueIslandsSql,
    "pit_state_lookup"    -> Relational.pitStateLookupSql,
    "user_type_gini"      -> Relational.userTypeGiniSql,
    "latest_order_profile" -> Relational.latestOrderProfileSql,
    "sample_per_source"   -> Corpus.samplePerSourceSql("documents"),
    "benford_profile"     -> Relational.benfordProfileSql,
    "fk_orphans"          -> Relational.fkOrphansSql,
    "hourly_autocorr"     -> Relational.hourlyAutocorrSql,
    "dedup_savings"       -> DedupClusters.dedupSavingsSql("documents", TextDedup.minhashLshSql("documents")),
    "null_profile"        -> Corpus.nullProfileSql("documents"),
    "sketch_profile"      -> Corpus.sketchProfileSql("documents"),
    "corpus_diff"         -> Corpus.corpusDiffSql("documents"),
    "dsir_weights"        -> Corpus.dsirWeightsSql("documents"),
    "bigram_surprisal"    -> Corpus.bigramSurprisalSql("documents"),
    "filter_funnel"       -> Corpus.filterFunnelSql("documents"),
    "pack_audit"          -> Corpus.packAuditSql("documents"),
    "vocab_coverage"      -> Corpus.vocabCoverageSql("documents"),
    "mg_heavy_hitters"    -> Corpus.mgHeavyHittersSql("documents"),
    "mg_hitters_by_lang"  -> Corpus.mgHittersByLangSql("documents"),
    "boilerplate_prefixes" -> Corpus.boilerplatePrefixesSql("documents"),
    "user_ltv_deciles"    -> Relational.userLtvDecilesSql,
    "funnel_stages"       -> Relational.funnelStagesSql,
    "interevent_gaps"     -> Relational.intereventGapsSql,
    "doc_source_pivot"    -> Relational.docSourcePivotSql,
    "orders_cube"         -> Relational.ordersCubeSql,
    "rollup_customers"    -> Relational.customerRollupSql,
    "distinct_customers"  -> Relational.distinctCustomersSql,
    "kmv_distinct_users"  -> Relational.kmvDistinctUsersSql,
    "kmv_distinct_agg"    -> Relational.kmvDistinctAggUsersSql,
    "kmv_users_by_day"    -> Relational.kmvUsersByDaySql,
    "kmv_error_audit"     -> Relational.kmvErrorAuditSql,
    "hll_error_audit"     -> Relational.hllErrorAuditSql,
    "gk_error_audit"      -> Corpus.gkErrorAuditSql("documents"),
    "mg_error_audit"      -> Corpus.mgErrorAuditSql("documents"),
    "cm_error_audit"      -> Corpus.cmErrorAuditSql("documents"),
    "kmv_rolling_users"   -> Relational.kmvRollingUsersSql,
    "kmv_overlap_audit"   -> Relational.kmvOverlapAuditSql,
    "skew_profile"        -> Relational.eventKeySkewSql,
    "skew_join_salted"    -> Relational.saltedSegmentJoinSql,
    "format_roundtrip"    -> graft.sources.TextFormats.formatRoundtripSql,
    "market_share"        -> Relational.marketShareSql,
    "level_shift"         -> Relational.levelShiftDetectSql,
    "corpus_checksum"     -> Corpus.corpusChecksumSql("documents"),
    "fuzzy_prefix_dedup"  -> TextDedup.fuzzyPrefixDedupSql("documents"),
  )
}
