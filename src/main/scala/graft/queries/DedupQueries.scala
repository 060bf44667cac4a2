package graft.queries

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table, each mirrored by a
  * DuckDB oracle built on the shared md5-based `hash60` construction
  * (see [[graft.functions.TextFunctions]]).
  */
object DedupQueries {

  private def docs(s: SparkSession, dir: String) = Tables(s, dir, "documents")

  /** Per-session memo of `dedup_communities_incr`'s pre-change base
    * (LSH index + community table) — dirs live under [[QueryTmp]], so
    * they are deleted on JVM exit. */
  private val commIncrBase =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Two-level Louvain over an (id_a, id_b, est_jaccard) candidate
    * graph — the shared tail of dedup_communities /
    * dedup_community_stats / dedup_communities_after_ingest: edges at
    * est ≥ 4/16, seed components at est ≥ 12/16 (exact multiples of
    * 1/16 — engine-portable thresholds). ONE copy so the three
    * surfaces can never diverge from each other or their shared
    * oracle chain. */
  private def communitiesFromPairs(pairs0: DataFrame): DataFrame = {
    val pairs = pairs0.localCheckpoint(true)
    val eg = pairs.where(col("est_jaccard") >= 0.25)
      .select(col("id_a").as("a"), col("id_b").as("b")).distinct()
    val hi = pairs.where(col("est_jaccard") >= 0.75)
      .select(col("id_a").as("a"), col("id_b").as("b")).distinct()
    val comp = Dedup.resolveClusters(hi, "a", "b")
      .select(col("id").as("n"), col("cluster").as("comm"))
    graft.ops.Similarity.louvainLevels(eg, comp)
      .select(col("vec_id").as("doc_id"), col("comm1"), col("comm2"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(docs(s, dir), "doc_id", "text")),

    // CDC-maintained LSH index: build the persisted band-bucketed index
    // over the full corpus, apply a merged change batch (docs ≡ 1 mod 7
    // rewritten, docs ≡ 3 mod 7 deleted — the text_bm25_after_update
    // fixture) through Dedup.updateLshIndex (tombstones + re-sketch at
    // O(batch), NOT a rebuild), then probe a fresh delivery against it.
    // The oracle sketches the MERGED corpus from scratch: the maintained
    // index must produce identical candidates.
    "dedup_lsh_after_update" -> ((s, dir) => {
      val d = docs(s, dir)
      val changes = d.where(col("doc_id") % 7 === 1L)
        .select(col("doc_id"),
          concat(col("text"), lit(" refreshed merge batch")).as("text"),
          lit("U").as("op"))
        .unionByName(d.where(col("doc_id") % 7 === 3L)
          .select(col("doc_id"), lit(null).cast("string").as("text"),
            lit("D").as("op")))
      val table = s"lsh_upd_idx_${math.abs(dir.hashCode)}"
      Dedup.writeLshIndex(d, "doc_id", "text", table, buckets = 8)
      Dedup.updateLshIndex(s, changes, "doc_id", "text", "op", table,
        buckets = 8, batchId = "chg1")
      val probe = d.where(col("doc_id") % 10 === 5L)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      Dedup.lshCandidatesAgainstIndex(s, table, probe, "doc_id", "text")
    }),

    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.lshCandidatePairs(docs(s, dir), "doc_id", "text",
        shingleWords = 3, k = 16, bands = 4, maxBucketSize = 1000)),

    // Near-dup COMMUNITY structure (r10 cross-family composition): the
    // two-level Louvain hierarchy over the MinHash-LSH candidate graph
    // — template families and boilerplate ecosystems are COMMUNITIES
    // (dense est-jaccard neighborhoods), not just pairwise duplicates,
    // and topic-balanced curation samples per community rather than per
    // connected component (components chain through weak links; Louvain
    // splits them at the sparse cuts). Edges: candidates with est ≥
    // 4/16; seeds: components of the est ≥ 12/16 sub-graph (the same
    // exact-multiple-of-1/16 thresholds both engines compute
    // identically). Shares the oracle chain with sim_louvain_levels
    // verbatim (SimilarityQueries.louvainLevelsChainSql).
    "dedup_communities" -> ((s, dir) =>
      communitiesFromPairs(
        Dedup.lshCandidatePairs(docs(s, dir), "doc_id", "text",
          shingleWords = 3, k = 16, bands = 4, maxBucketSize = 1000))),

    // Lifecycle twin: the SAME communities, but the pair graph comes
    // from the PERSISTED LSH index built across two ingest deliveries
    // (initial write + ledger-gated append) instead of a corpus
    // recompute — [[Dedup.lshPairsFromIndex]], the all-pairs dual of
    // the probe path. Same oracle text as dedup_communities: a hash
    // match proves index-derived pairs ≡ from-scratch pairs ≡ identical
    // community structure, end to end through the hierarchy.
    "dedup_communities_after_ingest" -> ((s, dir) => {
      val d = docs(s, dir)
      val table = s"lsh_comm_idx_${math.abs(dir.hashCode)}"
      Dedup.writeLshIndex(d.where(col("doc_id") % 3 =!= 0L),
        "doc_id", "text", table, buckets = 8)
      Dedup.appendToLshIndex(d.where(col("doc_id") % 3 === 0L),
        "doc_id", "text", table, buckets = 8, batchId = "comm_b1")
      communitiesFromPairs(Dedup.lshPairsFromIndex(s, table))
    }),

    // INCREMENTALLY-MAINTAINED community hierarchy (r11): persist the
    // (doc_id, comp, comm1, comm2) index under PER-COMPONENT Louvain
    // normalization (the property that makes untouched components
    // refresh-invariant), apply the standard change batch to the LSH
    // index (tombstones + re-sketch, O(batch)), then refresh ONLY the
    // components the delivery touched (Dedup.refreshCommunityIndex —
    // closure over changed-partner edges + old-membership stars). The
    // oracle recomputes the per-component hierarchy from scratch over
    // the MERGED corpus: a hash match proves splice ≡ rebuild.
    "dedup_communities_incr" -> ((s, dir) => {
      val d = docs(s, dir)
      val table = s"lsh_comm_incr_${math.abs(dir.hashCode)}"
      // the PRE-change base (LSH index + community table) is a one-time
      // setup, memoized per session like the stats fixtures — repeat
      // invocations measure what the query is named for: the
      // ledger-gated index update (no-op on replay) + the incremental
      // refresh, which is idempotent (same touched components, same
      // splice), so the output is invocation-independent
      val path = commIncrBase.computeIfAbsent(
        s"${s.sparkContext.applicationId}:$dir", _ => {
          val p = QueryTmp.dir("comm_incr") + "/t"
          Dedup.writeLshIndex(d, "doc_id", "text", table, buckets = 8)
          Dedup.buildCommunityIndex(s, table, p)
          p
        })
      val changes = d.where(col("doc_id") % 7 === 1L)
        .select(col("doc_id"),
          concat(col("text"), lit(" refreshed merge batch")).as("text"),
          lit("U").as("op"))
        .unionByName(d.where(col("doc_id") % 7 === 3L)
          .select(col("doc_id"), lit(null).cast("string").as("text"),
            lit("D").as("op")))
      Dedup.updateLshIndex(s, changes, "doc_id", "text", "op", table,
        buckets = 8, batchId = "chg1")
      Dedup.refreshCommunityIndex(s, table, path, changes.select("doc_id"))
      s.read.parquet(path)
    }),

    // The curation-facing read of the hierarchy: per level-2 community,
    // its size, how many level-1 sub-communities it absorbed, and the
    // deterministic representative (min doc id) — the grain a
    // topic-balanced sampler iterates (sample k per community instead
    // of k per corpus). One partial agg over the communities frame.
    "dedup_community_stats" -> ((s, dir) =>
      communitiesFromPairs(
        Dedup.lshCandidatePairs(docs(s, dir), "doc_id", "text",
          shingleWords = 3, k = 16, bands = 4, maxBucketSize = 1000))
        .groupBy(col("comm2").as("community"))
        .agg(count(lit(1)).as("n_docs"),
          count_distinct(col("comm1")).as("n_subcommunities"),
          min(col("doc_id")).as("representative"))),

    "dedup_simhash" -> ((s, dir) =>
      Dedup.simHashed(docs(s, dir), "doc_id", "text")),

    "dedup_simhash_pairs" -> ((s, dir) =>
      Dedup.simHashPairs(docs(s, dir), "doc_id", "text", maxHamming = 3,
        maxBucketSize = 1000)),

    // Wide (60-bit) SimHash: the sketch for corpora where 32 bits saturate.
    "dedup_simhash60" -> ((s, dir) =>
      Dedup.simHashed60(docs(s, dir), "doc_id", "text")),

    // 4×15-bit banding — EXACT recall at Hamming ≤ 3 by pigeonhole
    // (pinned against brute force in OpsSpec).
    "dedup_simhash60_pairs" -> ((s, dir) =>
      Dedup.simHash60Pairs(docs(s, dir), "doc_id", "text", maxHamming = 3,
        maxBucketSize = 1000)),

    // Dedup cascade e2e — the order a production pipeline runs: exact
    // dedup first (cheap fingerprint groupBy eats the bulk copies), then
    // MinHash-LSH near-dup on the exact KEEPERS only (the expensive stage
    // sees the shrunken corpus), components resolved, lowest id kept.
    "dedup_cascade" -> ((s, dir) => {
      val d = docs(s, dir)
      // Stage 1 reuses the canonical exact-dedup rule — keep_id IS the
      // per-fingerprint keeper, so a change to Dedup.exact's
      // normalization or keeper rule reaches the cascade automatically.
      val exactKeepers = Dedup.exact(d, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      val stage1 = d.join(exactKeepers, Seq("doc_id"), "left_semi")
        .localCheckpoint(true)
      val pairs = Dedup.lshCandidatePairs(stage1, "doc_id", "text",
        shingleWords = 3, k = 16, bands = 4, maxBucketSize = 1000)
        .where(col("est_jaccard") >= 0.5)
        .select("id_a", "id_b").localCheckpoint(true)
      val losers = Dedup.resolveClusters(pairs)
        .where(!col("keep")).select(col("id").as("doc_id"))
      stage1.join(losers, Seq("doc_id"), "left_anti")
        .select("doc_id", "lang", "source")
    }),

    // Cluster resolution: SimHash near-dup pairs → connected components,
    // keeper = smallest doc_id per cluster (identical sketches collapsed
    // to representatives before the quadratic pair step — the scale path).
    "dedup_clusters" -> ((s, dir) =>
      Dedup.simHashClusters(docs(s, dir), "doc_id", "text", maxHamming = 3,
        maxBucketSize = 1000)),

    // End-to-end dedup application: the corpus with cluster losers removed
    // (keepers + docs in no near-dup cluster survive).
    "dedup_apply" -> ((s, dir) => {
      val losers = Dedup.simHashClusters(docs(s, dir), "doc_id", "text",
        maxHamming = 3, maxBucketSize = 1000)
        .where(!col("keep")).select(col("id").as("doc_id"))
      docs(s, dir).join(losers, Seq("doc_id"), "left_anti")
        .select("doc_id", "lang", "source")
    }),

    // Deterministic hash-stratified sampling: keep ~p% per language
    // (en kept at 10%, others at 50%) — reproducible train/eval splits.
    "dedup_sample_stratified" -> ((s, dir) => {
      import graft.functions.TextFunctions.hash60
      val rate = when(col("lang") === "en", 10L).otherwise(50L)
      docs(s, dir)
        .where(hash60(concat(lit("sample:"), col("doc_id").cast("string"))) % 100 < rate)
        .select("doc_id", "lang")
    }),

    // Exact word-shingle Jaccard over LSH candidate pairs: the composed
    // scale path (LSH recall stage → exact verify stage) — candidate count
    // is Σ bucket², never n², so the verify stage is shuffle-join linear
    // in candidates.
    // Similarity histogram over the LSH candidate pairs: exact Jaccard
    // binned to tenths plus the cumulative pairs-at-or-above count —
    // the tuning curve that picks a dedup threshold from DATA instead
    // of folklore (how many pairs does 0.8 vs 0.6 actually merge?).
    // Candidate-sized work; the cumulative window runs over 10 rows.
    "dedup_sim_histogram" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.lshCandidatePairs(d, "doc_id", "text",
        shingleWords = 3, k = 16, bands = 4, maxBucketSize = 1000)
        .select("id_a", "id_b").localCheckpoint(true)
      val j = Dedup.ngramJaccard(d, pairs, "doc_id", "text", shingleWords = 3)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("bin").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      j.withColumn("bin",
          least(floor(col("jaccard") * 10).cast("long"), lit(9L)))
        .groupBy("bin").agg(count(lit(1)).as("n_pairs"))
        .withColumn("n_at_or_above", sum(col("n_pairs")).over(w))
    }),

    // Signature-length accuracy sweep: MinHash Jaccard estimates at
    // k ∈ {8, 16} against the exact Jaccard on the band-collided
    // candidate pairs. On THIS conditioned population the estimate is
    // systematically high (a band collision requires runs of equal
    // slots — the LSH false-positive gap), which is precisely the
    // number that justifies the exact-verification stage after every
    // banding pass; the k axis prices signature storage against it.
    // Per-(k, pair) grain, no float cross-row sums.
    "dedup_k_sweep" -> ((s, dir) => {
      import graft.expressions.TextSketches
      val d = docs(s, dir)
      val cand = Dedup.lshCandidatePairs(d, "doc_id", "text",
        shingleWords = 3, k = 16, bands = 4, maxBucketSize = 1000)
        .select("id_a", "id_b").localCheckpoint(true)
      val exact = Dedup.ngramJaccard(d, cand, "doc_id", "text", shingleWords = 3)
        .select(col("id_a"), col("id_b"), col("jaccard").as("exact_jaccard"))
        .localCheckpoint(true)
      Seq(8, 16).map { k =>
        val sig = d.select(col("doc_id"),
          TextSketches.minHashSignature(col("text"), k, 3).as("sig"))
        exact
          .join(sig.select(col("doc_id").as("id_a"), col("sig").as("__sa")), "id_a")
          .join(sig.select(col("doc_id").as("id_b"), col("sig").as("__sb")), "id_b")
          .select(lit(k.toLong).as("k"), col("id_a"), col("id_b"),
            (aggregate(zip_with(col("__sa"), col("__sb"),
              (x, y) => when(x === y, 1L).otherwise(0L)),
              lit(0L), (acc, x) => acc + x).cast("double") / k).as("est_jaccard"),
            col("exact_jaccard"))
          .withColumn("abs_err", abs(col("est_jaccard") - col("exact_jaccard")))
      }.reduce(_ unionByName _)
    }),

    // Within-vs-cross-source duplication matrix: the confirmed near-dup
    // pairs (exact Jaccard ≥ 0.5 over LSH candidates) bucketed by their
    // unordered source pair — the number that decides whether dedup can
    // run per-source (cheap, partition-local) or must be global (one
    // nonzero cross cell forces it). Candidate-sized work.
    "dedup_source_matrix" -> ((s, dir) => {
      val d = docs(s, dir)
      val cand = Dedup.lshCandidatePairs(d, "doc_id", "text",
        shingleWords = 3, k = 16, bands = 4, maxBucketSize = 1000)
        .select("id_a", "id_b").localCheckpoint(true)
      val dup = Dedup.ngramJaccard(d, cand, "doc_id", "text", shingleWords = 3)
        .where(col("jaccard") >= 0.5)
      val src = d.select(col("doc_id"), col("source"))
      dup
        .join(src.select(col("doc_id").as("id_a"), col("source").as("__sa")), "id_a")
        .join(src.select(col("doc_id").as("id_b"), col("source").as("__sb")), "id_b")
        .groupBy(least(col("__sa"), col("__sb")).as("source_x"),
          greatest(col("__sa"), col("__sb")).as("source_y"))
        .agg(count(lit(1)).as("n_dup_pairs"))
        .withColumn("is_within", col("source_x") === col("source_y"))
    }),

    // Fellegi-Sunter record-linkage scoring over the LSH candidates:
    // per-field agreement (lang, source, length-bucket) weighted by
    // data-estimated m/u probabilities (m stratum = jaccard ≥ 0.5,
    // add-one smoothed), score = fixed-order likelihood-ratio product.
    // A pair agreeing on a RARE source outranks one sharing only the
    // dominant language — the classical probabilistic linkage answer
    // beside the similarity threshold.
    "dedup_linkage_score" -> ((s, dir) => {
      val d = docs(s, dir)
      val cand = Dedup.lshCandidatePairs(d, "doc_id", "text",
        shingleWords = 3, k = 16, bands = 4, maxBucketSize = 1000)
        .select("id_a", "id_b").localCheckpoint(true)
      val j = Dedup.ngramJaccard(d, cand, "doc_id", "text", shingleWords = 3)
      def flds(side: String) = d.select(col("doc_id").as(s"id_$side"),
        col("lang").as(s"__l$side"), col("source").as(s"__s$side"),
        expr("n_chars div 100").as(s"__b$side"))
      val pairs = j.join(flds("a"), "id_a").join(flds("b"), "id_b")
        .select(col("id_a"), col("id_b"), col("jaccard"),
          (col("__la") === col("__lb")).as("agree_lang"),
          (col("__sa") === col("__sb")).as("agree_source"),
          (col("__ba") === col("__bb")).as("agree_len"),
          (col("jaccard") >= 0.5).as("is_dup"))
      Dedup.fellegiSunter(pairs, Seq("agree_lang", "agree_source", "agree_len"))
    }),

    // LSH banding planner — the tuning table BEHIND the threshold
    // histogram: for every (bands, rows) split of the 16-hash MinHash
    // signature, the S-curve catch probability 1 − (1 − s^r)^b at each
    // observed similarity bin's midpoint and the expected caught-pair
    // mass on THIS corpus. Integer powers expand to literal repeated
    // multiplication (identical IEEE tree in the mirror); no cross-bin
    // float sum anywhere.
    "dedup_lsh_plan" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.lshCandidatePairs(d, "doc_id", "text",
        shingleWords = 3, k = 16, bands = 4, maxBucketSize = 1000)
        .select("id_a", "id_b").localCheckpoint(true)
      val binned = Dedup.ngramJaccard(d, pairs, "doc_id", "text", shingleWords = 3)
        .withColumn("bin",
          least(floor(col("jaccard") * 10).cast("long"), lit(9L)))
        .groupBy("bin").agg(count(lit(1)).as("n_pairs"))
      Dedup.bandingPlan(binned, k = 16)
    }),

    // Golden-record survivorship — the entity-resolution step AFTER
    // clustering: each multi-member near-dup cluster (exact Jaccard ≥
    // 0.5 over LSH candidates → connected components) collapses to one
    // canonical record with per-FIELD conflict resolution: majority
    // lang/source (count desc, value asc tie-break — deterministic),
    // max n_chars (keep the longest evidence), min doc_id as the stable
    // canonical key. Candidate-sized pair work, cluster-sized
    // survivorship aggregates; the mode windows run over (cluster,
    // value) counts, never raw members.
    "dedup_golden_record" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.lshCandidatePairs(d, "doc_id", "text",
        shingleWords = 3, k = 16, bands = 4, maxBucketSize = 1000)
        .select("id_a", "id_b").localCheckpoint(true)
      val nd = Dedup.ngramJaccard(d, pairs, "doc_id", "text", shingleWords = 3)
        .where(col("jaccard") >= 0.5).select("id_a", "id_b")
      val lab = Dedup.resolveClusters(nd, "id_a", "id_b")
        .select(col("id").as("doc_id"), col("cluster"))
      val m = d.join(lab, "doc_id").localCheckpoint(true)
      def mode(c: String) = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("cluster").orderBy(col("__c").desc, col(c))
        m.groupBy("cluster", c).agg(count(lit(1)).as("__c"))
          .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
          .select(col("cluster"), col(c).as(s"canon_$c"))
      }
      m.groupBy("cluster")
        .agg(count(lit(1)).as("n_members"), min("doc_id").as("canon_id"),
          max("n_chars").as("max_chars"))
        .join(mode("lang"), "cluster")
        .join(mode("source"), "cluster")
        .select("cluster", "n_members", "canon_id", "canon_lang",
          "canon_source", "max_chars")
    }),

    // Cross-modal dedup verification: the text-LSH candidate pairs scored
    // by BOTH the exact lexical Jaccard and the embedding cosine of the
    // same ids (doc_id ≡ vec_id in the fixture corpus). A pair the two
    // signals disagree on is exactly the interesting case — paraphrases
    // (semantic_only) survive lexical dedup but not semantic dedup;
    // boilerplate-sharing unrelated docs (lexical_only) are the reverse.
    // Candidate-sized throughout: the embedding join touches only pair
    // endpoints, never the corpus; at 100 TB both joins shuffle
    // candidate-count rows against id-partitioned tables.
    "dedup_semantic_verify" -> ((s, dir) => {
      val d = docs(s, dir)
      val e = Tables(s, dir, "embeddings")
      val pairs = Dedup.lshCandidatePairs(d, "doc_id", "text",
        shingleWords = 3, k = 16, bands = 4, maxBucketSize = 1000)
        .select("id_a", "id_b").localCheckpoint(true)
      Dedup.ngramJaccard(d, pairs, "doc_id", "text", shingleWords = 3)
        .join(e.select(col("vec_id").as("id_a"), col("embedding").as("__va")), Seq("id_a"))
        .join(e.select(col("vec_id").as("id_b"), col("embedding").as("__vb")), Seq("id_b"))
        .withColumn("cos",
          graft.functions.VectorFunctions.cosine(col("__va"), col("__vb")))
        .select(col("id_a"), col("id_b"), col("jaccard"), col("cos"),
          when(col("jaccard") >= 0.5 && col("cos") >= 0.4, "both")
            .when(col("jaccard") >= 0.5, "lexical_only")
            .when(col("cos") >= 0.4, "semantic_only")
            .otherwise("neither").as("verdict"))
    }),

    "dedup_ngram_jaccard" -> ((s, dir) => {
      val d = docs(s, dir)
      // Materialize the candidate list once: it feeds three plan branches
      // (the ids semi-join and both sides of the verify join). Measured
      // neutral at sf0.1 (ReuseExchange already dedups the identical
      // subtrees) but makes the single-materialization guarantee explicit
      // rather than dependent on an optimizer rule's applicability.
      val pairs = Dedup.lshCandidatePairs(d, "doc_id", "text",
        shingleWords = 3, k = 16, bands = 4, maxBucketSize = 1000)
        .select("id_a", "id_b").localCheckpoint(true)
      Dedup.ngramJaccard(d, pairs, "doc_id", "text", shingleWords = 3)
    }),

    // Benchmark decontamination: corpus docs sharing ≥2 distinct word
    // trigrams with the (fixture) benchmark set — every doc_id % 50 == 0
    // doc stands in for an eval suite. Self-pairs excluded (the benchmark
    // here is a corpus subsample).
    "dedup_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.ops.Decontaminate.contaminationPairs(
        d, "doc_id", "text",
        d.where(col("doc_id") % 50 === 0), "doc_id", "text",
        shingleWords = 3, minShared = 2)
        .where(col("doc_id") =!= col("bench_id"))
    }),

    // Cross-corpus LSH dedup: which "new crawl" docs (odd ids) near-
    // duplicate the "reference corpus" (even ids) — no within-side
    // pairs, per-side bucket caps, orientation preserved.
    "dedup_cross_corpus" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.crossCorpusCandidates(
        d.where(col("doc_id") % 2 === 1), d.where(col("doc_id") % 2 === 0),
        "doc_id", "text", shingleWords = 3, k = 16, bands = 4,
        maxBucketSize = 1000)
    }),

    // Shingle-set containment over the same LSH candidates:
    // |A∩B| / min(|A|,|B|) — the asymmetric near-SUBSET detector (a doc
    // pasted inside a larger one scores low Jaccard but ~1 containment).
    "dedup_containment" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.lshCandidatePairs(d, "doc_id", "text",
        shingleWords = 3, k = 16, bands = 4, maxBucketSize = 1000)
        .select("id_a", "id_b").localCheckpoint(true)
      Dedup.ngramContainment(d, pairs, "doc_id", "text", shingleWords = 3)
    }),

    // Pooled contamination fraction — the GPT-3/PaLM-style decision rule:
    // a doc is contaminated when ≥ 50% of its distinct word trigrams
    // appear ANYWHERE in the benchmark set (fixture: doc_id % 50 == 0
    // stands in for the eval suite, as in dedup_decontaminate).
    "dedup_contamination" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.ops.Decontaminate.contaminationScores(
        d, "doc_id", "text", d.where(col("doc_id") % 50 === 0), "text",
        shingleWords = 3, threshold = 0.5)
    }),

    // Character-trigram Jaccard verification of the same LSH candidates
    // (robust to whitespace/word-boundary edits that word shingles miss).
    // Trigram sets are built only for candidate docs (semi-join), distinct
    // once per doc, one array_intersect per pair — verify-stage economics.
    "dedup_char_ngram_jaccard" -> ((s, dir) => {
      import graft.functions.TextFunctions.{jaccardDistinct, normalize}
      val d = docs(s, dir)
      // Same three-branch reuse as dedup_ngram_jaccard → materialize once.
      val pairs = Dedup.lshCandidatePairs(d, "doc_id", "text",
        shingleWords = 3, k = 16, bands = 4, maxBucketSize = 1000)
        .select("id_a", "id_b").localCheckpoint(true)
      val ids = pairs.select(col("id_a").as("doc_id"))
        .unionByName(pairs.select(col("id_b").as("doc_id"))).distinct()
      // HASHED trigram sets via one native pass (see CharNgramHashSetExpr:
      // replaces the interpreted per-position substring lambda and moves
      // array<long> through the joins — measured 3.9 s → sub-second).
      val ng = d.join(ids, Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          graft.expressions.TextSketches
            .charNgramHashSet(normalize(col("text")), 3).as("ng"))
      pairs
        .join(ng.select(col("doc_id").as("id_a"), col("ng").as("ng_a")), "id_a")
        .join(ng.select(col("doc_id").as("id_b"), col("ng").as("ng_b")), "id_b")
        .select(col("id_a"), col("id_b"),
          jaccardDistinct(col("ng_a"), col("ng_b")).as("jaccard"))
    }),

    // Passage-level dedup with text reconstruction (C4/RefinedWeb
    // style): disjoint 3-token chunks, first global occurrence wins,
    // documents rebuilt from their surviving chunks — recurring
    // boilerplate vanishes everywhere but its first appearance while
    // host documents survive.
    "dedup_passage_apply" -> ((s, dir) =>
      Dedup.passageDedup(docs(s, dir), "doc_id", "text", window = 3)),

    // Exact-substring near-dup candidates via winnowing fingerprints
    // (shared substrings of ≥ 16+8−1 = 23 normalized chars guarantee a
    // shared fingerprint; inverted index capped at 200 postings/fp).
    "dedup_substring" -> ((s, dir) =>
      Dedup.substringCandidatePairs(docs(s, dir), "doc_id", "text",
        k = 16, w = 8, minShared = 2, maxPostings = 200)),

    // EXACT Jaccard ≥ 3/5 self-join via prefix filtering (AllPairs/
    // PPJoin): rare-first canonical element order, per-set prefix of
    // length sz − ⌈τ·sz⌉ + 1, candidates only from prefix buckets, one
    // exact intersect per verified pair — every qualifying pair found,
    // no LSH false negatives.
    "dedup_prefix_join" -> ((s, dir) =>
      Dedup.prefixJaccardJoin(docs(s, dir), "doc_id", "text",
        tauNum = 3, tauDen = 5, shingleWords = 3)),

    // Sorted-neighborhood blocking: normalized-prefix sort key, every
    // pair within 4 positions of the GLOBAL order (rank = two-phase
    // parallel prefix sum, pairs via rank-bucket equi-join — O(n·w),
    // no single-partition window, no theta join).
    "dedup_sorted_neighborhood" -> ((s, dir) =>
      Dedup.sortedNeighborhoodPairs(docs(s, dir), "doc_id", "text",
        window = 4)),

    // Record-linkage fuzzy join: sorted-neighborhood blocking (window 8)
    // + exact Levenshtein verification over the first 120 normalized
    // chars (bounded DP per candidate — O(n·w) pairs, never a similarity
    // matrix). Integer unit-cost edit distance is bit-identical across
    // engines; near-dup rewrites verify at small distance, unrelated
    // neighbors land far above the cutoff.
    "dedup_edit_join" -> ((s, dir) =>
      Dedup.editDistanceJoin(docs(s, dir), "doc_id", "text",
        window = 8, maxDist = 40)),

    // Sketch-quality evaluation: recall of LSH banding against the EXACT
    // Jaccard ≥ 3/5 ground truth the prefix join computes — the
    // measurement that justifies (or rejects) a banding configuration
    // before a 100 TB run, and the eval loop a curation pipeline keeps
    // around its sketches. One row: exact pair count, banding's catch,
    // their ratio (one division on exact integers).
    "dedup_lsh_recall" -> ((s, dir) => {
      val d = docs(s, dir)
      val truth = Dedup.prefixJaccardJoin(d, "doc_id", "text", 3, 5)
        .select("id_a", "id_b").localCheckpoint(true) // pair-sized, read twice
      val cand = Dedup.lshCandidatePairs(d, "doc_id", "text",
        shingleWords = 3, k = 16, bands = 4, maxBucketSize = 1000)
        .select("id_a", "id_b")
      val found = truth.join(cand, Seq("id_a", "id_b"), "left_semi")
      truth.agg(count(lit(1)).as("n_true"))
        .crossJoin(found.agg(count(lit(1)).as("n_found")))
        .withColumn("recall",
          col("n_found").cast("double") / col("n_true").cast("double"))
    })
  )

  /** Shared SQL fragments (DuckDB): tokenization, shingles, hash60. */
  private val toksSql =
    "regexp_split_to_array(trim(text), '\\s+')"
  private def h60(e: String) = s"('0x'||substr(md5($e),1,15))::BIGINT"
  private val shinglesSql = // 3-word shingles, matching TextFunctions.wordShingles
    s"""CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
       | ELSE list_transform(range(1, len(t)-1),
       |        i -> array_to_string(list_slice(t, i::INT, i::INT+2), ' ')) END""".stripMargin
  private val signatureSql = // k=16 affine min-hashes over distinct shingles:
    // h_i(x) = (a_i * x + b_i) mod (2^61-1), x = hash60(shingle) & 0x7FFFFFFF,
    // a_i/b_i md5-derived (graft.expressions.Sketch.coeffA/coeffB)
    s"""list_transform(range(1,17), i ->
       |  list_min(list_transform(list_distinct(shingles),
       |    s -> ((((${h60("'a:' || i")} & 2147483647) | 1) * (${h60("s")} & 2147483647)
       |           + (${h60("'b:' || i")} & 2147483647)) % 2305843009213693951))))""".stripMargin

  /** SimHash sketch CTEs (h → sk), shared by the simhash oracle family. */
  private val skCtes =
    s"""h AS (
       |  SELECT doc_id,
       |         list_transform(list_distinct($toksSql), x -> ${h60("x")}) AS hs
       |  FROM documents),
       |sk AS (
       |  SELECT doc_id,
       |    CAST(list_sum(list_transform(range(0,32), j ->
       |      CASE WHEN list_sum(list_transform(hs, h -> ((h >> j::INT) & 1)*2 - 1)) > 0
       |           THEN (1::BIGINT << j::INT) ELSE 0 END)) AS BIGINT) AS simhash
       |  FROM h)""".stripMargin

  /** 60-bit SimHash sketch CTEs (h → sk60), wide twin of [[skCtes]]. */
  private val sk60Ctes =
    s"""h AS (
       |  SELECT doc_id,
       |         list_transform(list_distinct($toksSql), x -> ${h60("x")}) AS hs
       |  FROM documents),
       |sk60 AS (
       |  SELECT doc_id,
       |    CAST(list_sum(list_transform(range(0,60), j ->
       |      CASE WHEN list_sum(list_transform(hs, h -> ((h >> j::INT) & 1)*2 - 1)) > 0
       |           THEN (1::BIGINT << j::INT) ELSE 0 END)) AS BIGINT) AS simhash
       |  FROM h)""".stripMargin

  /** Rep-collapsed capped candidate pairs (grp → … → pairs), mirroring
    * [[graft.ops.Dedup.simHashClusters]]: identical sketches collapse to
    * their min-id representative, the half-key bucket cap applies to the
    * representative table, pairs are rep pairs at Hamming ≤ 3. */
  private val repPairCtes =
    s"""grp AS (
       |  SELECT simhash, min(doc_id) AS rep, count(*) AS members FROM sk GROUP BY simhash),
       |keyed AS (
       |  SELECT rep, simhash, simhash & 65535 AS lo, (simhash >> 16) & 65535 AS hi FROM grp),
       |capped AS (
       |  SELECT *, count(*) OVER (PARTITION BY lo) AS lo_n,
       |            count(*) OVER (PARTITION BY hi) AS hi_n FROM keyed),
       |cand AS (
       |  SELECT a.rep AS id_a, b.rep AS id_b, a.simhash AS sh_a, b.simhash AS sh_b
       |  FROM capped a JOIN capped b ON a.lo = b.lo AND a.rep < b.rep
       |  WHERE a.lo_n <= 1000
       |  UNION
       |  SELECT a.rep, b.rep, a.simhash, b.simhash
       |  FROM capped a JOIN capped b ON a.hi = b.hi AND a.rep < b.rep
       |  WHERE a.hi_n <= 1000),
       |pairs AS (
       |  SELECT id_a, id_b FROM cand
       |  WHERE bit_count(xor(sh_a::UBIGINT, sh_b::UBIGINT)) <= 3),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |repc AS (
       |  SELECT src AS rep, least(src, min(dst)) AS cluster FROM reach GROUP BY src)""".stripMargin

  /** MinHash/LSH candidate-pair CTEs (toks → … → lshcand), mirroring
    * [[graft.ops.Dedup.lshCandidatePairs]] with the 1000-row bucket cap. */
  private def lshCandCtesFrom(src: String) =
    s"""toks AS (SELECT doc_id, $toksSql AS t FROM $src),
       |shg AS (SELECT doc_id, ($shinglesSql) AS shingles FROM toks),
       |sig AS (SELECT doc_id, ($signatureSql) AS signature FROM shg),
       |bands AS (
       |  SELECT doc_id, signature,
       |         unnest(list_transform(range(0,4), b -> b::VARCHAR || ':' ||
       |           md5(array_to_string(list_slice(signature, (b*4+1)::INT, (b*4+4)::INT), ',')))) AS band_key
       |  FROM sig),
       |bcapped AS (
       |  SELECT * FROM bands QUALIFY count(*) OVER (PARTITION BY band_key) <= 1000),
       |lshcand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bcapped a JOIN bcapped b USING (band_key)
       |  WHERE a.doc_id < b.doc_id)""".stripMargin
  private val lshCandCtes = lshCandCtesFrom("documents")

  /** Band-row CTE chain (doc_id, signature, band_key) from any
    * (doc_id, text) source, CTE names prefixed to allow two chains in
    * one query (corpus + probe batch for the against-index mirror). */
  private def bandCtesFrom(src: String, pre: String) =
    s"""${pre}toks AS (SELECT doc_id, $toksSql AS t FROM $src),
       |${pre}shg AS (SELECT doc_id, ($shinglesSql) AS shingles FROM ${pre}toks),
       |${pre}sig AS (SELECT doc_id, ($signatureSql) AS signature FROM ${pre}shg),
       |${pre}bands AS (
       |  SELECT doc_id, signature,
       |         unnest(list_transform(range(0,4), b -> b::VARCHAR || ':' ||
       |           md5(array_to_string(list_slice(signature, (b*4+1)::INT, (b*4+4)::INT), ',')))) AS band_key
       |  FROM ${pre}sig)""".stripMargin

  /** The dedup-side Louvain community oracle: LSH candidate CTEs +
    * per-pair est + the shared chain. One text, aliased by both
    * `dedup_communities` and `dedup_communities_after_ingest`. */
  private lazy val communitiesOracle: String =
    s"""WITH RECURSIVE $lshCandCtes,
       |pairs AS MATERIALIZED (
       |  SELECT l.id_a AS a, l.id_b AS b,
       |    (len(list_filter(range(1,17), i -> sa.signature[i::INT] = sb.signature[i::INT]))::DOUBLE / 16) AS est
       |  FROM lshcand l
       |  JOIN sig sa ON l.id_a = sa.doc_id
       |  JOIN sig sb ON l.id_b = sb.doc_id),
       |eg AS MATERIALIZED (SELECT a, b FROM pairs WHERE est >= 0.25),
       |hi AS (SELECT a, b FROM pairs WHERE est >= 0.75),
       |${SimilarityQueries.louvainLevelsChainSql("doc_id")}""".stripMargin

  private def jaccardSql(a: String, b: String) =
    s"""CASE WHEN len(list_distinct(list_concat($a, $b))) = 0 THEN 0.0
       |     ELSE len(list_filter($a, x -> list_contains($b, x)))::DOUBLE
       |          / len(list_distinct(list_concat($a, $b)))::DOUBLE END""".stripMargin

  val oracles: Map[String, String] = Map(
    // Merged-corpus mirror of the maintained-index probe: the CDC-updated
    // index must be indistinguishable from a from-scratch sketch of the
    // merged corpus. Cap semantics follow lshCandidatesAgainstIndex:
    // corpus-side postings only (the probe batch is delivery-sized).
    // Incremental-hierarchy mirror: from-scratch PER-COMPONENT Louvain
    // over the merged corpus (SimilarityQueries.louvainLevelsLocalChainSql)
    // — the refreshed index's splice must be indistinguishable from it.
    "dedup_communities_incr" ->
      s"""WITH RECURSIVE merged AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 1 THEN text || ' refreshed merge batch'
         |         ELSE text END AS text
         |  FROM documents WHERE doc_id % 7 <> 3),
         |${lshCandCtesFrom("merged")},
         |pairs AS MATERIALIZED (
         |  SELECT l.id_a AS a, l.id_b AS b,
         |    (len(list_filter(range(1,17), i -> sa.signature[i::INT] = sb.signature[i::INT]))::DOUBLE / 16) AS est
         |  FROM lshcand l
         |  JOIN sig sa ON l.id_a = sa.doc_id
         |  JOIN sig sb ON l.id_b = sb.doc_id),
         |eg AS MATERIALIZED (SELECT a, b FROM pairs WHERE est >= 0.25),
         |hi AS (SELECT a, b FROM pairs WHERE est >= 0.75),
         |${SimilarityQueries.louvainLevelsLocalChainSql("doc_id")}""".stripMargin,

    "dedup_lsh_after_update" ->
      s"""WITH merged AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 1 THEN text || ' refreshed merge batch'
         |         ELSE text END AS text
         |  FROM documents WHERE doc_id % 7 <> 3),
         |newdocs AS (
         |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
         |  WHERE doc_id % 10 = 5),
         |${bandCtesFrom("merged", "c")},
         |${bandCtesFrom("newdocs", "n")},
         |ccapped AS (
         |  SELECT * FROM cbands QUALIFY count(*) OVER (PARTITION BY band_key) <= 1000)
         |SELECT DISTINCT n.doc_id AS id_new, c.doc_id AS id_corpus,
         |  (len(list_filter(range(1,17), i -> n.signature[i::INT] = c.signature[i::INT]))::DOUBLE / 16) AS est_jaccard
         |FROM nbands n JOIN ccapped c USING (band_key)""".stripMargin,

    // Passage-dedup mirror: same ceil(n/3) disjoint chunks (list_slice
    // clamps at the end exactly like Spark's slice), same 60-bit chunk
    // hash, first occurrence = lexicographic (doc_id, chunk_idx) min,
    // reassembly string_agg in position order.
    "dedup_passage_apply" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |ch AS (
         |  SELECT doc_id, unnest(range(0, (len(tk) + 2) // 3)) AS chunk_idx, tk
         |  FROM t),
         |cx AS (
         |  SELECT doc_id, chunk_idx,
         |    array_to_string(list_slice(tk, (chunk_idx*3+1)::INT, (chunk_idx*3+3)::INT), ' ') AS chunk
         |  FROM ch),
         |hx AS (SELECT doc_id, chunk_idx, chunk, ${h60("chunk")} AS h FROM cx),
         |k AS (
         |  SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk_idx) AS rn
         |  FROM hx),
         |kept AS (SELECT doc_id, chunk_idx, chunk FROM k WHERE rn = 1),
         |agg AS (
         |  SELECT doc_id, count(*)::BIGINT AS kept_chunks,
         |         string_agg(chunk, ' ' ORDER BY chunk_idx) AS text_dedup
         |  FROM kept GROUP BY 1),
         |nch AS (SELECT doc_id, count(*)::BIGINT AS n_chunks FROM hx GROUP BY 1)
         |SELECT d.doc_id, coalesce(a.text_dedup, '') AS text_dedup,
         |  coalesce(n.n_chunks, 0)::BIGINT AS n_chunks,
         |  (coalesce(n.n_chunks, 0) - coalesce(a.kept_chunks, 0))::BIGINT AS n_dropped
         |FROM documents d
         |LEFT JOIN nch n USING (doc_id)
         |LEFT JOIN agg a USING (doc_id)""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
        |       min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    "dedup_minhash_lsh" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |sh AS (SELECT doc_id, ($shinglesSql) AS shingles FROM toks),
         |sig AS (SELECT doc_id, ($signatureSql) AS signature FROM sh),
         |bands AS (
         |  SELECT doc_id, signature,
         |         unnest(list_transform(range(0,4), b -> b::VARCHAR || ':' ||
         |           md5(array_to_string(list_slice(signature, (b*4+1)::INT, (b*4+4)::INT), ',')))) AS band_key
         |  FROM sig),
         |capped AS (
         |  SELECT * FROM bands QUALIFY count(*) OVER (PARTITION BY band_key) <= 1000)
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |  (len(list_filter(range(1,17), i -> a.signature[i::INT] = b.signature[i::INT]))::DOUBLE / 16) AS est_jaccard
         |FROM capped a JOIN capped b USING (band_key)
         |WHERE a.doc_id < b.doc_id""".stripMargin,

    // Community mirror: the LSH candidate chain feeds the SHARED
    // two-level Louvain CTE text (est re-derived per pair from the
    // signature CTE — exact multiples of 1/16 on both engines).
    "dedup_communities" -> communitiesOracle,

    // after_ingest shares the oracle VERBATIM: the index across two
    // deliveries must hold exactly the band rows a from-scratch build
    // over the full corpus holds, so pairs — and therefore the whole
    // community hierarchy — hash-match the recompute mirror.
    "dedup_communities_after_ingest" -> communitiesOracle,

    // Stats mirror: the same shared chain, aggregated at community
    // grain.
    "dedup_community_stats" ->
      s"""SELECT comm2 AS community, count(*)::BIGINT AS n_docs,
         |       count(DISTINCT comm1)::BIGINT AS n_subcommunities,
         |       min(doc_id) AS representative
         |FROM (
         |WITH RECURSIVE $lshCandCtes,
         |pairs AS MATERIALIZED (
         |  SELECT l.id_a AS a, l.id_b AS b,
         |    (len(list_filter(range(1,17), i -> sa.signature[i::INT] = sb.signature[i::INT]))::DOUBLE / 16) AS est
         |  FROM lshcand l
         |  JOIN sig sa ON l.id_a = sa.doc_id
         |  JOIN sig sb ON l.id_b = sb.doc_id),
         |eg AS MATERIALIZED (SELECT a, b FROM pairs WHERE est >= 0.25),
         |hi AS (SELECT a, b FROM pairs WHERE est >= 0.75),
         |${SimilarityQueries.louvainLevelsChainSql("doc_id")}
         |) c GROUP BY 1""".stripMargin,

    "dedup_simhash" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |         list_transform(list_distinct($toksSql), x -> ${h60("x")}) AS hs
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(list_sum(list_transform(range(0,32), j ->
         |    CASE WHEN list_sum(list_transform(hs, h -> ((h >> j::INT) & 1)*2 - 1)) > 0
         |         THEN (1::BIGINT << j::INT) ELSE 0 END)) AS BIGINT) AS simhash
         |FROM h""".stripMargin,

    "dedup_simhash_pairs" ->
      s"""WITH $skCtes,
         |keyed AS (
         |  SELECT doc_id, simhash, simhash & 65535 AS lo, (simhash >> 16) & 65535 AS hi FROM sk),
         |capped AS (
         |  SELECT *, count(*) OVER (PARTITION BY lo) AS lo_n,
         |            count(*) OVER (PARTITION BY hi) AS hi_n FROM keyed),
         |cand AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.simhash AS sh_a, b.simhash AS sh_b
         |  FROM capped a JOIN capped b ON a.lo = b.lo AND a.doc_id < b.doc_id
         |  WHERE a.lo_n <= 1000
         |  UNION
         |  SELECT a.doc_id, b.doc_id, a.simhash, b.simhash
         |  FROM capped a JOIN capped b ON a.hi = b.hi AND a.doc_id < b.doc_id
         |  WHERE a.hi_n <= 1000)
         |SELECT id_a, id_b, CAST(bit_count(xor(sh_a::UBIGINT, sh_b::UBIGINT)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(sh_a::UBIGINT, sh_b::UBIGINT)) <= 3""".stripMargin,

    "dedup_simhash60" ->
      s"""WITH $sk60Ctes
         |SELECT doc_id, simhash FROM sk60""".stripMargin,

    "dedup_simhash60_pairs" ->
      s"""WITH $sk60Ctes,
         |keyed AS (
         |  SELECT doc_id, simhash,
         |         (simhash >> 0)  & 32767 AS bk0, (simhash >> 15) & 32767 AS bk1,
         |         (simhash >> 30) & 32767 AS bk2, (simhash >> 45) & 32767 AS bk3
         |  FROM sk60),
         |capped AS (
         |  SELECT *, count(*) OVER (PARTITION BY bk0) AS bk0_n,
         |            count(*) OVER (PARTITION BY bk1) AS bk1_n,
         |            count(*) OVER (PARTITION BY bk2) AS bk2_n,
         |            count(*) OVER (PARTITION BY bk3) AS bk3_n FROM keyed),
         |cand AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.simhash AS sh_a, b.simhash AS sh_b
         |  FROM capped a JOIN capped b ON a.bk0 = b.bk0 AND a.doc_id < b.doc_id
         |  WHERE a.bk0_n <= 1000
         |  UNION
         |  SELECT a.doc_id, b.doc_id, a.simhash, b.simhash
         |  FROM capped a JOIN capped b ON a.bk1 = b.bk1 AND a.doc_id < b.doc_id
         |  WHERE a.bk1_n <= 1000
         |  UNION
         |  SELECT a.doc_id, b.doc_id, a.simhash, b.simhash
         |  FROM capped a JOIN capped b ON a.bk2 = b.bk2 AND a.doc_id < b.doc_id
         |  WHERE a.bk2_n <= 1000
         |  UNION
         |  SELECT a.doc_id, b.doc_id, a.simhash, b.simhash
         |  FROM capped a JOIN capped b ON a.bk3 = b.bk3 AND a.doc_id < b.doc_id
         |  WHERE a.bk3_n <= 1000)
         |SELECT id_a, id_b, CAST(bit_count(xor(sh_a::UBIGINT, sh_b::UBIGINT)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(sh_a::UBIGINT, sh_b::UBIGINT)) <= 3""".stripMargin,

    // Cascade mirror: exact keepers by normalized-md5 min-id, the
    // MinHash-LSH chain over the SURVIVORS, est-jaccard >= 0.5 pairs,
    // recursive closure, least-id keeper per component.
    "dedup_cascade" ->
      s"""WITH RECURSIVE fp AS (
         |  SELECT doc_id,
         |         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
         |  FROM documents),
         |keep1 AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f),
         |surv AS (SELECT * FROM documents WHERE doc_id IN (SELECT doc_id FROM keep1)),
         |${lshCandCtesFrom("surv")},
         |sigs AS (SELECT doc_id, signature FROM sig),
         |nd AS (
         |  SELECT c.id_a, c.id_b
         |  FROM lshcand c JOIN sigs a ON c.id_a = a.doc_id
         |                 JOIN sigs b ON c.id_b = b.doc_id
         |  WHERE (len(list_filter(range(1,17), i -> a.signature[i::INT] = b.signature[i::INT]))::DOUBLE / 16) >= 0.5),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM nd
         |  UNION SELECT id_b, id_a FROM nd),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |losers AS (
         |  SELECT src AS doc_id FROM reach GROUP BY src
         |  HAVING least(src, min(dst)) < src)
         |SELECT doc_id, lang, source FROM surv
         |WHERE doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin,

    "dedup_clusters" ->
      s"""WITH RECURSIVE $skCtes,
         |$repPairCtes
         |SELECT sk.doc_id AS id,
         |       coalesce(repc.cluster, grp.rep) AS cluster,
         |       sk.doc_id = coalesce(repc.cluster, grp.rep) AS keep
         |FROM sk JOIN grp USING (simhash)
         |LEFT JOIN repc ON grp.rep = repc.rep
         |WHERE grp.members >= 2 OR repc.cluster IS NOT NULL""".stripMargin,

    "dedup_apply" ->
      s"""WITH RECURSIVE $skCtes,
         |$repPairCtes,
         |losers AS (
         |  SELECT sk.doc_id AS id
         |  FROM sk JOIN grp USING (simhash)
         |  LEFT JOIN repc ON grp.rep = repc.rep
         |  WHERE (grp.members >= 2 OR repc.cluster IS NOT NULL)
         |    AND sk.doc_id <> coalesce(repc.cluster, grp.rep))
         |SELECT doc_id, lang, source FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM losers)""".stripMargin,

    "dedup_sample_stratified" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${h60("'sample:' || doc_id::VARCHAR")} % 100
         |      < CASE WHEN lang = 'en' THEN 10 ELSE 50 END""".stripMargin,

    "dedup_decontaminate" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |grams AS (
         |  SELECT doc_id, unnest(list_distinct($shinglesSql)) AS gram FROM toks)
         |SELECT c.doc_id, b.doc_id AS bench_id, count(*) AS n_shared
         |FROM grams c JOIN (SELECT * FROM grams WHERE doc_id % 50 = 0) b USING (gram)
         |WHERE c.doc_id <> b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,

    "dedup_char_ngram_jaccard" ->
      s"""WITH $lshCandCtes,
         |norm AS (
         |  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
         |  FROM documents),
         |ng AS (
         |  SELECT doc_id,
         |    list_distinct(CASE WHEN len(t) < 3 THEN [${h60("t")}]
         |      ELSE list_transform(range(1, len(t)-1),
         |             i -> ${h60("substr(t, i::INT, 3)")}) END) AS s
         |  FROM norm)
         |SELECT c.id_a, c.id_b,
         |  ${jaccardSql("a.s", "b.s")} AS jaccard
         |FROM lshcand c
         |JOIN ng a ON c.id_a = a.doc_id
         |JOIN ng b ON c.id_b = b.doc_id""".stripMargin,

    "dedup_sim_histogram" ->
      s"""WITH $lshCandCtes,
         |sets AS (SELECT doc_id,
         |  list_distinct(list_transform(shingles, x -> ${h60("x")})) AS s FROM shg),
         |jp AS (
         |  SELECT c.id_a, c.id_b, ${jaccardSql("a.s", "b.s")} AS jaccard
         |  FROM lshcand c
         |  JOIN sets a ON c.id_a = a.doc_id
         |  JOIN sets b ON c.id_b = b.doc_id),
         |binned AS (
         |  SELECT least(floor(jaccard * 10)::BIGINT, 9) AS bin,
         |         count(*) AS n_pairs
         |  FROM jp GROUP BY 1)
         |SELECT bin, n_pairs,
         |  CAST(sum(n_pairs) OVER (ORDER BY bin DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS n_at_or_above
         |FROM binned""".stripMargin,

    // k-sweep mirror: candidate/exact CTEs, per-k signature arms with
    // the same min-hash formula truncated to k slots.
    "dedup_k_sweep" -> {
      def sigSql(k: Int) =
        s"""list_transform(range(1,${k + 1}), i ->
           |  list_min(list_transform(list_distinct(shingles),
           |    s -> ((((${h60("'a:' || i")} & 2147483647) | 1) * (${h60("s")} & 2147483647)
           |           + (${h60("'b:' || i")} & 2147483647)) % 2305843009213693951))))""".stripMargin
      val arms = Seq(8, 16).map { k =>
        s"""SELECT CAST($k AS BIGINT) AS k, jp.id_a, jp.id_b,
           |  CAST(list_sum(list_transform(range(1,${k + 1}), i ->
           |    CASE WHEN sa.sig[i::INT] = sb.sig[i::INT] THEN 1 ELSE 0 END)) AS DOUBLE)
           |    / $k AS est_jaccard,
           |  jp.jaccard AS exact_jaccard,
           |  abs(CAST(list_sum(list_transform(range(1,${k + 1}), i ->
           |    CASE WHEN sa.sig[i::INT] = sb.sig[i::INT] THEN 1 ELSE 0 END)) AS DOUBLE)
           |    / $k - jp.jaccard) AS abs_err
           |FROM jp
           |JOIN sig$k sa ON jp.id_a = sa.doc_id
           |JOIN sig$k sb ON jp.id_b = sb.doc_id""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $lshCandCtes,
         |sets AS (SELECT doc_id,
         |  list_distinct(list_transform(shingles, x -> ${h60("x")})) AS s FROM shg),
         |jp AS (
         |  SELECT c.id_a, c.id_b, ${jaccardSql("a.s", "b.s")} AS jaccard
         |  FROM lshcand c
         |  JOIN sets a ON c.id_a = a.doc_id
         |  JOIN sets b ON c.id_b = b.doc_id),
         |sig8 AS (SELECT doc_id, ${sigSql(8)} AS sig FROM shg),
         |sig16 AS (SELECT doc_id, ${sigSql(16)} AS sig FROM shg)
         |$arms""".stripMargin
    },

    // Source-matrix mirror: candidate/jaccard CTEs, unordered source
    // pair grouping.
    "dedup_source_matrix" ->
      s"""WITH $lshCandCtes,
         |sets AS (SELECT doc_id,
         |  list_distinct(list_transform(shingles, x -> ${h60("x")})) AS s FROM shg),
         |jp AS (
         |  SELECT c.id_a, c.id_b, ${jaccardSql("a.s", "b.s")} AS jaccard
         |  FROM lshcand c
         |  JOIN sets a ON c.id_a = a.doc_id
         |  JOIN sets b ON c.id_b = b.doc_id),
         |dup AS (SELECT id_a, id_b FROM jp WHERE jaccard >= 0.5),
         |m AS (
         |  SELECT least(da.source, db.source) AS source_x,
         |         greatest(da.source, db.source) AS source_y,
         |         count(*)::BIGINT AS n_dup_pairs
         |  FROM dup
         |  JOIN documents da ON dup.id_a = da.doc_id
         |  JOIN documents db ON dup.id_b = db.doc_id
         |  GROUP BY 1, 2)
         |SELECT source_x, source_y, n_dup_pairs,
         |       (source_x = source_y) AS is_within
         |FROM m""".stripMargin,

    // Linkage mirror: same candidate/jaccard CTEs, same one-pass m/u
    // estimation, same fixed-order CASE-ratio product.
    "dedup_linkage_score" ->
      s"""WITH $lshCandCtes,
         |sets AS (SELECT doc_id,
         |  list_distinct(list_transform(shingles, x -> ${h60("x")})) AS s FROM shg),
         |jp AS (
         |  SELECT c.id_a, c.id_b, ${jaccardSql("a.s", "b.s")} AS jaccard
         |  FROM lshcand c
         |  JOIN sets a ON c.id_a = a.doc_id
         |  JOIN sets b ON c.id_b = b.doc_id),
         |f AS (SELECT doc_id, lang, source, n_chars // 100 AS lb FROM documents),
         |pr AS (
         |  SELECT jp.id_a, jp.id_b, jp.jaccard,
         |         (fa.lang = fb.lang) AS agree_lang,
         |         (fa.source = fb.source) AS agree_source,
         |         (fa.lb = fb.lb) AS agree_len,
         |         (jp.jaccard >= 0.5) AS is_dup
         |  FROM jp
         |  JOIN f fa ON jp.id_a = fa.doc_id
         |  JOIN f fb ON jp.id_b = fb.doc_id),
         |st AS (
         |  SELECT count(*) AS n,
         |    sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS nd,
         |    sum(CASE WHEN is_dup AND agree_lang THEN 1 ELSE 0 END) AS mc_lang,
         |    sum(CASE WHEN agree_lang THEN 1 ELSE 0 END) AS uc_lang,
         |    sum(CASE WHEN is_dup AND agree_source THEN 1 ELSE 0 END) AS mc_source,
         |    sum(CASE WHEN agree_source THEN 1 ELSE 0 END) AS uc_source,
         |    sum(CASE WHEN is_dup AND agree_len THEN 1 ELSE 0 END) AS mc_len,
         |    sum(CASE WHEN agree_len THEN 1 ELSE 0 END) AS uc_len
         |  FROM pr),
         |pb AS (
         |  SELECT
         |    CAST(mc_lang + 1 AS DOUBLE) / CAST(nd + 2 AS DOUBLE) AS m_lang,
         |    CAST(uc_lang + 1 AS DOUBLE) / CAST(n + 2 AS DOUBLE) AS u_lang,
         |    CAST(mc_source + 1 AS DOUBLE) / CAST(nd + 2 AS DOUBLE) AS m_source,
         |    CAST(uc_source + 1 AS DOUBLE) / CAST(n + 2 AS DOUBLE) AS u_source,
         |    CAST(mc_len + 1 AS DOUBLE) / CAST(nd + 2 AS DOUBLE) AS m_len,
         |    CAST(uc_len + 1 AS DOUBLE) / CAST(n + 2 AS DOUBLE) AS u_len
         |  FROM st)
         |SELECT pr.id_a, pr.id_b, pr.jaccard,
         |       pr.agree_lang, pr.agree_source, pr.agree_len, pr.is_dup,
         |  (CASE WHEN agree_lang THEN m_lang / u_lang
         |        ELSE (1.0 - m_lang) / (1.0 - u_lang) END)
         |  * (CASE WHEN agree_source THEN m_source / u_source
         |          ELSE (1.0 - m_source) / (1.0 - u_source) END)
         |  * (CASE WHEN agree_len THEN m_len / u_len
         |          ELSE (1.0 - m_len) / (1.0 - u_len) END) AS score
         |FROM pr CROSS JOIN pb""".stripMargin,

    // Banding-planner mirror: the shared candidate/histogram CTEs, then
    // a generated divisor-split union with the same left-associated
    // repeated-multiplication power trees.
    "dedup_lsh_plan" -> {
      def powSql(e: String, n: Int) =
        if (n == 1) e else List.fill(n)(e).mkString("(", " * ", ")")
      val selects = (1 to 16).filter(16 % _ == 0).map { b =>
        val r = 16 / b
        val p = s"(1.0 - ${powSql(s"(1.0 - ${powSql("s", r)})", b)})"
        s"""SELECT CAST($b AS BIGINT) AS bands, CAST($r AS BIGINT) AS rows_per_band,
           |       bin, n_pairs, $p AS p_detect,
           |       CAST(n_pairs AS DOUBLE) * $p AS exp_caught
           |FROM sbins""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $lshCandCtes,
         |sets AS (SELECT doc_id,
         |  list_distinct(list_transform(shingles, x -> ${h60("x")})) AS s FROM shg),
         |jp AS (
         |  SELECT c.id_a, c.id_b, ${jaccardSql("a.s", "b.s")} AS jaccard
         |  FROM lshcand c
         |  JOIN sets a ON c.id_a = a.doc_id
         |  JOIN sets b ON c.id_b = b.doc_id),
         |binned AS (
         |  SELECT least(floor(jaccard * 10)::BIGINT, 9) AS bin,
         |         count(*) AS n_pairs
         |  FROM jp GROUP BY 1),
         |sbins AS (
         |  SELECT bin, n_pairs, CAST(2*bin + 1 AS DOUBLE) / 20.0 AS s
         |  FROM binned)
         |$selects""".stripMargin
    },

    // Golden-record mirror: exact-Jaccard edges → recursive closure →
    // the same deterministic per-field survivorship.
    "dedup_golden_record" ->
      s"""WITH RECURSIVE $lshCandCtes,
         |sets AS (SELECT doc_id,
         |  list_distinct(list_transform(shingles, x -> ${h60("x")})) AS s FROM shg),
         |jp AS (
         |  SELECT c.id_a, c.id_b, ${jaccardSql("a.s", "b.s")} AS jaccard
         |  FROM lshcand c
         |  JOIN sets a ON c.id_a = a.doc_id
         |  JOIN sets b ON c.id_b = b.doc_id),
         |nd AS (SELECT id_a, id_b FROM jp WHERE jaccard >= 0.5),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM nd
         |  UNION SELECT id_b, id_a FROM nd),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |lab AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster
         |        FROM reach GROUP BY src),
         |m AS (SELECT d.doc_id, d.lang, d.source, d.n_chars, lab.cluster
         |      FROM documents d JOIN lab ON d.doc_id = lab.doc_id),
         |lmode AS (
         |  SELECT cluster, lang AS canon_lang FROM (
         |    SELECT cluster, lang, row_number() OVER (PARTITION BY cluster
         |      ORDER BY count(*) DESC, lang) AS rn
         |    FROM m GROUP BY cluster, lang) WHERE rn = 1),
         |smode AS (
         |  SELECT cluster, source AS canon_source FROM (
         |    SELECT cluster, source, row_number() OVER (PARTITION BY cluster
         |      ORDER BY count(*) DESC, source) AS rn
         |    FROM m GROUP BY cluster, source) WHERE rn = 1),
         |agg AS (
         |  SELECT cluster, count(*) AS n_members, min(doc_id) AS canon_id,
         |         max(n_chars) AS max_chars
         |  FROM m GROUP BY 1)
         |SELECT a.cluster, a.n_members, a.canon_id, l.canon_lang,
         |       s2.canon_source, a.max_chars
         |FROM agg a JOIN lmode l USING (cluster)
         |JOIN smode s2 USING (cluster)""".stripMargin,

    "dedup_semantic_verify" ->
      s"""WITH $lshCandCtes,
         |sets AS (SELECT doc_id,
         |  list_distinct(list_transform(shingles, x -> ${h60("x")})) AS s FROM shg),
         |jp AS (
         |  SELECT c.id_a, c.id_b, ${jaccardSql("a.s", "b.s")} AS jaccard
         |  FROM lshcand c
         |  JOIN sets a ON c.id_a = a.doc_id
         |  JOIN sets b ON c.id_b = b.doc_id),
         |jc AS (
         |  SELECT jp.id_a, jp.id_b, jp.jaccard,
         |         ${SimilarityQueries.cosSql("ea.embedding", "eb.embedding")} AS cos
         |  FROM jp
         |  JOIN embeddings ea ON jp.id_a = ea.vec_id
         |  JOIN embeddings eb ON jp.id_b = eb.vec_id)
         |SELECT id_a, id_b, jaccard, cos,
         |  CASE WHEN jaccard >= 0.5 AND cos >= 0.4 THEN 'both'
         |       WHEN jaccard >= 0.5 THEN 'lexical_only'
         |       WHEN cos >= 0.4 THEN 'semantic_only'
         |       ELSE 'neither' END AS verdict
         |FROM jc""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH $lshCandCtes,
         |sets AS (SELECT doc_id,
         |  list_distinct(list_transform(shingles, x -> ${h60("x")})) AS s FROM shg)
         |SELECT c.id_a, c.id_b,
         |  ${jaccardSql("a.s", "b.s")} AS jaccard
         |FROM lshcand c
         |JOIN sets a ON c.id_a = a.doc_id
         |JOIN sets b ON c.id_b = b.doc_id""".stripMargin,

    "dedup_cross_corpus" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |sh AS (SELECT doc_id, ($shinglesSql) AS shingles FROM toks),
         |sig AS (SELECT doc_id, ($signatureSql) AS signature FROM sh),
         |bands AS (
         |  SELECT doc_id, signature,
         |         unnest(list_transform(range(0,4), b -> b::VARCHAR || ':' ||
         |           md5(array_to_string(list_slice(signature, (b*4+1)::INT, (b*4+4)::INT), ',')))) AS band_key
         |  FROM sig),
         |ba AS (SELECT * FROM bands WHERE doc_id % 2 = 1
         |       QUALIFY count(*) OVER (PARTITION BY band_key) <= 1000),
         |bb AS (SELECT * FROM bands WHERE doc_id % 2 = 0
         |       QUALIFY count(*) OVER (PARTITION BY band_key) <= 1000),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM ba a JOIN bb b USING (band_key))
         |SELECT c.id_a, c.id_b,
         |  (len(list_filter(range(1,17), i -> sa.signature[i::INT] = sb.signature[i::INT]))::DOUBLE / 16) AS est_jaccard
         |FROM cand c
         |JOIN sig sa ON c.id_a = sa.doc_id
         |JOIN sig sb ON c.id_b = sb.doc_id""".stripMargin,

    "dedup_containment" ->
      s"""WITH $lshCandCtes,
         |sets AS (SELECT doc_id,
         |  list_distinct(list_transform(shingles, x -> ${h60("x")})) AS s FROM shg)
         |SELECT c.id_a, c.id_b,
         |  len(a.s)::BIGINT AS n_a, len(b.s)::BIGINT AS n_b,
         |  len(list_filter(a.s, x -> list_contains(b.s, x)))::BIGINT AS n_shared,
         |  CASE WHEN least(len(a.s), len(b.s)) = 0 THEN 0.0
         |       ELSE len(list_filter(a.s, x -> list_contains(b.s, x)))::DOUBLE
         |            / least(len(a.s), len(b.s))::DOUBLE END AS containment
         |FROM lshcand c
         |JOIN sets a ON c.id_a = a.doc_id
         |JOIN sets b ON c.id_b = b.doc_id""".stripMargin,

    "dedup_contamination" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |grams AS (
         |  SELECT doc_id, unnest(list_distinct($shinglesSql)) AS gram FROM toks),
         |bg AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0),
         |sc AS (
         |  SELECT g.doc_id, count(*) AS n_grams, count(b.gram) AS n_shared
         |  FROM grams g LEFT JOIN bg b ON g.gram = b.gram
         |  GROUP BY 1)
         |SELECT doc_id, n_grams, n_shared,
         |       n_shared::DOUBLE / n_grams::DOUBLE AS overlap_frac,
         |       n_shared::DOUBLE / n_grams::DOUBLE >= 0.5 AS contaminated
         |FROM sc""".stripMargin,

    // Winnowing mirror: Rabin-Karp window hashes (base 257 mod 2^31−1,
    // per codepoint, as text_rolling_fingerprint), sliding min over w=8
    // consecutive hashes, distinct per doc → inverted index → capped
    // self-join. All integer modular math — value-identical to the
    // WinnowSetExpr native expression.
    "dedup_substring" ->
      s"""WITH norm AS (
         |  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
         |  FROM documents),
         |cp AS (
         |  SELECT doc_id, len(t) AS n, least(16, len(t)) AS kk,
         |         list_transform(range(1, len(t)+1), i -> unicode(t[i::INT])::BIGINT) AS cs
         |  FROM norm WHERE len(t) > 0),
         |hs AS (
         |  SELECT doc_id,
         |    list_transform(range(1, n - kk + 2), i ->
         |      list_reduce(list_slice(cs, i::INT, (i + kk - 1)::INT),
         |        (a, c) -> (a * 257 + c) % 2147483647)) AS h
         |  FROM cp),
         |wn AS (
         |  SELECT doc_id, list_sort(list_distinct(
         |    list_transform(range(1, len(h) - least(8, len(h)) + 2), j ->
         |      list_min(list_slice(h, j::INT, (j + least(8, len(h)) - 1)::INT))))) AS fps
         |  FROM hs),
         |fpx AS (SELECT doc_id, unnest(fps) AS fp FROM wn),
         |capped AS (
         |  SELECT doc_id, fp FROM fpx
         |  QUALIFY count(*) OVER (PARTITION BY fp) <= 200)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS n_shared
         |FROM capped a JOIN capped b USING (fp)
         |WHERE a.doc_id < b.doc_id
         |GROUP BY 1, 2
         |HAVING count(*) >= 2""".stripMargin,

    "dedup_prefix_join" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |shg AS (SELECT doc_id, ($shinglesSql) AS shingles FROM toks),
         |sets AS (SELECT doc_id,
         |  list_distinct(list_transform(shingles, x -> ${h60("x")})) AS s FROM shg),
         |el AS (SELECT doc_id, unnest(s) AS e FROM sets),
         |dfreq AS (SELECT e, count(*) AS df FROM el GROUP BY e),
         |ranked AS (
         |  SELECT doc_id, e,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY df, e) AS pos,
         |         count(*) OVER (PARTITION BY doc_id) AS sz
         |  FROM el JOIN dfreq USING (e)),
         |pref AS (SELECT * FROM ranked WHERE pos <= sz - ((sz * 3 + 4) // 5) + 1),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM pref a JOIN pref b ON a.e = b.e AND a.doc_id < b.doc_id
         |  WHERE 3 * greatest(a.sz, b.sz) <= 5 * least(a.sz, b.sz)),
         |v AS (
         |  SELECT c.id_a, c.id_b, len(a.s)::BIGINT AS n_a, len(b.s)::BIGINT AS n_b,
         |         len(list_filter(a.s, x -> list_contains(b.s, x)))::BIGINT AS n_shared
         |  FROM cand c
         |  JOIN sets a ON c.id_a = a.doc_id
         |  JOIN sets b ON c.id_b = b.doc_id)
         |SELECT id_a, id_b, n_a, n_b, n_shared,
         |       n_shared::DOUBLE / (n_a + n_b - n_shared)::DOUBLE AS jaccard
         |FROM v WHERE 5 * n_shared >= 3 * (n_a + n_b - n_shared)""".stripMargin,

    "dedup_sorted_neighborhood" ->
      """WITH keyed AS (
        |  SELECT doc_id,
        |         substr(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 1, 30) AS k
        |  FROM documents),
        |ranked AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY k, doc_id) AS r FROM keyed)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, (b.r - a.r)::BIGINT AS rank_gap
        |FROM ranked a JOIN ranked b ON b.r > a.r AND b.r - a.r <= 4""".stripMargin,

    "dedup_edit_join" ->
      """WITH keyed AS (
        |  SELECT doc_id,
        |         substr(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 1, 30) AS k,
        |         substr(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 1, 120) AS t
        |  FROM documents),
        |ranked AS (
        |  SELECT doc_id, t, row_number() OVER (ORDER BY k, doc_id) AS r FROM keyed)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       levenshtein(a.t, b.t)::BIGINT AS edit_dist
        |FROM ranked a JOIN ranked b ON b.r > a.r AND b.r - a.r <= 8
        |WHERE levenshtein(a.t, b.t) <= 40""".stripMargin,

    "dedup_lsh_recall" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |shg AS (SELECT doc_id, ($shinglesSql) AS shingles FROM toks),
         |sets AS (SELECT doc_id,
         |  list_distinct(list_transform(shingles, x -> ${h60("x")})) AS s FROM shg),
         |el AS (SELECT doc_id, unnest(s) AS e FROM sets),
         |dfreq AS (SELECT e, count(*) AS df FROM el GROUP BY e),
         |ranked AS (
         |  SELECT doc_id, e,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY df, e) AS pos,
         |         count(*) OVER (PARTITION BY doc_id) AS sz
         |  FROM el JOIN dfreq USING (e)),
         |pref AS (SELECT * FROM ranked WHERE pos <= sz - ((sz * 3 + 4) // 5) + 1),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM pref a JOIN pref b ON a.e = b.e AND a.doc_id < b.doc_id
         |  WHERE 3 * greatest(a.sz, b.sz) <= 5 * least(a.sz, b.sz)),
         |v AS (
         |  SELECT c.id_a, c.id_b, len(a.s)::BIGINT AS n_a, len(b.s)::BIGINT AS n_b,
         |         len(list_filter(a.s, x -> list_contains(b.s, x)))::BIGINT AS n_shared
         |  FROM cand c
         |  JOIN sets a ON c.id_a = a.doc_id
         |  JOIN sets b ON c.id_b = b.doc_id),
         |truth AS (
         |  SELECT id_a, id_b FROM v
         |  WHERE 5 * n_shared >= 3 * (n_a + n_b - n_shared)),
         |${bandCtesFrom("documents", "L")},
         |bcapped AS (
         |  SELECT * FROM Lbands QUALIFY count(*) OVER (PARTITION BY band_key) <= 1000),
         |lshcand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bcapped a JOIN bcapped b USING (band_key)
         |  WHERE a.doc_id < b.doc_id),
         |n AS (SELECT count(*)::BIGINT AS n_true FROM truth),
         |f AS (SELECT count(*)::BIGINT AS n_found
         |      FROM truth t JOIN lshcand USING (id_a, id_b))
         |SELECT n_true, n_found, n_found::DOUBLE / n_true::DOUBLE AS recall
         |FROM n, f""".stripMargin
  )
}
