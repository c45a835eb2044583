package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool: dump the formatted physical plan of every declared query
  * to docs/PLANS.md, plus a summary line per query flagging common
  * scale smells (no-pushdown scans, cartesian products, single-partition
  * windows, missing broadcasts). Not part of the engine surface. */
object PlanAudit {
  /** Standing per-query audit notes, emitted under the plan heading —
    * the place where intentionally-non-scale-shaped queries declare
    * themselves so a plan reader doesn't re-flag them each round. */
  private val notes: Map[String, String] = Map(
    "q24_jaccard_pairs" ->
      ("VERIFIER-ONLY at scale: complete quadratic enumeration within " +
        "small lang blocks pins the exact-Jaccard verifier semantics; " +
        "the at-scale generator is LSH banding — q30 declares that " +
        "composition (LSH candidates -> this verifier)."),
    "q29_embedding_neardup" ->
      ("VERIFIER-ONLY at scale: all ordered pairs, exact recall — the " +
        "correctness baseline. The declared 100x shape is " +
        "q83_embedding_neardup_bucketed (sign-bucket candidates -> this " +
        "exact cosine verifier); its no-nested-loop plan is asserted in " +
        "PlanContractsSpec."),
    "q83_embedding_neardup_bucketed" ->
      ("q29's scale shape: candidates from an equi-join on the sign " +
        "bucket (hash join, bucket-local pairs), exact cosine verify. " +
        "At 100 TB the bucket key becomes the shuffle/bucketing column."),
    "q07_rolling_window" ->
      ("Global no-partition range window reproduces the reference's " +
        "exact semantic (single ordered frame). The partitioned variant " +
        "RollingWindow.forwardPartitioned is the scale path."),
    "q43_ann_ivf" ->
      ("Deterministic-quantizer IVF (oracle-checkable). The trained " +
        "k-means variant (Similarity.ivfTopK) and the persisted " +
        "cell-partitioned index (writeIvfIndex/probeIvfIndex, partition " +
        "pruning asserted in SimilaritySpec) are the production scale " +
        "path; q84 declares the stored-index probe as an oracled query."),
    "q84_ivf_index_probe" ->
      ("The STORED-index half of the ANN story: writes the " +
        "deterministic-quantizer index cell-PARTITIONED to scratch, then " +
        "probes through the stored centroids. The data scan prunes to " +
        "the probed cell= directories (PartitionFilters asserted in " +
        "PlanContractsSpec) — at 100 TB a probe reads " +
        "nProbe/nCentroids of the corpus."),
    "q87_pq_adc" ->
      ("PQ/ADC — the MEMORY half of the ANN story: corpus rows are " +
        "scored from m-byte codes + a broadcast per-query lookup table; " +
        "the stored vectors are never read at query time. The broadcast " +
        "NLJ is the bounded-queries-side class of q25/q43 (tables frame " +
        "= queries x m*k doubles). Deterministic codebook for the " +
        "oracle; trained per-subspace k-means (Similarity.pqTrain) is " +
        "the production variant, recall-tested in SimilaritySpec."),
    "q88_ivfpq_probe" ->
      ("IVFADC — the COMPOSED stored index: data files hold (id, codes) " +
        "partitioned by cell, no vectors in the search path. The probe " +
        "prunes to the probed cell= directories (PartitionFilters " +
        "asserted in SimilaritySpec) and ADC-scores codes against " +
        "broadcast per-(query, cell) tables. At 100 TB a probe reads " +
        "nProbe/nCentroids of a codes-only corpus — both halves of the " +
        "ANN scale story in one layout."),
    "q89_semantic_dedup" ->
      ("The whole SemDeDup pipeline as one query: q83's sign-bucket " +
        "candidate generator -> q32's connected components -> one " +
        "survivor per cluster. Candidates never leave their bucket, the " +
        "fixpoint shuffles edges by key, survivor selection is one " +
        "aggregate — no stage is corpus-quadratic."),
    "q90_ann_rerank" ->
      ("Two-stage ANN: q87's ADC shortlist (codes-only corpus pass) -> " +
        "exact-cosine re-rank of the |queries| x R shortlist. The " +
        "re-rank vector fetch is a BROADCAST equi-join on id — at " +
        "100 TB it reads R rows per query, never shuffles corpus data, " +
        "and the final ordering carries no quantization error."),
    "q91_incremental_neardup" ->
      ("Dedup-against-the-ingested-corpus, the per-batch screening move " +
        "of a growing training set: banded simhash signatures equi-join " +
        "batch vs corpus (pigeonhole-complete for the hamming bound, " +
        "never batch x corpus), one xor+popcount per candidate, " +
        "first-agreeing-band dedup, then a keyed min-struct picks each " +
        "batch doc's best match. At 100 TB the corpus's banded " +
        "signatures are a stored append-only artifact; only batch-sized " +
        "data shuffles."),
    "q93_contamination_frac" ->
      ("Graded decontamination: per-doc gram totals are ROW-LOCAL " +
        "(size of the shingle array — no shuffle); only grams hitting " +
        "the broadcast test-gram set reach the doc-keyed count, so the " +
        "one real shuffle is contamination-rate-sized and the hit " +
        "counts broadcast back onto the row-local totals. The corpus " +
        "is scanned, never shuffled."),
    "q94_curation_funnel" ->
      ("Composed curation report: ONE corpus pass computes the " +
        "row-local lang/quality flags; dedup survivors join back " +
        "id-keyed (survivor-sized — deliberately NOT broadcast) and " +
        "contaminated ids broadcast (contamination-rate-sized). The " +
        "final row is a single global aggregate of the flags — corpus " +
        "text is scanned once and never shuffled."),
    "q97_incremental_neardup_stored" ->
      ("q91 through the persisted signature artifact: the corpus side " +
        "is the stored (id, simhash) shadow — ~0.01% of corpus bytes — " +
        "so a daily batch screen reads signatures, not text, and " +
        "appends maintain the artifact without rebuilds. Same banded " +
        "equi-join shape as q91; identical oracle."),
    "q95_corpus_diff" ->
      ("Snapshot delta: digests are computed row-locally BEFORE the " +
        "exchange, so the full-outer join shuffles (id, digest) pairs " +
        "only — document text never moves. Output is delta-sized."),
    "q96_upsert_apply" ->
      ("Incremental apply: the change batch is ingest-sized and " +
        "broadcasts into the anti-join, so the base corpus streams " +
        "through map-side (no shuffle of base rows at any scale); the " +
        "upserts union in as a batch-sized appendix."),
    "q92_hash_split" ->
      ("Deterministic train/val/test assignment: one narrow projection, " +
        "no shuffle, no RNG state — the append-stable, recomputable " +
        "form of randomSplit (which reshuffles rows whenever the input " +
        "grows). Split boundaries are integer hash cutoffs shared with " +
        "the oracle."),
    "q126_link_pagerank" ->
      ("Iterative PageRank in exact integer micro-units: the edge list " +
        "is re-clustered on src ONCE and cached, so each superstep's " +
        "edges-ranks join reuses that layout and the only per-iteration " +
        "exchange is the contribution re-key from src to dst " +
        "(one-shuffle-per-superstep asserted in PlanContractsSpec). " +
        "Ranks stay node-sized; the final frame is checkpointed so the " +
        "edge-sized caches free at return."),
    "q130_hard_negatives" ->
      ("Contrastive-training negative mining: candidates come from an " +
        "equi-join on the SimHash sign bucket (hash join, asserted " +
        "no-NLJ in PlanContractsSpec); label/self inequalities ride as " +
        "residual conditions; per-anchor top-k is an anchor-keyed " +
        "window over candidate-sized data. Never anchors x corpus."),
    "q131_source_overlap" ->
      ("Source-pair Jaccard governance report: per-source MinHash " +
        "signatures reduce each source to k longs BEFORE any pairing, " +
        "so the pair enumeration is |sources|^2 over k-long rows — " +
        "metadata-sized at any corpus scale; the corpus itself is one " +
        "aggregation pass."),
    "q132_bigram_xent_stored" ->
      ("q105 through the persisted LM artifact: the B^2 weight table " +
        "is bounded-collected at plan-build time and scoring is the " +
        "same map-only row-local fold — corpus text never shuffles, " +
        "and the frozen artifact keeps scores stable as the training " +
        "corpus grows (stream face covered in StreamingSpec)."),
    "q133_ivf_index_append" ->
      ("q84's stored index under incremental ingest: the appended " +
        "batch routes through the FROZEN stored centroids (broadcast, " +
        "batch-sized work only) into the existing cell= partition " +
        "dirs; probes then prune to probed cells exactly as q84 " +
        "(PartitionFilters asserted in PlanContractsSpec). Append-only " +
        "id discipline is validated against the stored max-id meta."),
    "q108_inverted_index" ->
      ("Single token-keyed aggregation — the documented stopword " +
        "ceiling: a df-heavy token delivers its whole posting stream " +
        "to one reducer. q135 is the salted two-stage twin that lifts " +
        "it; this form stays for minDf-filtered vocabularies where no " +
        "token is hot."),
    "q135_inverted_index_salted" ->
      ("q108's skew-proof twin: stage 1 aggregates on (token, salt) " +
        "so a stopword's postings split across 16 reducers; stage 2 " +
        "merges 16 partial arrays per token (row-count-uniform " +
        "shuffle). Bit-identical output, same oracle — the hash match " +
        "proves the salting is semantics-free."),
    "q164_media_near_dup" ->
      ("Banded media near-dup with INLINE verify: band rows carry the " +
        "feature vector/hash, pairs dedup at their first agreeing band " +
        "(earlier keys re-sliced from the carried vectors), L1 is " +
        "row-local on the band join — no pair-keyed distinct, no " +
        "feats re-join. Broadcast size-gated; above the threshold the " +
        "band join shuffles on (band, key)."),
    "q166_media_dup_stored" ->
      ("q164's stored face: the probe's band rows broadcast (size-" +
        "gated) into ONE scan of the self-contained stored bands " +
        "table; first-agreeing-band dedup + row-local L1, so per " +
        "ingest batch the index is scanned, never shuffled, and " +
        "dir/feats is never read on the probe path."),
    "q167_media_screen_cut" ->
      ("End-to-end media ingest decision: the stored band bloom " +
        "screens row-locally (zero false negatives -> most arrivals " +
        "keep with no verify work), survivors run q166's exact banded " +
        "L1 verify, best match via ONE doc-keyed min-struct aggregate " +
        "(never pair-keyed). Output is bloom-independent — the query " +
        "hash-checks against a bloom-free oracle."))

  /** Exposed for [[SurveyAudit]]'s artifact-vs-prose cross-check. */
  private[graft] def bnljAllowlistSize: Int = bnljAllowlist.size

  /** The EXACT set of queries allowed to plan a
    * BroadcastNestedLoopJoin — every site is a bounded-queries-side
    * probe (an ANN/rerank query batch or a |sources|²-over-signatures
    * governance report) where the NLJ's build side is model-sized by
    * construction; each is justified in [[notes]] or SURVEY §17.3.
    * The audit FAILS on any BNLJ outside this list (and on any
    * CartesianProduct anywhere), so a regression that silently turns a
    * keyed join into a nested loop cannot land without editing this
    * allowlist in the same diff. */
  private val bnljAllowlist: Set[String] = Set(
    "q25_ann_bruteforce", "q29_embedding_neardup", "q43_ann_ivf",
    "q87_pq_adc", "q90_ann_rerank", "q106_global_rank",
    "q131_source_overlap", "q154_srp_shortlist_rerank",
    "q160_hybrid_retrieval", "q161_hybrid_retrieval_stored",
    "q162_hybrid_rrf_fusion", "q165_hybrid_rrf_stored")

  /** Exposed for [[SurveyAudit]]-style cross-checks. */
  private[graft] def globalWindowAllowlistSize: Int = globalWindowAllowlist.size

  /** The EXACT set of queries allowed to plan a no-partition Window
    * (round-15 verdict item 3 — the classic single-partition
    * scale-killer when the frame is corpus-sized). Every entry is
    * either a BOUNDED frame by construction or a declared semantic
    * with a documented partitioned scale path:
    *  - q07_rolling_window: the reference's global range window — the
    *    ONE corpus-sized entry, declared semantics;
    *    `RollingWindow.forwardPartitioned` is the scale path (see
    *    [[notes]]).
    *  - q43_ann_ivf: probe-cell ranking over queries×centroids rows —
    *    query-batch-sized.
    *  - q46_vocab_topn: vocab_id window runs AFTER orderBy+limit(topN)
    *    (TakeOrderedAndProject) — topN-sized, never the token stats.
    *  - q78_mixture_weights / q114_epoch_plan: per-source frames —
    *    source-count-sized governance outputs.
    *  - q106_global_rank: Ranking.globalRank's offset window over ONE
    *    ROW PER RANGE PARTITION — metadata-sized at any corpus scale
    *    (the data rows ride partition-local windows).
    * The audit FAILS on any no-partition Window outside this list, so
    * a corpus-sized global window cannot land silently. */
  private val globalWindowAllowlist: Set[String] = Set(
    "q07_rolling_window", "q43_ann_ivf", "q46_vocab_topn",
    "q78_mixture_weights", "q106_global_rank", "q114_epoch_plan")

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    sb.append("# Physical plans (sf0.01, local[4]) — dev audit artifact\n\n")
    sb.append("Regenerate: `sbt \"Test/runMain graft.PlanAudit\"`\n")

    val bnljHits = scala.collection.mutable.SortedSet.empty[String]
    val cartesianHits = scala.collection.mutable.SortedSet.empty[String]
    val globalWindowHits = scala.collection.mutable.SortedSet.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      if (plan.contains("BroadcastNestedLoopJoin")) bnljHits += name
      if (plan.contains("CartesianProduct")) cartesianHits += name
      // global windows never announce themselves in explain text — the
      // "No Partition Defined" warning is runtime-only — so inspect the
      // optimized logical plan for Window nodes with an empty
      // partitionSpec instead.
      val hasGlobalWindow = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }.nonEmpty
      if (hasGlobalWindow) globalWindowHits += name
      val smells = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "global-window" -> hasGlobalWindow,
        "sort-merge-join" -> plan.contains("SortMergeJoin")
      ).collect { case (s, true) => s }
      sb.append(s"\n## $name${if (smells.nonEmpty) smells.mkString("  [", ", ", "]") else ""}\n\n")
      notes.get(name).foreach(n => sb.append(s"> $n\n\n"))
      sb.append("```\n").append(plan.trim.take(6000)).append("\n```\n")
    }
    Files.createDirectories(Paths.get("docs"))
    Files.writeString(Paths.get("docs/PLANS.md"), sb.toString)
    println(s"[audit] wrote docs/PLANS.md (${SparkEntry.queries.size} plans)")
    // Gate AFTER the dump so a failing run still leaves the plans on
    // disk for inspection.
    val rogue = bnljHits.toSet -- bnljAllowlist
    val retired = bnljAllowlist -- bnljHits
    if (retired.nonEmpty)
      println(s"[audit] NOTE: allowlisted queries no longer plan a " +
        s"BNLJ — prune the list: ${retired.toSeq.sorted.mkString(", ")}")
    println(s"[audit] BNLJ queries: ${bnljHits.mkString(", ")}")
    spark.stop()
    require(cartesianHits.isEmpty,
      s"CartesianProduct planned in: ${cartesianHits.mkString(", ")}")
    require(rogue.isEmpty,
      s"BroadcastNestedLoopJoin outside the allowlist in: " +
        s"${rogue.toSeq.sorted.mkString(", ")} — a keyed join regressed " +
        s"to a nested loop, or a new bounded-probe query needs an " +
        s"allowlist entry + a notes justification")
    val rogueWindows = globalWindowHits.toSet -- globalWindowAllowlist
    val retiredWindows = globalWindowAllowlist -- globalWindowHits
    if (retiredWindows.nonEmpty)
      println(s"[audit] NOTE: allowlisted queries no longer plan a " +
        s"global window — prune the list: ${retiredWindows.toSeq.sorted.mkString(", ")}")
    println(s"[audit] global-window queries: ${globalWindowHits.mkString(", ")}")
    require(rogueWindows.isEmpty,
      s"no-partition Window outside the allowlist in: " +
        s"${rogueWindows.toSeq.sorted.mkString(", ")} — single-partition " +
        s"windows are the classic corpus-scale killer; rewrite " +
        s"(aggregate+broadcast, top-k, or a partitioned window) or " +
        s"justify a BOUNDED frame in the allowlist doc")
  }
}
