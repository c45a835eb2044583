package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampling for training-data curation — narrow, shuffle-free, seeded.
  *
  * `stratified` rebalances classes by per-stratum fractions (e.g.
  * downsample the dominant language); `deterministic` keeps an exact
  * reproducible subset by hashing the id — unlike `sample()`, the SAME
  * rows are selected regardless of partitioning, executor count, or
  * Spark version, which matters when a sample must be recomputable
  * from a 100 TB corpus.
  */
object Sampling {

  /** Per-stratum Bernoulli sampling (`df.stat.sampleBy`). */
  def stratified(df: DataFrame, stratumCol: String,
      fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Deterministic ~`fraction` sample: keep rows whose md5-derived id
    * hash falls under the cutoff. Same input row → same decision,
    * everywhere, every run. */
  def deterministic(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    val bucket = graft.functions.PortableHash.md5Hash32(col(idCol).cast("string"))
    df.filter(bucket < lit((fraction * (1L << 32)).toLong))
  }

  /** Cumulative 32-bit cutoffs for [[hashSplit]] — public so an oracle
    * can embed the EXACT same integer boundaries (recomputing them from
    * the weights risks double-arithmetic drift). */
  def hashSplitCutoffs(splits: Seq[(String, Double)]): Seq[Long] =
    splits.map(_._2).scanLeft(0.0)(_ + _).tail.map(c => (c * (1L << 32)).toLong)

  /** Deterministic named splits (train/val/test and friends): each row's
    * md5-derived id hash picks its split by cumulative weight cutoff.
    * The hash-based assignment is the scalable form of `randomSplit` —
    * narrow, shuffle-free, and STABLE: the same row lands in the same
    * split regardless of partitioning, executor count, or run, so a
    * 100 TB corpus's eval split is exactly recomputable, and adding new
    * rows never moves old rows between splits (`randomSplit` reshuffles
    * everything when the input changes). Weights must sum to 1. */
  def hashSplit(df: DataFrame, idCol: String, splits: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "at least one split")
    require(splits.forall(_._2 >= 0), "split weights must be non-negative")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val bucket = graft.functions.PortableHash.md5Hash32(col(idCol).cast("string"))
    val assigned = splits.zip(hashSplitCutoffs(splits)).dropRight(1)
      .foldRight(lit(splits.last._1): org.apache.spark.sql.Column) {
        case (((name, _), cut), els) => when(bucket < lit(cut), lit(name)).otherwise(els)
      }
    // a null id must surface as split = null, not silently fall through
    // every when() into the LAST split (typically the smallest held-out
    // one — the worst place for unkeyed rows to contaminate)
    df.withColumn(splitCol,
      when(col(idCol).isNull, lit(null)).otherwise(assigned))
  }

  /** Per-group quota: keep at most `maxPerGroup` rows per `groupCol`
    * (the domain/source-capping pass of corpus curation). Which rows
    * survive is DETERMINISTIC — priority is the md5-derived id hash
    * (ties → id), not arrival order — so a capped corpus is exactly
    * recomputable, like [[deterministic]].
    *
    * One shuffle on the group key (ranking window + filter). Skew note
    * for 100 TB: a giant group funnels into one task, but only its
    * `maxPerGroup` smallest hashes matter — pre-filtering each group to
    * hash < cutoff (cutoff from a coarse per-group count) bounds the
    * window input to ~maxPerGroup rows per group before the shuffle;
    * the same hash-priority makes that pre-filter sound. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
      maxPerGroup: Int): DataFrame = {
    require(maxPerGroup > 0, "maxPerGroup must be positive")
    import org.apache.spark.sql.expressions.Window
    val pri = graft.functions.PortableHash.md5Hash32(col(idCol).cast("string"))
    val w = Window.partitionBy(col(groupCol)).orderBy(pri.asc, col(idCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= maxPerGroup)
      .drop("_rn")
  }

  /** Semantic diversity sampling (the SemDeDup/DCLM "cluster then take
    * a few per cluster" stage): stratify the embedding space into
    * deterministic sign-cells ([[Similarity.signBucket]] — a narrow
    * map-only projection, so the strata are oracle-reproducible, unlike
    * trained k-means cells) and keep at most `quota` vectors per cell
    * in deterministic hash-priority order — a coverage-balanced subset
    * in which dense regions can't crowd out sparse ones. Output:
    * (idCol, cell, cell_n, pick_rank).
    *
    * Scale shape: the rank is one cell-keyed window whose limit pushes
    * down as WindowGroupLimit (no task materializes an unbounded
    * per-cell ordering — deliberately NOT a `count(*) over (cell)`,
    * which would force full-partition buffering and kill the pushdown);
    * the cell population comes from a map-combined aggregate whose
    * output is ≤ 2^nBits rows, broadcast back onto the survivors. */
  def diversitySample(df: DataFrame, idCol: String, vecCol: String,
      nBits: Int, quota: Int): DataFrame = {
    require(nBits >= 1 && nBits <= 62, s"need 1 <= nBits <= 62, got $nBits")
    require(quota > 0, "quota must be positive")
    import org.apache.spark.sql.expressions.Window
    val pri = graft.functions.PortableHash.md5Hash32(col(idCol).cast("string"))
    val cells = df.withColumn("cell", Similarity.signBucket(col(vecCol), nBits))
    val pops = cells.groupBy(col("cell")).agg(count(lit(1)).as("cell_n"))
    val rankW = Window.partitionBy(col("cell")).orderBy(pri.asc, col(idCol).asc)
    cells
      .withColumn("pick_rank", row_number().over(rankW).cast("long"))
      .filter(col("pick_rank") <= quota)
      .join(broadcast(pops), Seq("cell"))
      .select(col(idCol), col("cell"), col("cell_n"), col("pick_rank"))
  }

  /** [[diversitySample]] with [[Similarity.autoSignBits]] cell sizing:
    * cell count tracks the corpus (expected occupancy ~targetBucket),
    * so the per-cell window input stays bounded as the corpus grows
    * instead of fattening at a frozen 2^nBits stratification. Semantics
    * at the chosen width are identical to the fixed operator. */
  def diversitySampleAuto(df: DataFrame, idCol: String, vecCol: String,
      quota: Int, targetBucket: Long = 64L): DataFrame =
    diversitySample(df, idCol, vecCol,
      Similarity.autoSignBits(df, vecCol, targetBucket), quota)

  /** Token-budget selection per group: keep documents in deterministic
    * hash-priority order until the group's cumulative token count
    * reaches `budgetTokens` — the sampling step that turns
    * [[temperatureWeights]]-style mixture quotas into an actual row
    * subset. Greedy prefix semantics: a doc is kept iff the tokens
    * BEFORE it (in priority order) are under budget, so the selection
    * may overshoot by at most one document — the standard greedy
    * packing contract (same as `TextAnalysis.packShards`).
    *
    * Deterministic like [[deterministic]]/[[capPerGroup]]: priority is
    * the md5-derived id hash (ties → id), never arrival order, so the
    * selected subset is exactly recomputable and STABLE under appends —
    * a new doc displaces only docs hashed after it, never reorders the
    * kept prefix before it.
    *
    * One shuffle on the group key (running-sum window). Skew note for
    * 100 TB, same as [[capPerGroup]]: a giant group funnels into one
    * task, but only docs with cumulative mass under budget matter, so a
    * coarse per-group pre-filter on hash rank (cutoff ≈
    * budget / min-doc-tokens) bounds the window input before the
    * shuffle; hash priority makes that pre-filter sound. */
  def tokenBudgetPerGroup(df: DataFrame, groupCol: String, idCol: String,
      textCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    import org.apache.spark.sql.expressions.Window
    val pri = graft.functions.PortableHash.md5Hash32(col(idCol).cast("string"))
    val w = Window.partitionBy(col(groupCol)).orderBy(pri.asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("_nt", graft.operators.TextAnalysis.tokenCount(col(textCol)))
      .withColumn("tokens_before", coalesce(sum(col("_nt")).over(w), lit(0L)))
      .filter(col("tokens_before") < budgetTokens)
      .withColumnRenamed("_nt", "n_tokens")
  }

  /** [[tokenBudgetPerGroup]]'s skew-proof twin — the pre-filter the
    * plain version's scaladoc declares, implemented: the giant-group
    * window ceiling (one source with 90% of the corpus funnels its
    * whole row stream into ONE window task) is lifted by bounding the
    * window's input per group BEFORE the shuffle, exactly.
    *
    * Soundness: every doc with ≥ 1 token consumes ≥ 1 token of budget,
    * so at most B+1 nonzero-token docs per group can precede the
    * cutoff — any doc with > B nonzero-token docs ahead of it in
    * (hash, id) priority order is dropped no matter what. The
    * md5-derived priority hash is uniform on [0, 2³²), so a per-group
    * hash cutoff of ~safety·(B+1)/n_nz captures those first B+1
    * nonzero docs w.h.p.; the candidate set is then
    * ~safety·(B+1) rows per group (plus the group's under-cutoff
    * zero-token docs) instead of the whole group. Exactness NEVER
    * rests on the probability: a group whose cutoff failed to capture
    * min(n_nz, B+1) nonzero docs (hash clustering, P ≈ e^(−cB)) falls
    * back to its full row set. Kept docs see every prior nonzero doc
    * (prior in (hash, id) order ⇒ smaller hash ⇒ also under cutoff),
    * so running sums — and therefore the selection and the emitted
    * `tokens_before` — are bit-identical to [[tokenBudgetPerGroup]];
    * q136 hash-checks that against q110's oracle.
    *
    * Cost: one extra group-cardinality aggregate (broadcast back) and
    * one candidate-count check, both group-sized; the corpus-sized
    * stages are one map-side filter and a window over the bounded
    * candidate set. Degenerate caveat: zero-token docs can't be
    * pre-bounded (they consume no budget), so a group made mostly of
    * empty texts degrades toward the plain window — empty docs are a
    * curation-input pathology to drop upstream, not a budget concern. */
  def tokenBudgetPerGroupBounded(df: DataFrame, groupCol: String,
      idCol: String, textCol: String, budgetTokens: Long,
      safety: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val inScope =
      budgetCandidates(df, groupCol, idCol, textCol, budgetTokens, safety)
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_h").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val outCols = df.columns.map(col) ++ Seq(col("n_tokens"), col("tokens_before"))
    inScope
      .withColumn("tokens_before", coalesce(sum(col("_nt")).over(w), lit(0L)))
      .filter(col("tokens_before") < budgetTokens)
      .withColumnRenamed("_nt", "n_tokens")
      .select(outCols: _*)
  }

  /** [[tokenBudgetPerGroupBounded]]'s pre-filter stage, exposed so the
    * skew-stress spec can assert the window-input bound directly: the
    * returned frame (df columns + `_nt` token count + `_h` priority
    * hash) is exactly what the running-sum window consumes. */
  private[operators] def budgetCandidates(df: DataFrame, groupCol: String,
      idCol: String, textCol: String, budgetTokens: Long,
      safety: Int): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(safety >= 2 && safety <= 1024, "safety must be in [2, 1024]")
    val pri = graft.functions.PortableHash.md5Hash32(col(idCol).cast("string"))
    // checkpointed: referenced by stats, the candidate join, and the
    // fallback branch — without it the corpus (including per-row md5
    // hashing and tokenization) would re-scan once per reference
    val base = df
      .withColumn("_nt", graft.operators.TextAnalysis.tokenCount(col(textCol)))
      .withColumn("_h", pri)
      .localCheckpoint()
    val bPlus = budgetTokens + 1
    val full = 1L << 32
    // cutoff ≈ safety·(B+1)/n_nz of the hash space, computed as
    // (full DIV n_nz)·(B+1)·safety so the product cannot overflow for
    // ANY long budget: this branch only runs when n_nz > B+1, hence
    // (full DIV n_nz) · (B+1) ≤ full and ·safety ≤ 2^42. The slightly
    // coarser floor placement is harmless — soundness rests on the
    // count-based fallback below, never on the cutoff's exact value.
    val stats = base.filter(col("_nt") >= 1).groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n_nz"))
      .withColumn("_cutoff",
        when(col("_n_nz") <= lit(bPlus), lit(full))
          .otherwise(least(lit(full),
            expr(s"(${full}L DIV _n_nz) * ${bPlus}L * ${safety.toLong}L + 1L"))))
    // groups with no nonzero docs miss from stats → null cutoff → keep
    // all; null hashes (null ids) also pass — the plain operator's
    // nulls-first ascending order keeps them at the FRONT of the
    // priority prefix, so dropping them here would silently diverge
    val cand = base.join(broadcast(stats), Seq(groupCol), "left")
      .filter(col("_cutoff").isNull || col("_h").isNull ||
        col("_h") < col("_cutoff"))
    // driven FROM stats with a left join: a group whose cutoff captured
    // ZERO nonzero docs has no row in the candidate-count aggregate at
    // all, and an inner join would silently skip exactly the group most
    // in need of the fallback (coalesce(_m, 0) marks it unsound)
    val candNz = cand.filter(col("_nt") >= 1).groupBy(col(groupCol))
      .agg(count(lit(1)).as("_m"))
    val unsound = stats.join(candNz, Seq(groupCol), "left")
      .filter(coalesce(col("_m"), lit(0L)) < least(col("_n_nz"), lit(bPlus)))
      .select(col(groupCol))
    cand.drop("_n_nz", "_cutoff")
      .join(broadcast(unsound), Seq(groupCol), "left_anti")
      .unionByName(base.join(broadcast(unsound), Seq(groupCol), "left_semi"))
  }

  /** Temperature-sampled source-mixture weights (α = 0.5): per group,
    * weight_i = √t_i / Σ_j √t_j where t is the group's token mass —
    * the up-weight-the-tail mixing computation training pipelines run
    * before sampling (α = 1 is proportional, α → 0 uniform). √ because
    * IEEE sqrt is correctly rounded on every platform while pow(x, α)
    * is not — the general-α form would drift across engines. The
    * normalizing sum runs in DECIMAL(18,6) (order-independent); the
    * final division is one IEEE op, so weights are bitwise-portable.
    * One aggregate + one tiny global window (rows = #groups). */
  /** Data-constrained mixture plan (the Muennighoff et al. 2023 setting):
    * turn the temperature-mixture token shares into per-source token
    * TARGETS against a global training budget, and report how many
    * passes (epochs) over each source the target implies. A source
    * whose target exceeds its corpus is `data_constrained` — it must be
    * repeated (epochs > 1) or re-weighted.
    *
    * Arithmetic is the q78 portable surface (sqrt is IEEE
    * correctly-rounded; the share division and target floor mirror
    * exactly) plus pure int64: `epochs_milli` = ⌊1000·target/available⌋
    * via integer division. Output is source-cardinality-sized; the only
    * corpus-touching stage is one token-count aggregate. */
  def epochPlan(df: DataFrame, groupCol: String, textCol: String,
      budgetTokens: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetTokens > 0, "budgetTokens must be positive")
    val perGroup = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(graft.operators.TextAnalysis.tokenCount(col(textCol))).as("n_tokens"))
    val sDec = sqrt(col("n_tokens").cast("double")).try_cast("decimal(18,6)")
    val total = sum(sDec).over(Window.partitionBy())
    perGroup
      .select(col(groupCol), col("n_docs"), col("n_tokens"),
        floor(sDec.cast("double") / total.cast("double") * lit(budgetTokens) +
          lit(0.5)).as("tokens_target"))
      .withColumn("epochs_milli",
        expr("(1000 * tokens_target) DIV n_tokens"))
      .withColumn("data_constrained", col("tokens_target") > col("n_tokens"))
  }

  /** Deterministic interleaved training order, stride-scheduled by
    * token mass: document k of source s lands at
    * `pos_key = k · SCALE ÷ tokens(s)` (exact int64), so reading in
    * pos_key order visits sources proportionally to their token share
    * THROUGHOUT the epoch — the "mix, don't concatenate" ordering rule
    * (a source never clumps at one end). Compose with
    * [[temperatureWeights]]/[[tokenBudgetPerGroup]] upstream to reshape
    * the mixture before interleaving. Ranks are doc-id-ordered, so the
    * order is append-stable: old documents keep their keys as the
    * corpus grows.
    *
    * Returns (id, group, src_rank, pos_key); consumers sort by
    * (pos_key, group, id) — totally deterministic.
    *
    * Scale shape: one group-keyed window (rank within source) + a
    * broadcast join of the source-cardinality token totals + map
    * arithmetic; NO global single-partition stage anywhere (the global
    * sort is the consumer's — typically the shard writer's range
    * exchange). SCALE = 10⁹ bounds per-source size at ~9.2×10⁹ docs
    * before int64 overflow — at larger scale, shard the source space
    * first. */
  def interleaveByTokens(df: DataFrame, groupCol: String, idCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scale = 1000000000L
    val totals = df.groupBy(col(groupCol)).agg(
      sum(graft.operators.TextAnalysis.tokenCount(col(textCol))).as("_grp_tokens"))
    df.select(col(idCol), col(groupCol))
      .withColumn("src_rank", row_number()
        .over(Window.partitionBy(col(groupCol)).orderBy(col(idCol)))
        .cast("long"))
      .join(broadcast(totals), Seq(groupCol))
      .select(col(idCol), col(groupCol), col("src_rank"),
        expr(s"src_rank * ${scale}L DIV _grp_tokens").as("pos_key"))
  }

  /** Per-group adaptive quality gate (the FineWeb per-dump move):
    * keep documents at or above their OWN group's 75th-percentile
    * quality, so a uniformly-noisy source can't flood the pool and a
    * uniformly-clean one isn't over-cut by a global threshold. The
    * percentile rule is pure integer arithmetic on the within-group
    * (score, id) rank — `4·(rank−1) ≥ 3·(n−1)` ⟺ percent_rank ≥ 0.75 —
    * so survivor membership is bit-portable (no float percentile
    * boundary).
    *
    * Scale shape: the score is map-only; rank and count share ONE
    * group-keyed window exchange; the gate itself is a map-side filter.
    * No global stage. */
  def adaptiveQualityFilter(df: DataFrame, groupCol: String, idCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
    val scored = df.filter(col(textCol).isNotNull)
      .select(col(idCol), col(groupCol),
        TextAnalysis.qualityScore(col(textCol)).as("quality"))
    scored
      .withColumn("src_rank",
        row_number().over(w.orderBy(col("quality"), col(idCol))).cast("long"))
      .withColumn("src_n", count(lit(1)).over(w).cast("long"))
      .filter(lit(4) * (col("src_rank") - 1) >= lit(3) * (col("src_n") - 1))
  }

  /** Histogram-quantile adaptive quality gate — the 100 TB face of
    * [[adaptiveQualityFilter]] (q125). q125's exact rule needs a
    * per-source full-sort window (rank + count over every doc), which
    * at corpus scale is a giant per-source sort. Here the quartile
    * threshold comes from an integer HISTOGRAM instead: quality is
    * already 4-dp quantized, so `bin = floor(quality·10⁴ + ½)` is
    * exact, the per-(source, bin) counts are a bounded aggregate
    * (sources × ≤10 001 rows, partial-combined), the 75th-percentile
    * bin is found by a cumulative sum over that histogram-sized frame,
    * and survivors are `bin ≥ threshold` via a broadcast map-side
    * join — the corpus itself never sorts and never shuffles.
    *
    * Granularity contract (documented, not hidden): membership is
    * decided at bin resolution, so all docs tied in the threshold bin
    * survive — survivors ≥ 25% per source, slightly more when the
    * boundary bin is fat. The histogram is MERGEABLE (counts add), so
    * the same artifact supports incremental maintenance and streaming
    * accumulation, which the exact-rank rule cannot. */
  def histogramQualityFilter(df: DataFrame, groupCol: String, idCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = df.filter(col(textCol).isNotNull)
      .select(col(idCol), col(groupCol),
        TextAnalysis.qualityScore(col(textCol)).as("quality"))
      // quality is floor(x·10⁴+½)/10⁴ — an integer-valued double up to
      // 1-ulp wiggle, so round-half-up recovers the exact bin
      .withColumn("bin", floor(col("quality") * 10000.0 + 0.5).cast("long"))
    val hist = scored.groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("bin"))
    // smallest bin whose cumulative count reaches 3/4 of the source:
    // docs at or above it are the (bin-resolution) top quartile
    val thresh = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col(groupCol))))
      .filter(lit(4) * col("cum") >= lit(3) * col("n"))
      .groupBy(col(groupCol))
      .agg(min(col("bin")).as("thresh_bin"), min(col("n")).as("src_n"))
    scored
      .join(broadcast(thresh), Seq(groupCol))
      .filter(col("bin") >= col("thresh_bin"))
      .select(col(idCol), col(groupCol), col("quality"), col("bin"),
        col("thresh_bin"), col("src_n"))
  }

  def temperatureWeights(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perGroup = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(graft.operators.TextAnalysis.tokenCount(col(textCol))).as("n_tokens"))
    val sDec = sqrt(col("n_tokens").cast("double")).try_cast("decimal(18,6)")
    val total = sum(sDec).over(Window.partitionBy())
    perGroup.select(
      col(groupCol), col("n_docs"), col("n_tokens"),
      graft.functions.PortableRound.round4(
        sDec.cast("double") / total.cast("double")).as("weight"))
  }
}
