package graft

/** Empirical scale validation (VERDICT round-7 item 1): run the heaviest
  * declared queries at the bench SF and at a ScaleGen ×10 upscale of it,
  * and record the runtime growth. The engine's 100 TB arguments are plan
  * contracts (banded candidates, partition-pruned indexes, broadcast
  * dims, salted skew paths); this main converts them into measured
  * evidence — near-linear growth (ratio ≲ factor, with slack for fixed
  * overheads amortizing differently) — committed as
  * docs/SCALE_SWEEP.json.
  *
  * Timing discipline mirrors Bench: pass 1 cold (full declared
  * semantics, stored-artifact builds included), passes 2..N with
  * graft.bench.reuseArtifacts, per-SF min-of-N. The ratio is
  * warm-vs-warm (steady-state probe scaling) with cold ratios kept
  * alongside (build scaling). SPARK_GRAFT_SWEEP_PASSES (default 3)
  * tightens the min against co-tenant noise. */
object ScaleSweep {

  /** The 15 most expensive queries of docs/BENCH_FULL.json (as named
    * in the round-7 verdict) plus the declared scale-path twins of the
    * parity-mandated shapes (q89, q138 — the pairs the ×30 curvature
    * probe contrasts), so every sweep tracks both sides. */
  val heavy: Seq[String] = Seq(
    "q126_link_pagerank", "q117_incremental_clusters",
    "q104_cluster_keep_best", "q103_containment_pairs",
    "q44_decontaminate", "q04_join_chain", "q50_repeated_ngrams",
    "q90_ann_rerank", "q87_pq_adc", "q30_lsh_verified_pairs",
    "q124_decontam_stored", "q22_minhash_lsh_pairs", "q40_simhash_neardup",
    "q131_source_overlap", "q132_bigram_xent_stored",
    "q89_semantic_dedup", "q138_incremental_clusters_bucketed",
    // round-8 additions: the winnowing family (q140 is in the expensive
    // cohort; q142 is its stored screen) and the KMV sketch
    "q139_kmv_distinct", "q140_winnowed_pairs", "q142_winnow_index_screen",
    // round-9: fixed-width sign-cell generator vs its auto-sized twin —
    // the pair whose ratio contrast shows the frozen-2^8 shape bending
    // (block-quadratic) while auto-sizing holds near-linear growth —
    // plus the end-to-end semantic-dedup auto face
    "q83_embedding_neardup_bucketed", "q144_embedding_neardup_auto",
    "q146_semantic_dedup_auto",
    // round-10: the exact-trained k-means family — iterative TRAINING
    // curvature (T corpus passes + model-sized shuffles, expected
    // near-linear) and its stored write→probe round trip
    "q150_kmeans_portable", "q152_ivf_trained_stored",
    // round-11: the SRP dimension-reduction front end and its composed
    // shortlist+rerank pipeline (verdict item 4 — the ANN shape users
    // actually run), plus the rolling-hash exact-substring dedup (the
    // 50-token suffix-array class, candidate+verify construction)
    "q153_srp_project", "q154_srp_shortlist_rerank",
    "q155_substring_dedup_50",
    // the cross-corpus face of the rolling construction: train side is
    // shuffle-free (broadcast-nominated), so its curvature should stay
    // flat where q155's within-corpus digest count shuffles
    "q157_substring_decontam_50",
    // round-12: hybrid retrieval's fused ranking (corpus pass + a
    // broadcast-bounded fusion grid — expected near-linear in the
    // lexical scan), the exact-trained ingest round trip (write 2/3 +
    // frozen-routing append 1/3 + pruned probe), and the media
    // near-dup face (per-char decode pass + banded join)
    "q162_hybrid_rrf_fusion", "q163_ivf_trained_append_exact",
    "q164_media_near_dup",
    // round-13: the remaining hybrid faces (inline and stored lexical
    // stages of the shortlist→rerank and RRF pipelines — verdict item
    // 3's cohort gap), the stored media index round trip, and the
    // end-to-end media screen→verify→cut decision
    "q160_hybrid_retrieval", "q161_hybrid_retrieval_stored",
    "q165_hybrid_rrf_stored", "q166_media_dup_stored",
    "q167_media_screen_cut",
    // the ingest-time media routing face (frozen probe batch × corpus
    // pass — expected linear in arrivals, probe fan-out is model-sized)
    // and the composed per-arrival ingest gate (three stored screens,
    // one decision row — the flagship ingest composition)
    "q168_media_route", "q169_ingest_gate", "q170_gate_then_pack",
    // round-14: the stored routing registry (register→append→route —
    // expected q168's curvature: arrival-linear, probe side bounded)
    // and the materialized gate→pack boundary (q169's gate cost paid
    // in the build, the measured pack stage reading the decision set)
    "q171_probe_registry", "q172_gate_pack_stored",
    // round-15: the registry MEASURE step (q171's routing pass + a
    // probe-keyed aggregate bounded at 1024 output rows — expected to
    // ride q171's arrival-linear curvature)
    "q173_registry_route_stats",
    // the coarse-band re-encode-tolerant media face — q164's plan
    // shape with wider bucket occupancy (coarser keys), expected to
    // track q164's curvature with a modestly larger verified set
    "q174_media_near_dup_coarse")

  /** The sweep's EXECUTION ORDER, made structural so a spec can pin it:
    * every measured row first, the box-speed controls LAST (flag =
    * true). Controls measured before the rows absorb parquet-reader /
    * codegen session init and once recorded a 2.46× phantom "box
    * slowdown" (SURVEY §15.8) — post-rows placement is what makes
    * control_ratio mean host speed on warm code paths. main() iterates
    * this plan in order; reordering the artifact requires editing THIS
    * function, which ScaleSweepSpec guards. */
  private[graft] def sweepPlan(rows: Seq[String],
      controls: Seq[String]): Seq[(String, Boolean)] =
    rows.map((_, false)) ++ controls.map((_, true))

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.get("SPARK_GRAFT_SCALE_FACTOR")
      .flatMap(_.toIntOption).getOrElse(10)
    val bigDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      "target/testdata/sf1.0")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.get("SPARK_GRAFT_SWEEP_PASSES")
      .flatMap(_.toIntOption).getOrElse(3).max(2)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ScaleGen.ensure(spark, baseDir, bigDir, factor)
    spark.range(1000000).selectExpr("sum(id)").collect()

    val qs = SparkEntry.queries
    // default sweep = the heavy list; an explicit SPARK_GRAFT_ONLY may
    // name ANY declared query (dev probes of non-heavy scale shapes)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val pool = if (only.isDefined) qs.keys.toSeq.sorted else heavy
    val names = pool.filter(n => only.forall(_.exists(n.startsWith)))
    // fail with a clear message: an empty match (SPARK_GRAFT_ONLY typo)
    // would otherwise run zero queries and crash on the empty .max
    require(names.nonEmpty,
      s"SPARK_GRAFT_ONLY matched no queries: ${only.map(_.mkString(","))}")

    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)

    // Per-artifact box-speed CONTROL (SURVEY §15.7 item 3): 3 members
    // of Bench.controlFamily — pure relational work, no hash pipelines,
    // no artifact builds — timed at the BASE dir with the same
    // min-of-N discipline. Sweep artifacts from different box-days
    // were incomparable (the q138 26.8×/8.2×/44.4× min-of-2 variance
    // across memory-pressure states); control_total quantifies the
    // box-day, and control_ratio (vs the committed quiet-box
    // BENCH_FULL.json's times for the SAME 3 queries) states it as a
    // single normalization factor — curvature numbers can then be read
    // net of host speed, the way BENCH artifacts already are.
    val controls = Seq("q47_stats_moments", "q65_date_arithmetic",
      "q82_null_ordering")
    // ONE read of the committed quiet-box baseline feeds both
    // references below, with one shared SF guard (Bench's driftPart
    // rule: the committed times are only a reference when measured on
    // the SAME data — a sweep based at a different SF would otherwise
    // record a data-size ratio as "box speed"). The per-query scrape
    // is anchored INSIDE the `"queries":{...}` object: the artifact
    // repeats every query key in `queries_cold`, and a whole-text
    // first-match would silently switch to cold times (~2-3× warm) if
    // Bench's field order ever changed — the exact mis-normalization
    // class this machinery exists to prevent.
    val committedWarm: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("docs/BENCH_FULL.json")),
          java.nio.charset.StandardCharsets.UTF_8)
        if (!txt.contains(s""""sf":"$baseDir"""")) Map.empty
        else {
          val start = txt.indexOf("\"queries\":{")
          val end = if (start < 0) -1 else txt.indexOf("}", start)
          if (end < 0) Map.empty
          else {
            val qtxt = txt.substring(start, end)
            (names ++ controls).distinct.flatMap { n =>
              s""""$n":([0-9.]+)""".r.findFirstMatchIn(qtxt)
                .map(m => n -> m.group(1).toDouble)
            }.toMap
          }
        }
      } catch { case _: Throwable => Map.empty }
    val controlRef: Option[Double] = {
      val refs = controls.map(committedWarm.get)
      if (refs.forall(_.isDefined)) Some(refs.flatten.sum) else None
    }
    // Per-query warm times serve the rows too: big_warm values are
    // stable run-over-run at x100, but a same-run SUB-SECOND base
    // re-measure swings the ratio wildly (q22 measured 14.8x vs 55.3x
    // across two same-day runs purely from a 0.38 s vs 1.64 s base
    // min-of-3) — so each row also reports ratio_vs_committed, the
    // curvature against the baseline's min-of-3 base number.

    // Ordered execution over sweepPlan — measured rows first, controls
    // after them in the fully-warmed session (see sweepPlan's scaladoc
    // for why the order is load-bearing; ScaleSweepSpec pins it) — and
    // SWEEP-MAJOR within each group (Bench's round-11 discipline): pass
    // 1 runs every (row, dir) cold in plan order, passes 2..N re-time
    // the whole cohort with artifact reuse, min per (row, dir) across
    // sweeps. The per-row adjacent min-of-3 this replaces let one
    // co-tenant burst triple-hit a single query: the round-11 ×10
    // artifact briefly recorded q126 at 43.3 s big_warm where an
    // isolated re-run measured 5.6 s — the Bench_r10 92 s failure mode,
    // reproduced in miniature. Sweeps minutes apart bound a burst's
    // damage to one pass of any row.
    val rowPlan = sweepPlan(names, controls).filter(!_._2).map(_._1)
    val coldT = scala.collection.mutable.Map.empty[(String, String), Double]
    val warmT = scala.collection.mutable.Map.empty[(String, String), Double]
    def runOnce(name: String, dir: String, reuse: Boolean): Double = {
      System.setProperty("graft.bench.reuseArtifacts", reuse.toString)
      try {
        val t0 = System.nanoTime()
        qs(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      } finally System.clearProperty("graft.bench.reuseArtifacts")
    }
    for (p <- 1 to passes; dir <- Seq(baseDir, bigDir); n <- rowPlan) {
      val s = runOnce(n, dir, reuse = p > 1)
      if (p == 1) coldT((n, dir)) = s
      val k = (n, dir)
      warmT(k) = math.min(warmT.getOrElse(k, Double.MaxValue), s)
    }
    // controls strictly after every measured row (the pinned placement),
    // themselves sweep-major for the same burst bound
    val controlMin = scala.collection.mutable.Map.empty[String, Double]
    val controlPlan = sweepPlan(names, controls).filter(_._2).map(_._1)
    for (p <- 1 to passes; n <- controlPlan) {
      val s = runOnce(n, baseDir, reuse = p > 1)
      controlMin(n) = math.min(controlMin.getOrElse(n, Double.MaxValue), s)
    }
    val controlTotal = controlPlan.map(controlMin).sum
    val rows = rowPlan.map { n =>
      val (cb, wb) = (coldT((n, baseDir)), warmT((n, baseDir)))
      val (cB, wB) = (coldT((n, bigDir)), warmT((n, bigDir)))
      val committedPart = committedWarm.get(n)
        .map(c => s""","committed_base":${fmt(c)},"ratio_vs_committed":${fmt(wB / c)}""")
        .getOrElse("")
      val line =
        s""""$n":{"base_warm":${fmt(wb)},"big_warm":${fmt(wB)},""" +
        s""""base_cold":${fmt(cb)},"big_cold":${fmt(cB)},""" +
        s""""ratio_warm":${fmt(wB / wb)},"ratio_cold":${fmt(cB / cb)}$committedPart}"""
      System.err.println(s"$n  base=${fmt(wb)}s  big=${fmt(wB)}s  " +
        s"ratio=${fmt(wB / wb)}" +
        committedWarm.get(n).map(c => s"  vs_committed=${fmt(wB / c)}").getOrElse(""))
      (n, wb, wB, line)
    }
    val controlPart =
      s""""control_total":${fmt(controlTotal)},"control_n":${controls.size},""" +
        controlRef.map(r => s""""control_ratio":${fmt(controlTotal / r)},""")
          .getOrElse("")
    System.err.println(s"controls  total=${fmt(controlTotal)}s" +
      controlRef.map(r => s"  ratio_vs_baseline=${fmt(controlTotal / r)}").getOrElse(""))
    val maxRatio = rows.map(r => r._3 / r._2).max
    // HEADLINE curvature = big_warm vs the COMMITTED baseline's
    // min-of-3 base, not the same-run base re-measure: sub-second
    // same-run bases swing max_ratio_warm wildly (q22 14.8× vs 55.3×
    // across two same-day runs from a 0.38 s vs 1.64 s base), while
    // the committed denominators are burst-screened. max_ratio_warm
    // stays in the artifact as the same-run diagnostic.
    val vsCommitted = rows.flatMap(r => committedWarm.get(r._1).map(r._3 / _))
    val committedHeadline =
      if (vsCommitted.isEmpty) ""
      else s""""max_ratio_vs_committed":${fmt(vsCommitted.max)},"""
    val json =
      s"""{"factor":$factor,"base":"$baseDir","big":"$bigDir",""" +
      s""""passes":$passes,"cpus":$cpus,$controlPart""" +
      s""""total_base_warm":${fmt(rows.map(_._2).sum)},""" +
      s""""total_big_warm":${fmt(rows.map(_._3).sum)},""" +
      committedHeadline +
      s""""max_ratio_warm":${fmt(maxRatio)},""" +
      s""""queries":{${rows.map(_._4).mkString(",")}}}"""
    // factor-stamped artifact names (SCALE_SWEEP.json stays the ×10
    // full-heavy default): the ×30/×100 curvature points commit
    // alongside it instead of clobbering it. Committed docs/ artifacts
    // require either the default full-heavy ×10 shape or an explicit
    // SPARK_GRAFT_COMMIT_SWEEP=1 (the Bench COMMIT_BASELINE pattern) —
    // a flag-less SPARK_GRAFT_ONLY dev probe can never clobber them.
    // Deliberate asymmetry vs Bench's `only.isEmpty` guard: curvature
    // cohorts ARE subsets (running all 147 queries at ×100 is hours),
    // so COMMIT_SWEEP=1 commits exactly what ran — the artifact's
    // queries map is the self-describing cohort record, and setting the
    // flag on a partial probe is an explicit operator act, not a slip.
    val commitSweep = sys.env.get("SPARK_GRAFT_COMMIT_SWEEP").contains("1")
    val out =
      if (factor == 10 && only.isEmpty) "docs/SCALE_SWEEP.json"
      else if (factor != 10 && commitSweep) s"docs/SCALE_SWEEP_${factor}X.json"
      else s"target/SCALE_SWEEP_${factor}X.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
