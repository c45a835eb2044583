package graft

import org.apache.spark.sql.functions._

/** Empirical scale evidence (round-7 verdict item 1): the engine's
  * 100 TB arguments are plan contracts; this spec runs the heaviest
  * declared queries against a REAL ×10 upscale of the bench SF
  * (ScaleGen → target/testdata/sf1.0, cached across runs) and checks
  * the properties that a superlinear operator would break:
  *
  *  - output cardinality grows ×10 exactly (replicas are key-disjoint
  *    and token/embedding-decorrelated, so candidate generation that
  *    stayed banded/bucketed produces exactly 10 copies of the base
  *    output — an all-pairs regression would explode this);
  *  - each heavy query finishes at sf1.0 inside a generous wall cap
  *    (a quadratic blowup is a ×100 step — caught loudly; box noise
  *    is not);
  *  - the plan contracts (broadcast dims, pushdown, pruning) hold
  *    against the sf1.0 files, not just the sf0.001 ones.
  *
  * The measured growth curves live in docs/SCALE_SWEEP.json
  * (`runMain graft.ScaleSweep`, min-of-3): all 15 heaviest queries
  * grew ≤ 8.5× warm for ×10 data on the quiet round-8 box, and the
  * ×30 probe (docs/SCALE_SWEEP_30X.json) confines the quadratic tail
  * to the documented all-pairs parity shapes (q29/q32/q117) whose
  * declared scale twins (q89, q138) measure ≤ 2.4× there. */
class ScaleSweepSpec extends SparkSpec {

  private val baseDir = "/root/testdata/sf0.1"
  private val bigDir = "target/testdata/sf1.0"

  // generated once, reused by every test (and by ScaleSweep runs)
  private lazy val gen: Unit = ScaleGen.ensure(spark, baseDir, bigDir, 10)

  test("ScaleGen: ×10 rows, disjoint keys, fixed dims") {
    gen
    def n(dir: String, tbl: String): Long =
      graft.queries.Tables.t(spark, dir, tbl).count()
    for (tbl <- Seq("documents", "embeddings", "lineitem", "events"))
      n(bigDir, tbl) shouldBe n(baseDir, tbl) * 10
    // replica keys are shifted, not colliding
    val docs = graft.queries.Tables.t(spark, bigDir, "documents")
    docs.select(countDistinct(col("doc_id"))).head().getLong(0) shouldBe
      n(baseDir, "documents") * 10
    // star-schema dims don't grow with the facts
    n(bigDir, "nation") shouldBe n(baseDir, "nation")
    docs.select(countDistinct(col("source"))).head().getLong(0) shouldBe 20
  }

  test("heaviest queries at sf1.0: ×10-proportional output, bounded wall") {
    gen
    // q30/q104/q117: the LSH-candidate → verify → cluster chain, the
    // shapes that would go quadratic if banding/bucketing regressed.
    // ~×10 output is the scale-soundness signal: cross-replica shingle
    // vocabularies are disjoint, so every surviving pair/cluster is
    // intra-replica — ~10 near-copies of the base run. It is NOT
    // exactly ×10: each replica's suffixed tokens hash to different
    // minhash values, so LSH banding recalls a slightly different
    // subset of each replica's (identical) true near-dup structure
    // (measured ≈ ×10.7 for q30). The band [×8, ×14] asserts linear
    // candidate growth while leaving room for that recall variance —
    // an all-pairs regression is a ×100 step and cannot hide in it.
    for (name <- Seq("q30_lsh_verified_pairs", "q104_cluster_keep_best",
        "q117_incremental_clusters")) {
      val baseRows = SparkEntry.queries(name)(spark, baseDir).count()
      val t0 = System.nanoTime()
      val bigRows = SparkEntry.queries(name)(spark, bigDir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      withClue(s"$name rows at ×10: ") {
        bigRows should be >= baseRows * 8
        bigRows should be <= baseRows * 14
      }
      // ~6× the quiet-box sf1.0 time at local[4]; a quadratic
      // regression is a ×100 step and lands far past this
      withClue(s"$name wall at sf1.0: ") { secs should be < 300.0 }
    }
    // q126 pagerank: fixed-size output; assert it completes at sf1.0
    SparkEntry.queries("q126_link_pagerank")(spark, bigDir)
      .count() shouldBe 100L
  }

  test("round-8 families at sf1.0: winnowed pairs ×10-proportional, KMV estimate ×10") {
    gen
    // Winnowing: replica token vocabularies are disjoint (every token
    // carries its replica suffix), so all pairs are intra-replica; the
    // per-replica hash values differ, so the window minima select
    // slightly different fingerprint subsets per replica — the same
    // recall-variance band as the LSH chain. An all-pairs or df-cut
    // regression is a step change that cannot hide in [×8, ×14].
    val basePairs = SparkEntry.queries("q140_winnowed_pairs")(spark, baseDir).count()
    val bigPairs = SparkEntry.queries("q140_winnowed_pairs")(spark, bigDir).count()
    withClue(s"q140 pairs at ×10 ($basePairs → $bigPairs): ") {
      bigPairs should be >= basePairs * 8
      bigPairs should be <= basePairs * 14
    }
    // KMV: each replica contributes a disjoint gram universe, so the
    // per-source distinct cardinality is exactly ×10 — the estimate
    // must track it within sketch error (rsd ≈ 1/√128 ≈ 8.8%; the
    // ratio of two independent estimates gets ~3σ·√2 headroom).
    import spark.implicits._
    val baseEst = SparkEntry.queries("q139_kmv_distinct")(spark, baseDir)
      .select("source", "est_distinct").as[(String, Double)].collect().toMap
    val bigEst = SparkEntry.queries("q139_kmv_distinct")(spark, bigDir)
      .select("source", "est_distinct").as[(String, Double)].collect().toMap
    baseEst.foreach { case (src, est) =>
      withClue(s"q139 $src estimate ×10 ratio: ") {
        bigEst(src) / est shouldBe 10.0 +- 4.0
      }
    }
  }

  test("sweep plan places every control AFTER every measured row") {
    // SURVEY §15.8: controls measured before the rows absorb session
    // init (parquet reader, codegen) and once recorded a 2.46× phantom
    // box slowdown that would have halved every curvature reading.
    // main() iterates sweepPlan in order, so pinning the plan pins the
    // artifact's control placement.
    val plan = ScaleSweep.sweepPlan(
      Seq("qA", "qB", "qC"), Seq("c1", "c2"))
    plan.map(_._1) shouldBe Seq("qA", "qB", "qC", "c1", "c2")
    val firstControl = plan.indexWhere(_._2)
    val lastRow = plan.lastIndexWhere(!_._2)
    firstControl should be > lastRow
    plan.count(_._2) shouldBe 2
  }

  test("ensure() regenerates when the marker's recorded factor differs") {
    // the _SCALE_OK marker records the factor: reusing a dir built at a
    // different factor would let a factor-stamped sweep artifact record
    // measurements taken on wrong-scale data
    val out = tmpDir("scalegen_factor_marker")
    ScaleGen.ensure(spark, "/root/testdata/sf0.001", out, 2)
    val base = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents").count()
    graft.queries.Tables.t(spark, out, "documents").count() shouldBe base * 2
    ScaleGen.ensure(spark, "/root/testdata/sf0.001", out, 3) // factor changed → regen
    graft.queries.Tables.t(spark, out, "documents").count() shouldBe base * 3
    ScaleGen.ensure(spark, "/root/testdata/sf0.001", out, 3) // same factor → reuse
    graft.queries.Tables.t(spark, out, "documents").count() shouldBe base * 3
  }

  test("ScaleGen factor > 10 uses collision-free fixed-length-2 suffixes") {
    val out = tmpDir("scalegen_f12")
    ScaleGen.generate(spark, "/root/testdata/sf0.001", out, 12)
    val base = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val docs = graft.queries.Tables.t(spark, out, "documents")
    docs.count() shouldBe base.count() * 12
    // replicas may not share a single token: every token carries its
    // replica's suffix, and fixed-length suffixes cannot collide
    // (w1+s1 == w2+s2 with |s1| == |s2| forces s1 == s2)
    val nBase = base.count()
    docs
      .select((col("doc_id") / lit(nBase)).cast("long").as("rep"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(countDistinct(col("rep")).as("reps"))
      .agg(max(col("reps"))).head().getLong(0) shouldBe 1L
  }

  test("ScaleGen factor 100: third suffix tier + Hadamard sign patterns stay exact") {
    // the ×100 curvature point needs BOTH extensions this test pins:
    // (a) a 3-char suffix tier (the 2-char space caps at ×82), same
    // fixed-length no-collision proof; (b) Walsh-Hadamard sign patterns
    // past the rotation space — rotation alone wraps at dims=64, which
    // would make replicas k and k+64 byte-identical (manufactured
    // cross-replica exact dups poisoning every near-dup measurement).
    val out = tmpDir("scalegen_f100")
    ScaleGen.generate(spark, "/root/testdata/sf0.001", out, 100)
    val base = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val docs = graft.queries.Tables.t(spark, out, "documents")
    val nBase = base.count()
    docs.count() shouldBe nBase * 100
    // fixed-length-3 suffixes: no token spans two replicas
    docs
      .select((col("doc_id") / lit(nBase)).cast("long").as("rep"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(countDistinct(col("rep")).as("reps"))
      .agg(max(col("reps"))).head().getLong(0) shouldBe 1L

    val emb = graft.queries.Tables.t(spark, out, "embeddings")
    val baseEmb = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val nVec = baseEmb.count()
    emb.count() shouldBe nVec * 100
    // no embedding is byte-identical across replicas: the rotation-only
    // generator would repeat exactly at rep ± 64 (100 > 64 wraps); the
    // sign patterns break the wrap. Max multiplicity of any vector in
    // the ×100 corpus must equal the source's own max dup multiplicity.
    val srcMaxDup = baseEmb.filter(col("embedding").isNotNull)
      .groupBy(col("embedding")).count().agg(max("count")).head().getLong(0)
    emb.filter(col("embedding").isNotNull)
      .groupBy(col("embedding")).count().agg(max("count")).head().getLong(0) shouldBe srcMaxDup
    // intra-replica dot products are preserved BIT-FOR-BIT in a
    // sign-flipped replica (rep 64 = rotation 0, Hadamard pattern 1):
    // every pairwise cosine of the first 10 source vectors matches
    import graft.operators.Similarity
    def cosines(df: org.apache.spark.sql.DataFrame, lo: Long): Seq[Double] = {
      val ten = df.filter(col("vec_id") >= lo && col("vec_id") < lo + 10)
        .select((col("vec_id") - lo).as("vec_id"), col("embedding"))
      Similarity.cosineNearDupPairs(ten, "vec_id", "embedding", -2.0)
        .orderBy("id_a", "id_b").select("cos_sim")
        .collect().map(_.getDouble(0)).toSeq
    }
    cosines(emb, 64L * nVec) shouldBe cosines(baseEmb, 0L)
  }

  test("plan contracts hold against the sf1.0 files") {
    gen
    import graft.queries.Tables.t
    // dims still broadcast when the fact side is ×1000 the dim side
    val joined = t(spark, bigDir, "customer")
      .join(t(spark, bigDir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(t(spark, bigDir, "region"), col("n_regionkey") === col("r_regionkey"))
    val plan = joined.queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "CartesianProduct"
    // pushdown + pruning still reach the (multi-file) sf1.0 scan
    val scan = t(spark, bigDir, "lineitem")
      .filter(col("l_quantity") > 49).select(col("l_orderkey"))
      .queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    scan should include("PushedFilters")
    scan should include("GreaterThan(l_quantity")
    scan.split("ReadSchema:").last should not include "l_extendedprice"
  }
}
