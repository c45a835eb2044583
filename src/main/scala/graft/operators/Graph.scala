package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.CheckpointBridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Link-graph centrality: fixed-iteration PageRank in exact integer
  * micro-units.
  *
  * Why it's here: crawl frontiers and seed lists are prioritized by
  * link centrality (PageRank / harmonic centrality over the host
  * graph — the Common Crawl ranking move), which makes graph
  * importance a first-class corpus-curation signal alongside quality
  * and dedup. The engine's other graph op (connected components,
  * `Clustering`) answers "which docs are the same"; this one answers
  * "which nodes matter".
  *
  * Portability design: the classic float PageRank drifts across
  * engines (sum order, damping multiplies). Here every iteration is
  * pure 64-bit integer arithmetic — ranks live in micro-units (initial
  * rank 10⁶ per node), a node's per-neighbor contribution is
  * `rank div degree` (floor division of non-negatives, identical in
  * Spark's `div` and DuckDB's `//`), and damping 0.85 is
  * `150000 + (85 * Σcontribs) div 100`. Integer sums are associative
  * and order-independent, so a fixed iteration count yields BITWISE
  * equal ranks in any engine — the ExactAgg discipline applied to an
  * iterative algorithm.
  *
  * Scale shape (100 TB): per iteration the plan is one edges⋈ranks
  * equi-join (shuffle on the edge's src key) + one dst-keyed sum
  * (partial-combined) + one node-keyed join to re-attach degrees —
  * the canonical Pregel superstep expressed declaratively, no
  * driver-side graph state. Edges and degrees are computed once and
  * persisted (at cluster scale: checkpointed) so the k iterations
  * re-read a materialized edge list instead of re-deriving it; ranks
  * are node-sized, never edge-sized. The iteration count is a fixed
  * small constant, so the whole computation is one static DAG that
  * Catalyst/AQE plans end-to-end. Small graphs short-circuit to a
  * driver-side solve of the same recurrence (see
  * [[DefaultDriverSolveMaxEdges]]) — identical ranks, none of the
  * per-superstep scheduling latency.
  */
object Graph {

  /** Edge-count ceiling for the driver-side solve — the
    * [[Clustering.DefaultDriverSolveMaxEdges]] pattern applied to
    * PageRank: on a graph this small the distributed loop's cost is
    * per-superstep job scheduling, not data (the round-10 q126
    * finding: ~160k edges at bench SF spent seconds on ~10 stage
    * launches), while 2M edges collect to ~32 MB and iterate locally
    * in well under a second. The arithmetic is pure int64 either way,
    * so both paths produce BITWISE equal ranks (spec-pinned). */
  val DefaultDriverSolveMaxEdges: Long = 2000000L

  /** PageRank over the undirected closure of `pairs` (each input pair
    * (a, b) becomes edges a→b and b→a; duplicates removed). Every node
    * of an undirected graph has degree ≥ 1 and receives at least one
    * contribution per superstep, so the inner joins are total — no
    * dangling-node mass correction is needed.
    *
    * Input columns: `a`, `b` (long-castable). Output: (node, deg,
    * rank_micro) — rank in micro-units after `iterations` damped
    * supersteps from a uniform 10⁶ start.
    *
    * Adaptive execution: the deduped pair list is counted first; at or
    * below `driverSolveMaxEdges` undirected-closure edges the fixed
    * iterations run on the driver over the collected (bounded) edge
    * list — identical integer recurrence, identical ranks, none of the
    * per-superstep scheduling latency that dominates small graphs.
    * Above the ceiling the declarative superstep loop runs (pass 0 to
    * force it).
    */
  /** The returned frame is backed by a node-sized local checkpoint /
    * local rows (that is what lets the edge-sized caches drop at
    * return instead of living as long as the caller's plan); a
    * long-lived driver calling this repeatedly should
    * `CheckpointBridge.release` the frame once done with it rather
    * than waiting for the ContextCleaner. */
  def pageRankUndirectedMicro(pairs: DataFrame, aCol: String, bCol: String,
      iterations: Int,
      driverSolveMaxEdges: Long = DefaultDriverSolveMaxEdges): DataFrame = {
    require(iterations >= 1 && iterations <= 10,
      s"iterations must be in [1,10], got $iterations")
    // dedup + null-filter ONCE, distributed (at 100 TB the raw pair
    // list is the big side; what's collected is the deduped
    // projection), materialized so the size probe and the superstep
    // loop don't re-run the upstream plan
    val p = pairs.select(col(aCol).cast("long").as("src"),
      col(bCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .transform(Checkpoints.stable)
    // each deduped pair yields ≤ 2 closure edges. One BOUNDED collect
    // decides the path AND feeds the solve (a separate count() was a
    // second full scan of the checkpoint): limit caps driver exposure
    // at ceiling/2 + 1 rows, and a short read means the graph fits.
    val lim = (math.min(driverSolveMaxEdges, Int.MaxValue.toLong - 2L) / 2 + 1).toInt
    val head = p.limit(lim).collect()
    if (head.length < lim) {
      val out = driverSolve(pairs.sparkSession, head, iterations)
      CheckpointBridge.release(p)
      return out
    }
    val (ranks, edges, deg) = pageRankFrame(p, "src", "dst", iterations)
    // Materialize the closure caches FIRST and release the pair
    // checkpoint BEFORE any superstep runs: above the driver ceiling
    // the pair list and the (2×) closure cache are BOTH edge-scale, and
    // holding them simultaneously through the iterations oversubscribes
    // the storage pool — the measured sf10 regime (59M pairs + 118M
    // closure edges on an 8 GB heap) failed 37 cache unrolls and paid
    // disk re-reads in every superstep. One deg.count() builds both
    // caches in a single job; after it, the supersteps read only the
    // sorted closure blocks.
    deg.count()
    CheckpointBridge.release(p)
    // Materialize the node-sized result so the edge-sized caches can be
    // dropped NOW instead of pinning executor storage until the caller's
    // frame is GC'd — on a long-lived driver the edge list is the big
    // side and repeated pagerank calls would otherwise accumulate it.
    val out = Checkpoints.stable(ranks)
    edges.unpersist(blocking = false)
    deg.unpersist(blocking = false)
    out
  }

  /** The driver-side fixed-iteration solve: the same integer recurrence
    * over the collected deduped pair list. Primitive throughout (dense
    * node indexes, the undirected closure packed as sorted+deduped
    * (srcIdx<<32|dstIdx) longs, long-array ranks/degrees/sums) — the
    * boxed HashMap form it replaced spent ~1 s of the bench wall on
    * autoboxing at the 2M-edge ceiling; this is ~10×. The arithmetic is
    * unchanged — `rank div deg` contributions, `150000 + (85·Σ) div
    * 100` damping — and integer sums are order-free, so ranks stay
    * BITWISE equal to the distributed loop (spec-pinned). */
  private def driverSolve(spark: SparkSession, rows: Array[Row],
      iterations: Int): DataFrame = {
    val idToIdx = new java.util.HashMap[Long, Integer](rows.length * 2)
    val idsBuf = new java.util.ArrayList[java.lang.Long]()
    def idx(n: Long): Int = {
      var i = idToIdx.get(n)
      if (i == null) { i = idToIdx.size(); idToIdx.put(n, i); idsBuf.add(n) }
      i
    }
    val packed = new Array[Long](rows.length * 2)
    var m = 0
    rows.foreach { r =>
      val a = idx(r.getLong(0)); val b = idx(r.getLong(1))
      packed(m) = (a.toLong << 32) | (b.toLong & 0xffffffffL); m += 1
      packed(m) = (b.toLong << 32) | (a.toLong & 0xffffffffL); m += 1
    }
    // sort + in-place dedup = the closure's set semantics (an input
    // containing both (a,b) and (b,a) contributes each edge once)
    java.util.Arrays.sort(packed, 0, m)
    var e = 0
    var i = 0
    while (i < m) {
      if (i == 0 || packed(i) != packed(i - 1)) { packed(e) = packed(i); e += 1 }
      i += 1
    }
    val n = idToIdx.size()
    val deg = new Array[Long](n)
    i = 0
    while (i < e) { deg((packed(i) >>> 32).toInt) += 1; i += 1 }
    var rank = Array.fill(n)(1000000L)
    for (_ <- 1 to iterations) {
      val sums = new Array[Long](n)
      i = 0
      while (i < e) {
        val src = (packed(i) >>> 32).toInt
        // non-negative: floor ≡ Spark's div
        sums((packed(i) & 0xffffffffL).toInt) += rank(src) / deg(src)
        i += 1
      }
      rank = sums.map(s => 150000L + 85L * s / 100L)
    }
    val out = new java.util.ArrayList[Row](n)
    i = 0
    while (i < n) { out.add(Row(idsBuf.get(i).longValue(), deg(i), rank(i))); i += 1 }
    spark.createDataFrame(out, StructType(Seq(
      StructField("node", LongType), StructField("deg", LongType),
      StructField("rank_micro", LongType))))
  }

  /** The un-materialized superstep pipeline (plus the two persisted
    * frames backing it), split out so plan contracts can assert the
    * per-superstep shuffle count on the REAL iteration plan — the
    * public method checkpoints the result, which truncates the plan to
    * an opaque scan. */
  private[graft] def pageRankFrame(pairs: DataFrame, aCol: String,
      bCol: String, iterations: Int): (DataFrame, DataFrame, DataFrame) = {
    require(iterations >= 1 && iterations <= 10,
      s"iterations must be in [1,10], got $iterations")
    val ab = pairs.select(col(aCol).cast("long").as("src"),
      col(bCol).cast("long").as("dst"))
      // a null endpoint would inflate the partner's degree and leak its
      // rank share to a phantom node that vanishes at the next join —
      // silently wrong centrality (Clustering filters the same way)
      .filter(col("src").isNotNull && col("dst").isNotNull)
    // ONE closure shuffle, then a cache that satisfies every superstep's
    // distribution AND ordering (round-14 verdict item 2 — the sf10
    // re-shape; at 100 TB the edge list is the big side, so every
    // avoided edge-sized exchange/sort is the lever):
    //  - repartition on src FIRST, then distinct(): hash-clustering by
    //    src already co-locates equal (src, dst) rows, so the dedup's
    //    ClusteredDistribution(src, dst) is satisfied and plans WITHOUT
    //    its own exchange — the previous distinct-then-repartition
    //    shape paid two full edge-list shuffles in the build;
    //  - sortWithinPartitions(src) before caching: the cached scan then
    //    exposes src-ordering, so each superstep's sort-merge join
    //    STREAMS the edge blocks — the unsorted cache re-sorted all
    //    k·|E| rows across the iterations (at sf10: 3 × 118M-row sorts
    //    competing with the cache for the same unified memory);
    //  - deg inherits src-clustering from its groupBy (no exchange) and
    //    is sorted once too, and each superstep's dst-sum output is
    //    clustered on dst (= the next join's key after rename), so the
    //    only per-iteration shuffle is the unavoidable contribution
    //    re-key from src to dst (partial-combined map-side).
    val edges = ab
      .union(ab.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
      .distinct()
      .sortWithinPartitions("src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .sortWithinPartitions("src")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // state carries (node, deg, rank_micro); deg rides along so each
    // superstep needs exactly one join back onto node-sized state
    var ranks = deg.select(col("src").as("node"), col("deg"),
      lit(1000000L).as("rank_micro"))
    for (_ <- 1 to iterations) {
      val sums = edges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("rank_micro div deg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      ranks = deg
        .join(sums.withColumnRenamed("dst", "src"), "src")
        .select(col("src").as("node"), col("deg"),
          (lit(150000L) + expr("(85 * s) div 100")).as("rank_micro"))
    }
    (ranks, edges, deg)
  }
}
