package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{ExactAgg, PortableRound}

/** Vector-column aggregation beyond similarity search: per-group
  * centroids over an embedding column — cluster prototypes for IVF
  * training, semantic-group summaries, drift monitoring.
  *
  * Plan shape: posexplode to (group, pos, component) — a narrow per-row
  * expansion, dim× rows but tiny ones — then ONE partial-aggregated
  * hash aggregate keyed (group, pos). Parallelism is groups×dim, so the
  * shuffle never bottlenecks on group count alone; re-assembly sorts
  * the dim-sized struct list per group. Component means use the
  * engine's exact decimal summation ([[ExactAgg]]) + portable rounding,
  * so results are bitwise-reproducible across engines and partitionings.
  */
object Embeddings {

  /** Deterministic ±1 sign matrix for [[srpProjectMicro]]
    * (outDims × dims): sign(j)(i) = +1 iff the engine's portable
    * 32-bit md5 hash of the literal string `srp:<j>:<i>` is even —
    * computed here with java MessageDigest but BIT-EQUAL to
    * [[graft.functions.PortableHash.md5Hash32]] on the same string
    * (first 4 digest bytes as an unsigned int; spec-pinned), which is
    * what lets the DuckDB oracle regenerate the matrix from
    * `md5(concat('srp:', j, ':', i))` instead of shipping 1024
    * literals. Model-sized, built once on the driver. */
  def srpSigns(dims: Int, outDims: Int): Array[Array[Long]] = {
    require(dims >= 1 && outDims >= 1, "need dims >= 1, outDims >= 1")
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(outDims, dims) { (j, i) =>
      val d = md.digest(s"srp:$j:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if ((d(3) & 1) == 0) 1L else -1L
    }
  }

  /** Signed random projection (Achlioptas/JL with ±1 entries) of a
    * float embedding column into `outDims` exact int64 micro-unit
    * components: out_j = Σᵢ sign(j)(i)·⌊vᵢ·1e6+0.5⌋. The
    * dimension-reduction front end for the ANN/clustering family — a
    * 64→16 projection cuts every downstream distance loop and sign
    * bucket 4× — and, because signs are hash-derived and the sums are
    * integer, the WHOLE projection is oracle-portable (q153), unlike
    * float Gaussian projections.
    *
    * Plan shape: one narrow projection — quantization runs ONCE per
    * row (let-bound via [[graft.functions.ArrayOps.bind]]) and each
    * output component is a fused [[graft.functions.DotMicro]] loop
    * (no per-output product-array allocation — the same fusion the
    * k-means argmin measured at 6× on the ×100 face); no join, no
    * shuffle. Output exploded to (id, j, out_j) rows so downstream
    * re-assembly or per-component comparison is a plain groupBy.
    * Malformed rows (null vector, wrong dimensionality, null
    * component) DROP explicitly — mirrored in the oracle — rather
    * than emitting all-null projections. Cosine/L2 geometry is
    * preserved in the JL sense (distortion spec-checked loosely);
    * exact equality is only claimed for the projection itself. */
  def srpProjectMicro(df: DataFrame, idCol: String, vecCol: String,
      dims: Int, outDims: Int): DataFrame =
    srpProjectMicroVec(df, idCol, vecCol, dims, outDims)
      .select(col(idCol), posexplode(col("_proj")).as(Seq("j", "out_j")))
      .select(col(idCol), col("j").cast("long").as("j"), col("out_j"))

  /** [[srpProjectMicro]] kept in ARRAY form — `(idCol, _proj:
    * array<bigint>)` — for consumers that feed the projection straight
    * into a distance loop ([[srpShortlistRerank]]) and would otherwise
    * pay an explode + groupBy re-assembly shuffle to undo the row
    * form. Same validity filter, same values; the exploded face is a
    * posexplode over this one. */
  def srpProjectMicroVec(df: DataFrame, idCol: String, vecCol: String,
      dims: Int, outDims: Int): DataFrame = {
    val signs = srpSigns(dims, outDims)
    val outs = graft.functions.ArrayOps.bind(Similarity.microQuant(col(vecCol))) {
      vq => array(signs.map(row =>
        graft.functions.ArrayOps.dotMicro(vq, typedLit(row.toSeq))): _*)
    }
    df.filter(col(vecCol).isNotNull && size(col(vecCol)) === dims &&
        !exists(col(vecCol), x => x.isNull))
      .select(col(idCol), outs.as("_proj"))
  }

  /** The composed dimension-reduction ANN pipeline — the reason
    * [[srpProjectMicro]] exists: shortlist candidates by exact int64
    * squared-L2 in the PROJECTED space (outDims components per
    * distance instead of dims — the 4× cut at 64→16), then re-rank the
    * shortlist by exact FULL-dimension micro squared-L2. JL distortion
    * can only cost recall at the shortlist boundary; everything the
    * shortlist admits is ordered by the true metric.
    *
    * Plan shape, scan by scan: (1) one narrow corpus scan projects to
    * outDims and scores against the BROADCAST projected queries
    * (queries are ingest-sized by contract); the per-query shortlist
    * is a row_number window whose `<= shortlist` filter Spark pushes
    * into a per-partition WindowGroupLimit — each map partition
    * forwards at most |queries|·shortlist rows, so the window shuffle
    * is output-sized, never corpus-sized. (2) the rerank joins the
    * (|queries|·shortlist)-row shortlist BACK to the corpus as a
    * broadcast equi-join — a semi-join-pruned second scan, no shuffle
    * of corpus data — and windows over shortlist-sized input. At
    * 100 TB the whole operator is two corpus scans and two tiny
    * broadcasts.
    *
    * Everything is integer (micro-unit quantization, int64 distance
    * folds via the fused [[graft.functions.L2MicroSquared]]), ties
    * break on id, so the complete pipeline — projection, shortlist
    * membership, final ranking — is oracle-portable and hash-checked
    * (q154). Projected components are guarded against int64 distance
    * overflow the same way [[Similarity.microQuant]] guards raw
    * components: loudly, per element, at ≤ √(Long.Max/4·outDims).
    *
    * Returns `(query_id, idCol, d2)`, `k` rows per query, ordered by
    * the caller. */
  def srpShortlistRerank(df: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      dims: Int, outDims: Int, shortlist: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val lim = math.sqrt(9.223372036854775e18 / (4.0 * outDims))
    def guarded(proj: Column): Column = transform(proj, x =>
      when(abs(x).cast("double") > lim, raise_error(concat(
        lit("srpShortlistRerank: |projected component| overflows exact " +
          "int64 distances at this outDims: "), x.cast("string"))))
        .otherwise(x))
    val cp = srpProjectMicroVec(df, idCol, vecCol, dims, outDims)
      .select(col(idCol), guarded(col("_proj")).as("_cp"))
    val qp = srpProjectMicroVec(queries, qIdCol, qVecCol, dims, outDims)
      .select(col(qIdCol).as("query_id"), guarded(col("_proj")).as("_qp"))
    val slWin = Window.partitionBy(col("query_id"))
      .orderBy(col("_pd2").asc, col(idCol).asc)
    val sl = cp.crossJoin(broadcast(qp))
      .select(col("query_id"), col(idCol),
        graft.functions.ArrayOps.l2MicroSquared(col("_cp"), col("_qp")).as("_pd2"))
      .withColumn("_r", row_number().over(slWin))
      .filter(col("_r") <= shortlist)
      .select(col("query_id"), col(idCol))
    val rkWin = Window.partitionBy(col("query_id"))
      .orderBy(col("d2").asc, col(idCol).asc)
    // Same validity predicate as srpProjectMicroVec: without it, a
    // malformed corpus row (wrong dimensionality with an oversized
    // component) that the SHORTLIST phase and the oracle both drop
    // would still reach microQuant here and raise — the rerank scan
    // must honor the same "malformed rows DROP" contract on dirty data.
    df.filter(col(vecCol).isNotNull && size(col(vecCol)) === dims &&
        !exists(col(vecCol), x => x.isNull))
      .select(col(idCol), Similarity.microQuant(col(vecCol)).as("_cv"))
      .join(broadcast(sl), Seq(idCol))
      .join(broadcast(queries.select(col(qIdCol).as("query_id"),
        Similarity.microQuant(col(qVecCol)).as("_qv"))), Seq("query_id"))
      .select(col("query_id"), col(idCol),
        graft.functions.ArrayOps.l2MicroSquared(col("_cv"), col("_qv")).as("d2"))
      .withColumn("_r", row_number().over(rkWin))
      .filter(col("_r") <= k)
      .drop("_r")
  }

  /** Per-`labelCol` exact component-wise mean of `vecCol` (4dp) plus
    * member count. Vectors must share one dimensionality. Output:
    * (label, n, centroid: array&lt;double&gt;). */
  def centroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val comps = df.select(col(labelCol),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "c")))
    val perPos = comps.groupBy(col(labelCol), col("pos"))
      .agg(
        PortableRound.round4(ExactAgg.avgExact(col("c"))).as("m"),
        count(lit(1)).as("n_pos"))
    perPos.groupBy(col(labelCol))
      .agg(
        max(col("n_pos")).as("n"),
        transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"))
  }
}
