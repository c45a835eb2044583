package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableRound

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Brute-force cosine top-k is the correctness baseline: broadcast the
  * query vector(s), compute the dot product with codegen'd higher-order
  * functions (`zip_with` + `aggregate` — no UDF, no Python), global
  * top-k via orderBy+limit (Spark plans TakeOrderedAndProject: per-
  * partition heaps, only k rows reach the driver — scales to any corpus
  * size as long as k is small).
  *
  * The scale path is sign-bucket partitioning (an LSH/IVF hybrid): each
  * vector lands in a bucket keyed by the sign pattern of its leading
  * components; queries probe only their own bucket. Bucket assignment is
  * a narrow projection, the probe is a broadcast-joined filter — no
  * all-pairs shuffle.
  */
object Similarity {

  private def asDouble(vec: Column): Column = vec.cast("array<double>")

  /** Fused native cosine similarity ([[graft.functions.CosineSimilarity]]):
    * one loop, three scalar accumulators, no intermediate arrays (the
    * zip_with/aggregate composition allocates a product array and walks
    * each input three times per row — prohibitive in all-pairs scoring).
    * Sums run left-to-right — bitwise-reproducible against engines that
    * fold sequentially, which the DuckDB oracle's list_dot_product does. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.ArrayOps.cosineSimilarity(a, b)

  /** Embedding-cosine near-duplicate pairs: all (a, b), a < b, with
    * cosine ≥ `threshold`. Completes the dedup family (exact, MinHash,
    * SimHash, Jaccard, embedding). Plan shape mirrors
    * [[graft.operators.Dedup.jaccardPairs]]: broadcast build side +
    * explicit-N stream repartition so the quadratic scoring spreads
    * across cores instead of collapsing onto a handful of join-key
    * tasks. At corpus scale the generator is [[bucketedTopK]]'s sign
    * buckets; this is the exact verifier shape. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, broadcastBuild: Boolean = true): DataFrame = {
    val nPart = graft.functions.Plans.shufflePartitions(df)
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a")).repartition(nPart)
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(graft.functions.Plans.maybeBroadcast(b, broadcastBuild), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        PortableRound.round4(cosine(col("vec_a"), col("vec_b"))).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** All-pairs cosine of `df` against the (tiny, broadcast) `queries`
    * frame; round for cross-engine float stability. */
  def scoreAgainst(df: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String): DataFrame =
    df.crossJoin(broadcast(queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("_qvec"))))
      .select(
        col("query_id"),
        col(idCol),
        PortableRound.round4(cosine(col(vecCol), col("_qvec"))).as("cos_sim"))

  /** Brute-force top-k: TakeOrderedAndProject — no full sort, no big
    * collect. Deterministic tie-break on id. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int): DataFrame =
    scoreAgainst(df, idCol, vecCol, queries, qIdCol, qVecCol)
      .orderBy(col("query_id").asc, col("cos_sim").desc, col(idCol).asc)
      .limit(k)

  /** Sign-pattern bucket id from the leading `nBits` components:
    * bit j set iff vec[j] > 0. Narrow projection, no shuffle. */
  def signBucket(vec: Column, nBits: Int): Column =
    (0 until nBits)
      .map(j => when(element_at(asDouble(vec), j + 1) > 0.0, lit(1L << j)).otherwise(0L))
      .reduce[Column](_ + _)

  /** IVF/LSH-bucketed ANN: probe only the query's sign bucket. Recall is
    * partial (that's the ANN trade) but cost is corpus/2^nBits per
    * query. */
  def bucketedTopK(df: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, nBits: Int = 8): DataFrame = {
    val corpus = df.withColumn("_bucket", signBucket(col(vecCol), nBits))
    val q = queries.select(
      col(qIdCol).as("query_id"),
      col(qVecCol).as("_qvec"),
      signBucket(col(qVecCol), nBits).as("_bucket"))
    corpus.join(broadcast(q), Seq("_bucket"))
      .select(
        col("query_id"),
        col(idCol),
        PortableRound.round4(cosine(col(vecCol), col("_qvec"))).as("cos_sim"))
      .orderBy(col("query_id").asc, col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }
}
