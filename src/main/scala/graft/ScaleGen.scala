package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Tables

/** Deterministic ×N upscaler for the driver testdata — the local stand-in
  * for "the same workload at 10× the data" (VERDICT round-7 item 1).
  *
  * Each replica k ∈ [0, factor) is the source data with every surrogate
  * key shifted by k·(max(key)+1), so intra-replica join cardinalities,
  * group sizes, dup rates, and skew are EXACTLY the source's, while
  * replicas are disjoint — row counts, distinct keys, and join outputs
  * all grow ×factor. Two columns need more than a key shift to keep the
  * scaled corpus statistically representative rather than degenerate:
  *
  *  - `documents.text`: replica k>0 suffixes a replica-specific
  *    fixed-length letter code to every whitespace token.
  *    Token/shingle vocabularies become
  *    disjoint across replicas (no cross-replica MinHash/LSH or n-gram
  *    collisions), while within a replica the dup/near-dup structure is
  *    byte-for-byte the source's. A naive exact copy would instead make
  *    every doc a 10-way near-dup group — candidate-pair counts would
  *    grow ~×45 for distribution (not engine) reasons, poisoning the
  *    scaling measurement.
  *  - `embeddings.embedding`: replica k rotates the 64-dim vector by k
  *    positions. Rotation preserves every intra-replica dot product and
  *    norm bit-for-bit (so per-replica ANN/near-dup structure is
  *    unchanged) while cross-replica cosines decorrelate.
  *
  * Fixed dimensions (`region`, `nation`, and FK columns into them) are
  * copied unshifted — at 10× the fact data the dimension tables of a
  * star schema do NOT grow, which is exactly the broadcast-join
  * assumption the engine's plans rely on.
  *
  * Output parquet uses plain session-tz TIMESTAMP for `events.ts`
  * (one of the three encodings `Tables.t` normalizes). A `_SCALE_OK`
  * marker stamps a completed build; `ensure` reuses a marked dir. */
object ScaleGen {

  private def keyBase(df: DataFrame, col0: String): Long =
    df.agg(max(col(col0))).head().getLong(0) + 1L

  /** Shift `cols` of `df` by `rep * base(col)`; `rep` must exist. */
  private def shifted(df: DataFrame, bases: Map[String, Long]): DataFrame =
    bases.foldLeft(df) { case (d, (c, b)) =>
      d.withColumn(c, col(c) + col("rep") * lit(b))
    }

  private def replicate(df: DataFrame, factor: Int): DataFrame =
    df.crossJoin(spark_range(df.sparkSession, factor))

  private def spark_range(s: SparkSession, n: Int): DataFrame =
    s.range(n.toLong).select(col("id").cast("int").as("rep"))

  /** Generate `outDir` as a ×`factor` upscale of `srcDir`. Overwrites. */
  def generate(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int): Unit = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(outDir), true)

    def src(name: String): DataFrame = Tables.t(spark, srcDir, name)
    def write(name: String, df: DataFrame, parts: Int): Unit =
      df.repartition(parts)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")

    // fixed dims: copied as-is (star-schema dims don't grow with facts)
    write("region", src("region"), 1)
    write("nation", src("nation"), 1)

    // key bases from the source maxima (FK offsets == PK offsets)
    val custB = keyBase(src("customer"), "c_custkey")
    val suppB = keyBase(src("supplier"), "s_suppkey")
    val partB = keyBase(src("part"), "p_partkey")
    val ordB = keyBase(src("orders"), "o_orderkey")
    val evB = keyBase(src("events"), "event_id")
    val userB = keyBase(src("events"), "user_id")
    val docB = keyBase(src("documents"), "doc_id")
    val vecB = keyBase(src("embeddings"), "vec_id")

    write("customer",
      shifted(replicate(src("customer"), factor), Map("c_custkey" -> custB))
        .drop("rep"), factor)
    write("supplier",
      shifted(replicate(src("supplier"), factor), Map("s_suppkey" -> suppB))
        .drop("rep"), 1)
    write("part",
      shifted(replicate(src("part"), factor), Map("p_partkey" -> partB))
        .drop("rep"), factor)
    write("orders",
      shifted(replicate(src("orders"), factor),
        Map("o_orderkey" -> ordB, "o_custkey" -> custB)).drop("rep"), factor)
    write("lineitem",
      shifted(replicate(src("lineitem"), factor),
        Map("l_orderkey" -> ordB, "l_partkey" -> partB, "l_suppkey" -> suppB))
        .drop("rep"), factor * 2)
    // events: same time window, ×factor traffic (more users, same rate
    // per user) — sessionization group sizes stay the source's
    write("events",
      shifted(replicate(src("events"), factor),
        Map("event_id" -> evB, "user_id" -> userB)).drop("rep"), factor)

    // documents: per-replica token suffix keeps replicas non-near-dup.
    // Suffixes are FIXED-LENGTH within a run (1 letter through factor
    // 10, 2 letters beyond): with equal lengths, w1+s1 == w2+s2 forces
    // w1 == w2 AND s1 == s2, so SUFFIXED vocabularies can never collide
    // across replicas (a variable-length scheme could: "x"+"qq" ==
    // "xq"+"q"). Replica 0 keeps the UNSUFFIXED source text, so the
    // proof does not cover replica-0-vs-k collisions: those need the
    // source vocabulary to contain both w and w+suffixLetter (e.g.
    // "no"/"now") — verified absent from the driver vocabulary, and
    // ScaleSweepSpec's no-token-spans-two-replicas assertion is the
    // per-dataset guard if the generator is ever fed other text.
    // 9 letters: 1-char ≤ ×10, 2-char ≤ ×82, 3-char ≤ ×730 (the ×100
    // curvature point needs the third tier)
    val letters = "qzjxvkwyb"
    val L = letters.length
    require(factor <= L * L * L + 1,
      s"factor ${factor} > ${L * L * L + 1} suffix space")
    def sfx(k: Int): String =
      if (factor <= L + 1) letters(k - 1).toString
      else if (factor <= L * L + 1)
        s"${letters((k - 1) / L)}${letters((k - 1) % L)}"
      else s"${letters((k - 1) / (L * L))}${letters(((k - 1) / L) % L)}${letters((k - 1) % L)}"
    val sfxCol = array((lit("") +: (1 until factor).map(k => lit(sfx(k)))): _*)
    write("documents",
      replicate(src("documents"), factor)
        .withColumn("sfx", element_at(sfxCol, col("rep") + 1))
        .withColumn("text",
          when(col("rep") === 0 || col("text").isNull, col("text"))
            .otherwise(array_join(
              transform(split(col("text"), " "),
                w => when(w === "", w).otherwise(concat(w, col("sfx")))),
              " ")))
        .withColumn("n_chars",
          when(col("text").isNull, col("n_chars"))
            .otherwise(length(col("text")).cast("long")))
        .withColumn("doc_id", col("doc_id") + col("rep") * lit(docB))
        .drop("rep", "sfx"), factor)

    // embeddings: rotate by rep — intra-replica dot products preserved.
    // Rotation alone wraps at `dims` (replicas k and k+dims would be
    // BYTE-IDENTICAL — at the ×100 point with 64-dim vectors that
    // manufactures cross-replica exact dups and poisons every near-dup
    // measurement), so replicas beyond the rotation space also apply a
    // WALSH-HADAMARD sign pattern: pattern m = rep/dims flips component
    // j iff popcount(j & m) is odd. Signs are exact in FP and identical
    // within a replica, so every intra-replica dot product is still
    // preserved bit-for-bit, while distinct (rotation, pattern) pairs
    // decorrelate cross-replica cosines like rotation already did.
    // m = 0 for rep < dims ⇒ byte-identical to the rotation-only
    // generator for every factor ≤ dims (existing ×10/×30 artifacts
    // stay comparable).
    val dims = src("embeddings").select(size(col("embedding")))
      .head().getInt(0)
    // the (rotation, pattern) space is finite: only the low
    // ceil(log2 dims) bits of m = rep/dims reach a component index, so
    // patterns wrap at 2^ceil(log2 dims) and replicas k and
    // k + dims*2^ceil(log2 dims) are byte-identical again. dims^2 is
    // the conservative floor of that bound (exact when dims is a power
    // of two); the suffix-space require above does NOT cover small
    // dims, so fail loudly instead of silently manufacturing
    // cross-replica exact dups past the wrap.
    require(factor.toLong <= dims.toLong * dims,
      s"factor $factor > dims^2 = ${dims.toLong * dims} sign-pattern space " +
        s"for $dims-dim embeddings; extend the pattern family before scaling further")
    write("embeddings",
      replicate(src("embeddings"), factor)
        .withColumn("embedding",
          // null guard (text has the same one): transform over a NULL
          // array would otherwise yield a non-null array of NULLs for
          // replicas k>0, silently changing null semantics at scale
          when(col("embedding").isNull, col("embedding"))
            .otherwise(transform(sequence(lit(1), lit(dims)), i => {
              val rot = element_at(col("embedding"),
                ((i - 1 + col("rep")) % dims) + 1)
              val m = floor(col("rep") / lit(dims)).cast("int")
              val flipped = bit_count((i - 1).cast("int").bitwiseAND(m)) % 2
              rot * (lit(1) - lit(2) * flipped).cast("float")
            })))
        .withColumn("vec_id", col("vec_id") + col("rep") * lit(vecB))
        .drop("rep"), 2)

    // the marker records the FACTOR: a reused dir must prove it holds
    // the requested scale, or a factor-stamped sweep artifact could
    // silently record measurements taken on wrong-factor data
    val ok = fs.create(new org.apache.hadoop.fs.Path(outDir, "_SCALE_OK"), true)
    ok.write(factor.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ok.close()
  }

  /** Generate unless a completed build OF THIS FACTOR is already at
    * `outDir` (legacy factor-less markers regenerate once). */
  def ensure(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(outDir, "_SCALE_OK")
    val stamped = scala.util.Try {
      val in = fs.open(marker)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8).trim
      finally in.close()
    }.toOption
    if (!stamped.contains(factor.toString))
      generate(spark, srcDir, outDir, factor)
  }
}
