package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.queries.Tables.t

/** Dev-only profiling entry point — not part of the engine surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scratch] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // warmup
    time("warmup_count")(t(spark, dir, "documents").count())

    val docs = t(spark, dir, "documents")
    val toks = docs.select(col("lang").as("block"), col("doc_id").as("id"),
      array_sort(array_distinct(split(col("text"), " "))).as("toks"))

    time("tokenize_only")(toks.count())

    // stage 1: pure pair enumeration, no intersect
    val a = toks.repartition(32).select(col("block"), col("id").as("id_a"),
      col("toks").as("toks_a"), size(col("toks")).cast("long").as("n_a"))
    val b = toks.select(col("block"), col("id").as("id_b"),
      col("toks").as("toks_b"), size(col("toks")).cast("long").as("n_b"))
    val pairs = a.as("A").join(broadcast(b.as("B")),
      col("A.block") === col("B.block") && col("id_a") < col("id_b"))
    time("pair_enum_only")(pairs.count())

    // stage 2: with custom intersect
    time("pairs_custom_intersect")(
      pairs.select(graft.functions.ArrayOps.sortedIntersectSize(col("toks_a"), col("toks_b")).as("n"))
        .agg(sum("n")).count())

    // stage 3: with array_intersect
    time("pairs_array_intersect")(
      pairs.select(size(array_intersect(col("toks_a"), col("toks_b"))).as("n"))
        .agg(sum("n")).count())

    // full operator
    time("q24_full")(Dedup.jaccardPairs(docs, "doc_id", "text", "lang", 0.5).count())
    time("q24_full_again")(Dedup.jaccardPairs(docs, "doc_id", "text", "lang", 0.5).count())

    time("q22_full")(Dedup.minhashCandidates(docs, "doc_id", "text", 16, 4).count())
    time("q22_full_again")(Dedup.minhashCandidates(docs, "doc_id", "text", 16, 4).count())

    time("q30_full")(Dedup.lshVerifiedPairs(docs, "doc_id", "text", 16, 4, 0.5).count())
    time("q30_full_again")(Dedup.lshVerifiedPairs(docs, "doc_id", "text", 16, 4, 0.5).count())

    {
      val emb = t(spark, dir, "embeddings")
      val pairs = graft.operators.Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.4)
      time("q29_pairs")(pairs.count())
      val cached = pairs.localCheckpoint()
      time("cc_only")(graft.operators.Clustering
        .connectedComponents(cached, "id_a", "id_b").count())
      time("q32_full")(graft.operators.Clustering
        .assignClusters(emb, "vec_id", pairs, "id_a", "id_b").count())
    }

    // experiment: packed-long distinct for candidate pairs
    {
      import graft.functions.PortableHash
      val K = 16; val BAND = 4
      val sig = Dedup.minhashSignature(docs, "doc_id", "text", K)
      val bands = Dedup.lshBands(sig, "doc_id", K, BAND)
      val a = bands.select(col("doc_id").as("id_a"), col("band_id"), col("band_key"))
      val b = bands.select(col("doc_id").as("id_b"), col("band_id"), col("band_key"))
      val packed = a.join(broadcast(b), Seq("band_id", "band_key"))
        .filter(col("id_a") < col("id_b"))
        .select((col("id_a") * 4294967296L + col("id_b")).as("pk"))
        .distinct()
        .select(shiftright(col("pk"), 32).as("id_a"),
          (col("pk") % 4294967296L).as("id_b"))
      time("q22_packed")(packed.count())
      time("q22_packed_again")(packed.count())
    }

    spark.stop()
  }
}
