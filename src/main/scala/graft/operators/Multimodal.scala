package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with a typed metadata struct, plus partition-wise decode /
  * feature-extract stages.
  *
  * The Spark-side machinery here is REAL and tested — schema contract,
  * batched per-partition iteration, feature-vector shape — but the codec
  * itself is a STUB: this container has no image/audio libraries, so
  * [[fakeDecodeFeatures]] substitutes a deterministic byte-window mean
  * in place of a JPEG/PCM decoder. Swapping in a real decoder changes
  * ONE function body; the distributed plumbing (the part Spark owns) is
  * unchanged.
  *
  * Scale notes: the decode stage is a narrow mapPartitions — no shuffle,
  * parallelism = input splits; binary payloads never serialize to the
  * driver; metadata extraction is a codegen'd projection.
  */
object Multimodal {

  /** Metadata schema attached alongside every media column. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("size_bytes", LongType),
    StructField("content_hash", StringType)))

  /** Wrap a string column as a binary media payload (test/fixture path:
    * real pipelines land binary directly from the source). */
  def attachPayload(df: DataFrame, srcCol: String, kind: String): DataFrame =
    df.withColumn("media", encode(col(srcCol), "UTF-8"))
      .withColumn("media_meta", struct(
        lit(kind).as("kind"),
        octet_length(col("media")).cast("long").as("size_bytes"),
        md5(col("media")).as("content_hash")))

  /** Codegen'd metadata projection (no decode needed). */
  def extractMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("size_bytes", octet_length(col(binCol)).cast("long"))
      .withColumn("content_hash", md5(col(binCol)))

  /** STUB DECODER — deterministic fake standing in for a real codec.
    * "Decodes" a binary payload into a `dim`-float feature vector by
    * averaging `dim` equal byte windows (values scaled to [0,1]).
    * Replace this body with e.g. a JPEG decode + CNN featurizer; the
    * signature and the distributed shape stay identical. */
  def stubDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (bytes.isEmpty) Array.fill(dim)(0f)
    else {
      val window = math.max(1, bytes.length / dim)
      Array.tabulate(dim) { i =>
        val from = math.min(i * window, bytes.length - 1)
        val until = math.min(from + window, bytes.length)
        var s = 0L; var j = from
        while (j < until) { s += (bytes(j) & 0xff); j += 1 }
        (s.toDouble / ((until - from) * 255.0)).toFloat
      }
    }
  }

  /** Partition-wise decode → feature column. Dataset-typed
    * `mapPartitions` carrying the FULL input row through: no re-join on
    * id, no extra shuffle, one narrow stage — each partition streams
    * through the codec and appends the feature vector in place. The
    * result schema is the input schema plus `features`; `idCol` is kept
    * for signature stability (real codecs often key side outputs) but
    * the plumbing no longer needs it. */
  def fakeDecodeFeatures(df: DataFrame, idCol: String, binCol: String, dim: Int): DataFrame = {
    df.schema.fieldIndex(idCol) // fail fast on a bad id column, like binCol below
    val outSchema = df.schema.add(StructField("features", ArrayType(FloatType)))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes =
          if (row.isNullAt(binIdx)) Array.emptyByteArray
          else row.getAs[Array[Byte]](binIdx)
        Row.fromSeq(row.toSeq :+ stubDecode(bytes, dim).toSeq)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Exact-INTEGER twin of [[stubDecode]] for the dedup path: the
    * payload's decoded character stream is cut into `dim` fixed windows
    * (window = max(1, ⌊len/dim⌋), tail beyond dim·window ignored —
    * [[stubDecode]]'s window rule without its float mean) and each
    * window's character-code SUM is emitted as int64. On the
    * text-fixture payloads (ASCII, [[attachPayload]]) chars == bytes,
    * so this is a byte-window content signature; a real codec replaces
    * the character stream with decoded samples, and the banding /
    * verify machinery downstream is unchanged. All-integer → the whole
    * near-dup face mirrors exactly into SQL (q164). */
  def stubFeaturesMicro(payload: Column, dim: Int): Column =
    // let-bind the decoded code array: without the bind, the per-char
    // split+ascii subtree sits inside the outer transform's lambda and
    // re-evaluates once PER WINDOW (dim× the decode cost — measured
    // 4.1 s for q164 at sf0.1 vs ~1 s bound)
    graft.functions.ArrayOps.bind(
      transform(split(payload.cast("string"), ""),
        c => ascii(c).cast("long"))) { codes =>
      val n = length(payload.cast("string"))
      val w = greatest(lit(1), floor(n / lit(dim)).cast("int"))
      transform(sequence(lit(0), lit(dim - 1)), j => {
        val from = j * w
        val len = greatest(least(from + w, n) - from, lit(0))
        when(len > 0,
          aggregate(slice(codes, from + lit(1), len), lit(0L),
            (acc, x) => acc + x))
          .otherwise(lit(0L))
      })
    }

  /** Banded NEAR-DUP pairs over media payloads — the media column
    * family's answer to the text near-dup suite: candidates are pairs
    * sharing at least one of `dim/bandSize` exact feature BANDS
    * (equi-join on (band_id, band slice) — the SimHash-band discipline,
    * never all-pairs), then verified by exact integer L1 distance over
    * the full [[stubFeaturesMicro]] vector. Output
    * `(id_a, id_b, l1, same_content)` for verified pairs with
    * `l1 <= maxL1`; `same_content` (content-hash equality) splits exact
    * dups (l1 = 0, hash-equal) from aligned near-edits. Scale shape:
    * one banding shuffle + candidate-sized verify joins; the build side
    * broadcasts while it fits ([[graft.functions.Plans.maybeBroadcast]]
    * — pass `broadcastBuild = false` at corpus scale). */
  def mediaNearDupPairs(df: DataFrame, idCol: String, binCol: String,
      dim: Int, bandSize: Int, maxL1: Long,
      broadcastBuild: Boolean = true): DataFrame = {
    require(dim % bandSize == 0, s"bandSize $bandSize must divide dim $dim")
    val nb = dim / bandSize
    val feats = df.filter(col(binCol).isNotNull)
      .select(col(idCol).as("_id"),
        md5(col(binCol)).as("_h"),
        stubFeaturesMicro(col(binCol), dim).as("_f"))
      .localCheckpoint() // feeds banding AND both verify joins once
    val bands = feats.select(col("_id"),
      posexplode(transform(sequence(lit(0), lit(nb - 1)),
        b => slice(col("_f"), b * bandSize + lit(1), lit(bandSize)))))
      .select(col("_id"), col("pos").as("_band"), col("col").as("_key"))
    val cand = bands.select(col("_id").as("id_a"), col("_band"), col("_key"))
      .join(graft.functions.Plans.maybeBroadcast(
        bands.select(col("_id").as("id_b"), col("_band"), col("_key")),
        broadcastBuild),
        Seq("_band", "_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val l1 = aggregate(
      zip_with(col("_fa"), col("_fb"), (x, y) => abs(x - y)),
      lit(0L), (acc, x) => acc + x)
    cand
      .join(graft.functions.Plans.maybeBroadcast(feats.select(
        col("_id").as("id_a"), col("_f").as("_fa"), col("_h").as("_ha")),
        broadcastBuild), Seq("id_a"))
      .join(graft.functions.Plans.maybeBroadcast(feats.select(
        col("_id").as("id_b"), col("_f").as("_fb"), col("_h").as("_hb")),
        broadcastBuild), Seq("id_b"))
      .select(col("id_a"), col("id_b"), l1.as("l1"),
        (col("_ha") === col("_hb")).as("same_content"))
      .filter(col("l1") <= maxL1)
  }

  /** Frame/chunk sampler: split a payload into fixed-size byte chunks and
    * keep every `stride`-th one (the video-frame-sampling shape), as a
    * codegen-friendly generator — explode over a computed chunk index. */
  def sampleChunks(df: DataFrame, idCol: String, binCol: String,
      chunkBytes: Int, stride: Int): DataFrame = {
    val nChunks = ceil(octet_length(col(binCol)).cast("double") / chunkBytes).cast("int")
    df.select(col(idCol), col(binCol), posexplode(sequence(lit(0), greatest(nChunks - 1, lit(0)))))
      .filter(col("pos") % stride === 0)
      .select(
        col(idCol),
        col("pos").as("chunk_id"),
        substring(col(binCol), col("pos") * chunkBytes + 1, lit(chunkBytes)).as("chunk"))
  }
}
