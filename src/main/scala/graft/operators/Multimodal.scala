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
  def stubFeaturesMicro(payload: Column, dim: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.CharWindowSums(
      ColumnBridge.expression(payload.cast("string")), dim))
  }

  /** Composed-functions reference implementation of
    * [[stubFeaturesMicro]] — kept ONLY as the parity pin for the
    * native [[graft.functions.CharWindowSums]] (MultimodalSpec asserts
    * element-wise equality, multi-byte inputs included). The decoded
    * code array is let-bound (ArrayOps.bind); un-bound, the per-char
    * split+ascii subtree re-evaluates once per window (dim× the decode
    * cost — 4.1 s vs 2.2 s for q164 at sf0.1). The native expression
    * replaces even the bound form because the per-character string
    * array and the interpreted window folds still dominated the
    * media-dedup corpus pass. */
  private[graft] def stubFeaturesMicroComposed(payload: Column, dim: Int): Column =
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
    val feats = featsFrame(df, idCol, binCol, dim)
      .localCheckpoint() // feeds banding AND both verify joins once
    val bands = bandsFrame(feats, dim, bandSize)
    val cand = bands.select(col("_id").as("id_a"), col("_band"), col("_key"))
      .join(graft.functions.Plans.maybeBroadcast(
        bands.select(col("_id").as("id_b"), col("_band"), col("_key")),
        broadcastBuild),
        Seq("_band", "_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    verifyL1(cand, maxL1,
      graft.functions.Plans.maybeBroadcast(feats.select(
        col("_id").as("id_a"), col("_f").as("_fa"), col("_h").as("_ha")),
        broadcastBuild),
      graft.functions.Plans.maybeBroadcast(feats.select(
        col("_id").as("id_b"), col("_f").as("_fb"), col("_h").as("_hb")),
        broadcastBuild))
  }

  /** (id, content hash, integer feature vector) for every non-null
    * payload — the shared front end of all media-dedup faces. */
  private def featsFrame(df: DataFrame, idCol: String, binCol: String,
      dim: Int): DataFrame =
    df.filter(col(binCol).isNotNull)
      .select(col(idCol).as("_id"),
        md5(col(binCol)).as("_h"),
        stubFeaturesMicro(col(binCol), dim).as("_f"))

  /** Exploded (id, band index, band slice) rows — the LSH-band key
    * space the candidate equi-joins run on. */
  private def bandsFrame(feats: DataFrame, dim: Int, bandSize: Int): DataFrame =
    feats.select(col("_id"),
      posexplode(transform(sequence(lit(0), lit(dim / bandSize - 1)),
        b => slice(col("_f"), b * bandSize + lit(1), lit(bandSize)))))
      .select(col("_id"), col("pos").as("_band"), col("col").as("_key"))

  /** Exact integer L1 verify over banded candidates; shared tail of the
    * inline and stored faces. */
  private def verifyL1(cand: DataFrame, maxL1: Long,
      featsA: DataFrame, featsB: DataFrame): DataFrame = {
    val l1 = aggregate(
      zip_with(col("_fa"), col("_fb"), (x, y) => abs(x - y)),
      lit(0L), (acc, x) => acc + x)
    cand.join(featsA, Seq("id_a"))
      .join(featsB, Seq("id_b"))
      .select(col("id_a"), col("id_b"), l1.as("l1"),
        (col("_ha") === col("_hb")).as("same_content"))
      .filter(col("l1") <= maxL1)
  }

  /** Persist the media-dup index for [[mediaNearDupAgainstStored]] and
    * the stream pre-screen — [[graft.operators.Dedup.writeSubstringScreenArtifact]]'s
    * discipline for the media modality, built once per frozen corpus:
    * `dir/feats` = (id, content hash, integer feature vector),
    * `dir/bands` = the exploded band-key rows, `dir/meta` = one row
    * (dim, band_size + a serialized bloom over xxhash64(band, key) for
    * the stateless ingest pre-screen). */
  def writeMediaDupIndex(spark: org.apache.spark.sql.SparkSession,
      ref: DataFrame, idCol: String, binCol: String,
      dim: Int, bandSize: Int, dir: String, fpp: Double = 0.001): Unit = {
    require(dim % bandSize == 0, s"bandSize $bandSize must divide dim $dim")
    import org.apache.spark.sql.graftbridge.BloomBridge
    val feats = featsFrame(ref, idCol, binCol, dim)
      .localCheckpoint() // feeds the feats write, the bands write AND the bloom
    // fail fast on an empty reference: bloom_filter_agg over zero rows
    // is null — the substring-screen artifact's NullType-literal trap
    val bands = bandsFrame(feats, dim, bandSize).localCheckpoint()
    val nBands = bands.count()
    require(nBands > 0, "reference has no media payloads to index")
    feats.write.mode("overwrite").parquet(s"$dir/feats")
    bands.write.mode("overwrite").parquet(s"$dir/bands")
    val bloom = bands
      .agg(BloomBridge.bloomAgg(xxhash64(col("_band"), col("_key")), nBands, fpp))
      .head().getAs[Array[Byte]](0)
    spark.range(1).select(lit(bloom).as("bloom"), lit(dim).as("dim"),
        lit(bandSize).as("band_size"))
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Banded near-dup of a PROBE batch against the STORED media index —
    * "is this incoming payload a near-dup of anything in the frozen
    * corpus": candidates from the probe's band keys equi-joined into
    * the stored band table, exact integer L1 verify against the stored
    * feature vectors. Output `(id_a = probe id, id_b = indexed id, l1,
    * same_content)`. Scale shape: the STORED side is the big one —
    * the probe batch broadcasts into the stored bands/feats scans
    * (pass `broadcastProbe = false` only for corpus-sized probes),
    * so per ingest batch the index is scanned, never shuffled. */
  def mediaNearDupAgainstStored(spark: org.apache.spark.sql.SparkSession,
      dir: String, df: DataFrame, idCol: String, binCol: String,
      maxL1: Long, broadcastProbe: Boolean = true): DataFrame = {
    val meta = spark.read.parquet(s"$dir/meta").head()
    val dim = meta.getAs[Number]("dim").intValue()
    val bandSize = meta.getAs[Number]("band_size").intValue()
    val probeF = featsFrame(df, idCol, binCol, dim).localCheckpoint()
    val cand = spark.read.parquet(s"$dir/bands")
      .select(col("_id").as("id_b"), col("_band"), col("_key"))
      .join(graft.functions.Plans.maybeBroadcast(
        bandsFrame(probeF, dim, bandSize)
          .select(col("_id").as("id_a"), col("_band"), col("_key")),
        broadcastProbe),
        Seq("_band", "_key"))
      .select(col("id_a"), col("id_b")).distinct()
    verifyL1(cand, maxL1,
      graft.functions.Plans.maybeBroadcast(probeF.select(
        col("_id").as("id_a"), col("_f").as("_fa"), col("_h").as("_ha")),
        broadcastProbe),
      spark.read.parquet(s"$dir/feats").select(
        col("_id").as("id_b"), col("_f").as("_fb"), col("_h").as("_hb")))
  }

  /** STREAMING media pre-screen — [[graft.operators.Dedup.streamSubstringScreenBloom]]'s
    * discipline for the media modality: drop stream payloads with ANY
    * feature band hitting the stored index's band bloom. Entirely
    * row-local (the feature decode, the band keys, and the bloom probe
    * are one narrow codegen'd projection: no state, no join, no
    * watermark). Zero false negatives — every payload that would band-
    * collide with the frozen corpus drops; bloom false positives
    * over-drop at the fpp — the ingest-side trade; batch exactness,
    * when needed, reruns [[mediaNearDupAgainstStored]]'s L1 verify over
    * the retained batch. Null payloads PASS THROUGH (no bands → no
    * hit; nullity screening is a separate upstream gate — the
    * substring screen's convention). */
  def streamMediaScreenBloom(stream: DataFrame, binCol: String,
      filterBytes: Array[Byte], dim: Int, bandSize: Int): DataFrame = {
    require(dim % bandSize == 0, s"bandSize $bandSize must divide dim $dim")
    import org.apache.spark.sql.graftbridge.BloomBridge
    val bandKeys = transform(sequence(lit(0), lit(dim / bandSize - 1)),
      b => slice(stubFeaturesMicro(col(binCol), dim), b * bandSize + lit(1),
        lit(bandSize)))
    // (band index, key) hashes must match the writer's
    // xxhash64(_band, _key): posexplode's pos and the lambda index are
    // both 0-based ints
    stream.filter(col(binCol).isNull ||
      !exists(transform(bandKeys, (k, i) => BloomBridge.mightContain(
        filterBytes, xxhash64(i, k))), hit => hit))
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
