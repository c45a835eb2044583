package graft.operators

import org.apache.spark.sql.Column

/** Pluggable media-codec seam (round-14 verdict item 4).
  *
  * The multimodal machinery — banding, L1 verify, bloom screens, probe
  * registry routing — never cares HOW a payload becomes a feature
  * vector, only that the same payload always becomes the same vector.
  * This trait is that boundary: a real JPEG/PCM codec lands as ONE
  * class implementing it (plus one JVM property to activate it), and
  * every banded index, ingest screen and registry route picks it up
  * with zero changes to the distributed plumbing, which is the part
  * Spark owns and the part this repo proves.
  *
  * Two faces, because the engine has two decode paths:
  *  - [[featuresMicro]] — the INTEGER feature column the dedup/routing
  *    machinery bands and verifies on. It must be a native Column
  *    expression (codegen-friendly, no UDF): the stub is the
  *    [[graft.functions.CharWindowSums]] expression; a real codec
  *    supplies its own expression wrapping the library call.
  *  - [[decode]] — the row-level float decode used by the
  *    `mapPartitions` feature stage ([[Multimodal.fakeDecodeFeatures]]),
  *    where a real codec calls straight into its library.
  *
  * Decoder identity is part of a stored artifact's CONTRACT: an index
  * banded under codec A must never be probed under codec B (the bands
  * would silently never collide — 100% false negatives, not an error).
  * Writers record [[id]] in the artifact's geometry row and readers
  * fail loudly on a mismatch ([[MediaDecoders.requireMatch]]).
  */
trait MediaDecoder extends Serializable {

  /** Stable identifier recorded in stored-artifact geometry; a reader
    * under a different active decoder fails loudly instead of probing
    * bands that can never match. */
  def id: String

  /** Binary payload column → `dim`-wide int64 feature vector, as a
    * native (codegen-capable) Column expression — the integer feature
    * space all banding / L1-verify / registry routing runs in. */
  def featuresMicro(payload: Column, dim: Int): Column

  /** Row-level decode for the partition-wise float-feature stage:
    * raw payload bytes → `dim` floats. */
  def decode(bytes: Array[Byte], dim: Int): Array[Float]
}

/** Registry/resolution for the process-wide active [[MediaDecoder]].
  *
  * Resolution: `-Dgraft.media.decoder=<fully.qualified.ClassName>`
  * names a zero-arg-constructible implementation; unset means
  * [[MediaDecoders.WindowSums]] — the deterministic byte-window stub.
  * A REAL pure-JDK codec exists ([[JdkAvDecoder]]: JPEG/PNG/GIF/BMP
  * via javax.imageio, WAV via javax.sound) and is spec-proven through
  * the full banded/stored/registry machinery; WindowSums stays the
  * DEFAULT because the declared media queries hash-check against SQL
  * oracles, and a byte-window signature is the one feature rule DuckDB
  * can reproduce — decoding JPEGs is not.
  * The property is read at PLAN-BUILD time (driver-side, once per
  * query construction — never per row), so swapping costs nothing in
  * the executor hot path and specs can exercise the seam by setting
  * and clearing the property around a query build.
  */
object MediaDecoders {

  /** The default decoder — the container-honest STUB codec. Both faces
    * share one window rule (window = max(1, ⌊len/dim⌋), tail beyond
    * dim·window ignored): [[decode]] emits per-window byte means scaled
    * to [0,1] (the float stand-in for "decode + featurize"), and
    * [[featuresMicro]] emits exact per-window character-code sums (the
    * integer signature the dedup faces band on — on ASCII fixtures
    * chars == bytes, so it is a byte-window content signature). A real
    * codec replaces the window rule with decoded samples; everything
    * downstream is unchanged. */
  object WindowSums extends MediaDecoder {
    val id = "window-sums"

    def featuresMicro(payload: Column, dim: Int): Column = {
      import org.apache.spark.sql.graftbridge.ColumnBridge
      ColumnBridge.column(graft.functions.CharWindowSums(
        ColumnBridge.expression(payload.cast("string")), dim))
    }

    def decode(bytes: Array[Byte], dim: Int): Array[Float] = {
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
  }

  /** JVM property naming the active decoder class. */
  val Property = "graft.media.decoder"

  /** The active decoder: the [[Property]]-named class, else
    * [[WindowSums]]. Resolved per call — calls happen at plan-build
    * time only, and per-call resolution is what lets a spec (or a
    * long-lived driver) swap codecs between query builds without
    * stale-cache surprises. */
  def active: MediaDecoder = sys.props.get(Property) match {
    case None => WindowSums
    case Some(cn) =>
      try Class.forName(cn).getDeclaredConstructor()
        .newInstance().asInstanceOf[MediaDecoder]
      catch { case e: Exception => throw new IllegalArgumentException(
        s"$Property=$cn does not name a zero-arg-constructible MediaDecoder", e) }
  }

  /** Stored-artifact decoder fence: `stored` is the decoder id read
    * from an artifact's geometry (None for artifacts written before
    * the id was recorded — those predate pluggability and are
    * window-sums by construction). Probing under a different decoder
    * would not error anywhere downstream — bands would simply never
    * collide — so the mismatch must fail HERE, loudly. */
  def requireMatch(stored: Option[String], active: MediaDecoder,
      what: String): Unit = {
    val storedId = stored.getOrElse(WindowSums.id)
    require(storedId == active.id,
      s"$what was written under decoder '$storedId' but the active " +
        s"decoder is '${active.id}' — probing would band-miss every " +
        "payload (silent 100% false negatives); rebuild the artifact " +
        s"under '${active.id}' or activate '$storedId'")
  }
}
