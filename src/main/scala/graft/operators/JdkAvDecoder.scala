package graft.operators

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO
import javax.imageio.stream.MemoryCacheImageInputStream
import javax.sound.sampled.{AudioFormat, AudioSystem}

import org.apache.spark.sql.Column

/** A REAL media codec behind the [[MediaDecoder]] seam — pure-JDK, so
  * it honors the container constraint (no external image/audio
  * libraries) while decoding genuine compressed payloads:
  *
  *  - JPEG / PNG / GIF / BMP via `javax.imageio` (ships with the JDK),
  *  - WAV (PCM 8/16-bit, any channel count, either endianness) via
  *    `javax.sound.sampled`,
  *  - anything else degrades to the byte-window rule of
  *    [[MediaDecoders.WindowSums]] (the ingest path stays TOTAL: an
  *    unrecognized or corrupt payload gets a deterministic signature
  *    instead of failing the batch mid-shuffle — per-payload, content-
  *    determined, so writer and prober always agree on the rule).
  *
  * Feature semantics (the classic block-hash family — public
  * knowledge, e.g. aHash/blockhash):
  *
  *  - images decode to a `rows×cols ≈ √dim×√dim` grid of MEAN
  *    LUMINANCE (ITU-R BT.601 integer weights) over normalized
  *    coordinates — resolution-invariant by construction, and a
  *    LOCALIZED pixel edit moves only the grid cells it touches, which
  *    is exactly what the banded-LSH machinery needs: untouched bands
  *    still collide exactly (lossless formats), the L1 verify measures
  *    the edit;
  *  - audio decodes to `dim` mean-|amplitude| buckets over normalized
  *    TIME (sample-rate- and channel-count-invariant); silencing a
  *    span moves only the buckets it overlaps;
  *  - both faces share ONE float decode: [[MediaDecoder.featuresMicro]]
  *    is [[MediaDecoder.decode]] quantized to integer MICRO-units
  *    (`round(f · 1e6)`), a contract [[graft.JdkAvDecoderSpec]] pins
  *    element-wise. Banding/L1 therefore run in an exact integer space
  *    (the same discipline that lets the stub faces hash-check), while
  *    the float face feeds the ANN/embedding machinery unchanged.
  *
  * Scale shape: decode is per-row CPU inside ONE codegen'd static call
  * ([[graft.functions.JdkAvFeatures]]) — no shuffle, no join-back, no
  * driver involvement; the banded index/registry/screen machinery is
  * untouched (that is the point of the seam). Decoder identity rides
  * every stored artifact, so an index banded under this codec refuses
  * a window-sums probe and vice versa ([[MediaDecoders.requireMatch]]).
  *
  * Activation: `-Dgraft.media.decoder=graft.operators.JdkAvDecoder`
  * (zero-arg constructible, resolved reflectively at plan-build time —
  * the swap costs nothing in the executor hot path).
  */
class JdkAvDecoder extends MediaDecoder {
  val id: String = JdkAvDecoder.Id

  def featuresMicro(payload: Column, dim: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.JdkAvFeatures(
      ColumnBridge.expression(payload.cast("binary")), dim))
  }

  def decode(bytes: Array[Byte], dim: Int): Array[Float] =
    JdkAvDecoder.decodeFloats(bytes, dim)
}

object JdkAvDecoder {

  /** Versioned: a change to the grid/luminance/bucket rule must change
    * the id, or stored artifacts written under the old rule would
    * band-miss silently instead of hitting the decoder fence. */
  val Id = "jdk-av-v1"

  /** ImageIO's default ImageInputStream spools through a disk-backed
    * temp file — pathological for per-row decode on executors. The
    * decode path below constructs [[MemoryCacheImageInputStream]]s
    * directly, so no global ImageIO state is touched. */

  /** The shared float decode both seam faces consume: sniff the
    * container by magic bytes, decode, featurize to `dim` floats in
    * [0,1]. Total and deterministic for every input. */
  def decodeFloats(bytes: Array[Byte], dim: Int): Array[Float] = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    if (bytes == null || bytes.isEmpty) new Array[Float](dim)
    else if (isImage(bytes)) {
      val f = decodeImage(bytes, dim)
      if (f != null) f else MediaDecoders.WindowSums.decode(bytes, dim)
    } else if (isWav(bytes)) {
      val f = decodeWav(bytes, dim)
      if (f != null) f else MediaDecoders.WindowSums.decode(bytes, dim)
    } else MediaDecoders.WindowSums.decode(bytes, dim)
  }

  /** The integer face: the float face in micro-units. */
  def featuresMicroCompute(bytes: Array[Byte], dim: Int): Array[Long] = {
    val f = decodeFloats(bytes, dim)
    val out = new Array[Long](dim)
    var i = 0
    while (i < dim) { out(i) = Math.round(f(i) * 1e6); i += 1 }
    out
  }

  private def isImage(b: Array[Byte]): Boolean =
    (b.length >= 3 &&
      (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff) || // JPEG
    (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G') ||                                                             // PNG
    (b.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') || // GIF
    (b.length >= 2 && b(0) == 'B' && b(1) == 'M')                                 // BMP

  private def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Grid factorization: rows = ⌊√dim⌋, cols = ⌈dim/rows⌉; cell index
    * r·cols + c, cells at or beyond `dim` skipped (non-square dims
    * drop the grid's tail cells, mirroring the window rule's tail
    * clamp). Cell (r,c) covers the pixel block
    * [r·h/rows,(r+1)·h/rows) × [c·w/cols,(c+1)·w/cols) — normalized
    * coordinates, so two resolutions of the same picture land near the
    * same vector. */
  private def decodeImage(bytes: Array[Byte], dim: Int): Array[Float] =
    try {
      // ImageIO.read(ImageInputStream) closes the stream itself on
      // completion — an extra close() here throws IOException("closed")
      // and would discard the successful decode
      val img = ImageIO.read(
        new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes)))
      if (img == null) null
      else {
        val w = img.getWidth; val h = img.getHeight
        val rows = math.max(1, math.sqrt(dim.toDouble).toInt)
        val cols = (dim + rows - 1) / rows
        val out = new Array[Float](dim)
        var r = 0
        while (r < rows) {
          val y0 = (r.toLong * h / rows).toInt
          val y1 = math.max(y0 + 1, ((r + 1).toLong * h / rows).toInt)
          var c = 0
          while (c < cols && r * cols + c < dim) {
            val x0 = (c.toLong * w / cols).toInt
            val x1 = math.max(x0 + 1, ((c + 1).toLong * w / cols).toInt)
            var sum = 0L
            var y = y0
            while (y < math.min(y1, h)) {
              var x = x0
              while (x < math.min(x1, w)) {
                val rgb = img.getRGB(x, y)
                // BT.601 integer weights; result in [0, 255000]
                sum += 299 * ((rgb >> 16) & 0xff) +
                  587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)
                x += 1
              }
              y += 1
            }
            val n = (math.min(y1, h) - y0).toLong * (math.min(x1, w) - x0)
            out(r * cols + c) =
              if (n <= 0) 0f else (sum.toDouble / (n * 255000.0)).toFloat
            c += 1
          }
          r += 1
        }
        out
      }
    } catch { case _: Exception => null }

  /** PCM frames → `dim` mean-|amplitude| buckets over normalized time;
    * channels averaged per frame. Supports the PCM encodings the JDK's
    * WAVE reader emits (8-bit signed/unsigned, 16-bit signed, either
    * endianness); anything richer returns null → byte-window fallback. */
  private def decodeWav(bytes: Array[Byte], dim: Int): Array[Float] =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val (fmt, data) = try (ais.getFormat, ais.readAllBytes()) finally ais.close()
      val bits = fmt.getSampleSizeInBits
      val ch = fmt.getChannels
      val signed = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED
      val unsigned = fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
      if (!(signed || unsigned) || (bits != 8 && bits != 16) || ch < 1) null
      else {
        val bytesPerSample = bits / 8
        val frameSize = bytesPerSample * ch
        val frames = data.length / frameSize
        if (frames == 0) new Array[Float](dim)
        else {
          val sums = new Array[Double](dim)
          val counts = new Array[Long](dim)
          var f = 0
          while (f < frames) {
            var acc = 0.0
            var c = 0
            while (c < ch) {
              val o = f * frameSize + c * bytesPerSample
              val v =
                if (bits == 8) {
                  if (signed) data(o).toInt / 128.0
                  else ((data(o) & 0xff) - 128) / 128.0
                } else {
                  val b0 = data(o) & 0xff; val b1 = data(o + 1) & 0xff
                  val s =
                    if (fmt.isBigEndian) ((b0 << 8) | b1).toShort
                    else ((b1 << 8) | b0).toShort
                  s / 32768.0
                }
              acc += math.abs(v)
              c += 1
            }
            val b = math.min(dim - 1, (f.toLong * dim / frames).toInt)
            sums(b) += acc / ch
            counts(b) += 1
            f += 1
          }
          Array.tabulate(dim)(i =>
            if (counts(i) == 0) 0f else (sums(i) / counts(i)).toFloat)
        }
      }
    } catch { case _: Exception => null }
}
