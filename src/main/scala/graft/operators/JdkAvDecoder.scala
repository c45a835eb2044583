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

  /** Versioned RULE id: a change to the grid/luminance/bucket rule
    * must change this, or stored artifacts written under the old rule
    * would band-miss silently instead of hitting the decoder fence.
    * (v2 = alpha compositing onto white — a featurization change for
    * every payload with an alpha channel, so the version bumped per
    * this invariant rather than leaning on the canary suffix, which
    * exists to encode ENVIRONMENT drift, not rule revisions.) */
  val RuleId = "jdk-av-v2"

  /** The full decoder identity = rule id + an ENVIRONMENT CANARY.
    *
    * The rule id alone cannot catch cross-environment decode drift: a
    * JDK whose JPEG decoder rounds differently, or a classpath that
    * gains/loses an ImageIO plugin (changing not just values but WHICH
    * payloads decode vs fall back), would produce different features
    * under the same rule-id string — the silent 100%-false-negative
    * case the fence exists to prevent. So the id folds in a canary:
    * the micro-feature vectors of three embedded fixtures (JPEG, PNG,
    * and a hand-rolled PCM WAV) decoded through the FULL rule at
    * class-init, plus the sorted registered ImageIO reader-format set.
    * Same environment → same suffix (fixtures are constants, decode is
    * deterministic in-JVM); a drifted reader, plugin set, or rounding
    * behavior → a different id → the stored-artifact fence fails
    * LOUDLY with a rebuild instruction instead of probing bands that
    * can never collide. (The canary certifies the JVM that computes
    * it — driver and executors share one JVM under local[*]; on a real
    * cluster a heterogeneous-JVM fleet should pin one JDK image, which
    * this id makes checkable per artifact.) */
  lazy val Id: String = s"$RuleId+${computeEnvCanary()}"

  /** Recompute the full id from scratch (bypassing [[Id]]'s caching) —
    * the spec's determinism pin: a nondeterministic canary would
    * otherwise hide behind the lazy val. */
  private[graft] def recomputeId: String = s"$RuleId+${computeEnvCanary()}"

  private def computeEnvCanary(): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    // canaryArgbPng certifies the ALPHA read path specifically: a
    // reader that drifts only in tRNS/16-bit-alpha handling would
    // leave the opaque fixtures' features untouched
    for (fx <- Seq(canaryJpeg, canaryPng, canaryArgbPng, canaryWav);
         v <- featuresMicroCompute(fx, 16)) {
      var i = 0
      while (i < 8) { md.update(((v >>> (56 - 8 * i)) & 0xff).toByte); i += 1 }
    }
    // registered read-side SPI sets, BOTH modalities (which payloads
    // decode vs fall back is classpath-determined on each). Names are
    // 0x00-separated — a bare concatenation would let differently-
    // split name lists collide — and lowercased under Locale.ROOT (a
    // tr-locale JVM would otherwise dotless-i "GIF" into a different
    // digest on an identical JDK/classpath).
    val audioReaders = {
      val it = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b += "audio:" + it.next().getClass.getName
      b.result()
    }
    val names =
      ImageIO.getReaderFormatNames.toSeq
        .map(_.toLowerCase(java.util.Locale.ROOT)) ++ audioReaders
    names.distinct.sorted.foreach { n =>
      md.update(n.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      md.update(0.toByte)
    }
    md.digest().take(4).map(b => f"${b & 0xff}%02x").mkString
  }

  /** 8×8 RGB gradient, default-quality JPEG / PNG encodes (embedded as
    * constants — re-encoding at runtime would fold WRITER drift into a
    * canary that exists to certify the read path). */
  private lazy val canaryJpeg: Array[Byte] = java.util.Base64.getDecoder.decode(
    "/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRofHh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/2wBDAQkJCQwLDBgNDRgyIRwhMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjL/wAARCAAIAAgDASIAAhEBAxEB/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/8QAHwEAAwEBAQEBAQEBAQAAAAAAAAECAwQFBgcICQoL/8QAtREAAgECBAQDBAcFBAQAAQJ3AAECAxEEBSExBhJBUQdhcRMiMoEIFEKRobHBCSMzUvAVYnLRChYkNOEl8RcYGRomJygpKjU2Nzg5OkNERUZHSElKU1RVVldYWVpjZGVmZ2hpanN0dXZ3eHl6goOEhYaHiImKkpOUlZaXmJmaoqOkpaanqKmqsrO0tba3uLm6wsPExcbHyMnK0tPU1dbX2Nna4uPk5ebn6Onq8vP09fb3+Pn6/9oADAMBAAIRAxEAPwBvhj4c/c/c/pRRRTpVZcppkOd4z6nH3j//2Q==")

  private lazy val canaryPng: Array[Byte] = java.util.Base64.getDecoder.decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAgAAAAICAIAAABLbSncAAAAhElEQVR4Xg3IwQAEQRADwDAsQzMsQxiGIQzDEIZhCMMyNMMx9OOmngUAhYco4TUYrIYG+/ZTVaxXRddKqWtPGeDtl6S4TIW76eEB9JZuL0nWjtw6owBmedG3t+34tDP+gKyKmK3cPkk636SBVvVmW33ct7/unv4Bs2vMOZp4vszt38z8ASv7XoF2yxaRAAAAAElFTkSuQmCC")

  /** 8×8 ARGB gradient with PARTIAL alpha (α = x·32) — exercises the
    * alpha-composite read path the opaque fixtures cannot. */
  private lazy val canaryArgbPng: Array[Byte] = java.util.Base64.getDecoder.decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAgAAAAICAYAAADED76LAAAAzElEQVR4XhWNobFEIQwAU8MVwCCo4SkEMjVEUUAKQDGUEIVmqCEFoF4BqEj01YD491fv7AL84z4eYkhAT4aCDToNUF6w64EAHwgu+BCfFAhzKNRC5xG0rrDlAP4UdI/HiAmJMhZu2OtAlYV7HmB4gB16jpSYOHOpjbsM1rl46wH5NcSRl8hJqGYp0qTPIapL9ntAgUAde401KUnWMpt2Harv0m0H7DcxV71FSUYzW9Fm/R2mtmx/D1yocJ34G2e6pPmWt91u4+p33X3PH7SndUFzYvyXAAAAAElFTkSuQmCC")

  /** 64 frames of 16-bit mono PCM with a hand-rolled canonical 44-byte
    * RIFF header (no AudioSystem.write — writer drift must not move a
    * read-path canary); StrictMath keeps the samples bit-identical
    * across platforms. */
  private lazy val canaryWav: Array[Byte] = {
    val frames = 64
    val pcm = new Array[Byte](frames * 2)
    for (i <- 0 until frames) {
      val s = (StrictMath.sin(i * 0.3) * 9000).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val out = java.nio.ByteBuffer.allocate(44 + pcm.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.putInt(36 + pcm.length)
    out.put("WAVEfmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.putInt(16).putShort(1).putShort(1) // PCM, mono
    out.putInt(8000).putInt(16000)         // rate, byte rate
    out.putShort(2).putShort(16)           // block align, bits
    out.put("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.putInt(pcm.length).put(pcm)
    out.array()
  }

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
  private def decodeImage(bytes: Array[Byte], dim: Int): Array[Float] = {
    // hoisted so the catch path can release it: ImageIO.read can throw
    // BEFORE selecting a reader (a third-party SPI's canDecodeInput),
    // and it only closes the stream itself when a reader WAS found
    val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val img = ImageIO.read(iis)
      if (img == null) {
        // ImageIO.read closes the stream only when a READER WAS FOUND
        // — on the no-reader path the stream is still open and must be
        // released here (a batch of unreadable payloads would otherwise
        // queue one native-resource cleanup per row on the executors)
        try iis.close() catch { case _: Exception => () }
        null
      } else {
        val w = img.getWidth; val h = img.getHeight
        val rows = math.max(1, math.sqrt(dim.toDouble).toInt)
        val cols = (dim + rows - 1) / rows
        val out = new Array[Float](dim)
        // bulk scanline reads: per-pixel getRGB pays a ColorModel
        // conversion + bounds check per CALL — on a 12-megapixel JPEG
        // that is 12M calls on the ingest hot path; the scanline form
        // computes identical ARGB values ~an order of magnitude cheaper
        val rowBuf = new Array[Int](w)
        var r = 0
        while (r < rows) {
          val y0 = (r.toLong * h / rows).toInt
          val yEnd = math.min(math.max(y0 + 1, ((r + 1).toLong * h / rows).toInt), h)
          var c = 0
          while (c < cols && r * cols + c < dim) {
            val x0 = (c.toLong * w / cols).toInt
            val xEnd = math.min(
              math.max(x0 + 1, ((c + 1).toLong * w / cols).toInt), w)
            val cw = xEnd - x0
            var sum = 0L
            var y = y0
            while (y < yEnd) {
              img.getRGB(x0, y, cw, 1, rowBuf, 0, cw)
              var i = 0
              while (i < cw) {
                val argb = rowBuf(i)
                val a = (argb >>> 24) & 0xff
                // BT.601 luminance in [0, 255000], alpha-composited
                // onto WHITE (the block-hash convention): two PNGs
                // that RENDER identically must featurize identically
                // even if transparent regions carry different hidden
                // RGB. One division per cell; the int64 sum is exact,
                // and the final toDouble stays exact below 2^53 — at
                // ≤ 255·255000 per pixel that is ~1.4e8 pixels per
                // CELL (a 12k×12k image at dim = 1; any practical dim
                // pushes the bound into the billions). Opaque pixels
                // (a = 255) reduce to plain luminance bit-for-bit
                // within that range.
                val lum = 299 * ((argb >> 16) & 0xff) +
                  587 * ((argb >> 8) & 0xff) + 114 * (argb & 0xff)
                sum += a.toLong * lum + 255000L * (255 - a)
                i += 1
              }
              y += 1
            }
            val n = (yEnd - y0).toLong * cw
            out(r * cols + c) =
              if (n <= 0) 0f else (sum.toDouble / (n * 255.0 * 255000.0)).toFloat
            c += 1
          }
          r += 1
        }
        out
      }
    } catch {
      case _: Exception =>
        try iis.close() catch { case _: Exception => () }
        null
    }
  }

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
