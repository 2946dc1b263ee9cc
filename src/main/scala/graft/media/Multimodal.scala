package graft.media

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing (builder mandate): image/audio/video
 * payloads ride as opaque `binary` columns with typed metadata; the
 * decode / feature-extract step is a per-partition batch function over
 * a typed Dataset (the Scala analog of mapInPandas — one JVM call per
 * batch of rows, model/codec handle reused across the partition).
 *
 * IMAGE decode is REAL: the JDK's `javax.imageio` reads PNG/JPEG/BMP/GIF
 * with zero external deps (see `decodeReal`). AUDIO decode is REAL for
 * the container formats the JDK ships codecs for: WAV/AIFF/AU carrying
 * PCM (see `decodeAudioReal`, javax.sound.sampled). Compressed audio
 * (mp3/ogg) and video codecs do not ship in this container, so those
 * payloads fall through to `fakeFeatures`, the deterministic stand-in
 * that keeps the Spark-side plumbing (schema, batching, partitioning,
 * column shapes) real and testable for every modality.
 */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, byte_len: Int, digest: String,
                           features: Array[Float])

  /** True iff the payload starts with a magic header ImageIO can
    * decode (PNG / JPEG / GIF / BMP) — the cheap pre-gate that keeps
    * per-row reader-registry scans out of all-text corpora. */
  def looksLikeImage(payload: Array[Byte]): Boolean =
    payload.length >= 4 && (
      (payload(0) == 0x89.toByte && payload(1) == 'P' && payload(2) == 'N') ||
      (payload(0) == 0xff.toByte && payload(1) == 0xd8.toByte) ||            // JPEG
      (payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F') ||
      (payload(0) == 'B' && payload(1) == 'M'))

  /** Real image decode (JDK ImageIO — PNG/JPEG/BMP/GIF): features are
    * (width, height, bands, mean of each of up to 3 channels) — the
    * shape a downstream vision-model filter consumes. Non-image bytes
    * (or a codec-less modality) return null so callers can route them
    * to the stand-in. Channel means are exact integer sums divided once
    * — deterministic across runs and parallelism.
    *
    * Robustness: the catch is NonFatal, not just IOException — ImageIO
    * readers throw RuntimeExceptions (array bounds, CMM/ICC errors) on
    * payloads with a valid magic but a corrupt body, and a cleaning
    * pipeline must fall back, not kill the task. The disk-backed
    * ImageIO stream cache is disabled once per JVM (the input is
    * already in memory — a temp file per row is pure overhead). */
  def decodeReal(payload: Array[Byte]): Array[Float] = {
    if (!looksLikeImage(payload)) return null
    javax.imageio.ImageIO.setUseCache(false) // idempotent, cheap
    val img =
      try javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) null
    else {
      val w = img.getWidth; val h = img.getHeight
      val raster = img.getRaster
      val bands = raster.getNumBands
      val sums = new Array[Long](math.min(bands, 3))
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var b = 0
          while (b < sums.length) {
            sums(b) += raster.getSample(x, y, b); b += 1
          }
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      Array(w.toFloat, h.toFloat, bands.toFloat) ++
        sums.map(s => (s.toDouble / n).toFloat)
    }
  }

  /** True iff the payload starts with a magic header the JDK's
    * javax.sound.sampled stack decodes without external codecs:
    * WAV (RIFF....WAVE), AIFF/AIFC (FORM....AIF), AU (.snd). */
  def looksLikeAudio(payload: Array[Byte]): Boolean =
    payload.length >= 12 && (
      (payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
        payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'A' &&
        payload(10) == 'V' && payload(11) == 'E') ||
      (payload(0) == 'F' && payload(1) == 'O' && payload(2) == 'R' &&
        payload(3) == 'M' && payload(8) == 'A' && payload(9) == 'I' &&
        payload(10) == 'F') ||
      (payload(0) == '.' && payload(1) == 's' && payload(2) == 'n' &&
        payload(3) == 'd'))

  /** Real audio decode (JDK javax.sound.sampled — WAV/AIFF/AU with
    * 8/16-bit PCM): features are (sampleRate, channels, frames,
    * mean |amplitude| of up to 2 channels) — the shape a downstream
    * audio-quality filter consumes (silence/clipping gates). Means are
    * exact integer sums divided once — deterministic at any
    * parallelism. Non-audio magic, compressed encodings (mp3 inside
    * WAV, ULAW, float PCM) and corrupt bodies return null so callers
    * route them to the stand-in; the catch is NonFatal for the same
    * reason as the image path (header parsers throw RuntimeExceptions
    * on truncated bodies). */
  def decodeAudioReal(payload: Array[Byte]): Array[Float] = {
    if (!looksLikeAudio(payload)) return null
    try {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        val bits = fmt.getSampleSizeInBits
        // frameSize == AudioSystem.NOT_SPECIFIED (-1) would make the
        // frame count negative and emit garbage features — undecodable
        // here, route to the stand-in (ADVICE r4 #3)
        val frameSize = fmt.getFrameSize
        if (!(signed || unsigned) || (bits != 8 && bits != 16) ||
            frameSize <= 0) null
        else {
          val ch = fmt.getChannels
          val big = fmt.isBigEndian
          val data = ais.readAllBytes()
          val frames = data.length / frameSize
          if (frames == 0) null
          else {
            val nCh = math.min(ch, 2)
            val sums = new Array[Long](nCh)
            val bps = bits / 8
            var f = 0
            while (f < frames) {
              var c = 0
              while (c < nCh) {
                val o = f * frameSize + c * bps
                val s =
                  if (bits == 8)
                    if (signed) data(o).toInt else (data(o) & 0xff) - 128
                  else {
                    val (b0, b1) = if (big) (data(o), data(o + 1))
                                   else (data(o + 1), data(o))
                    if (signed) (b0 << 8) | (b1 & 0xff) // b0 carries the sign
                    else (((b0 & 0xff) << 8) | (b1 & 0xff)) - 32768
                  }
                sums(c) += math.abs(s.toLong)
                c += 1
              }
              f += 1
            }
            Array(fmt.getSampleRate, ch.toFloat, frames.toFloat) ++
              sums.map(s => (s.toDouble / frames).toFloat)
          }
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Image/audio decode with the deterministic fallback for
    * undecodable payloads — the default `extractFeatures` decoder. */
  def decodeOrFake(payload: Array[Byte]): Array[Float] = {
    val img = decodeReal(payload)
    if (img != null) img
    else {
      val aud = decodeAudioReal(payload)
      if (aud != null) aud else fakeFeatures(payload)
    }
  }

  /** Deterministic fake "decode": 4 features derived from the bytes
    * (length, first/last byte, simple checksum) — stable across runs. */
  def fakeFeatures(payload: Array[Byte]): Array[Float] = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += (payload(i) & 0xff); i += 1 }
    Array(payload.length.toFloat,
      if (payload.nonEmpty) (payload(0) & 0xff).toFloat else 0f,
      if (payload.nonEmpty) (payload(payload.length - 1) & 0xff).toFloat else 0f,
      (sum % 65536L).toFloat)
  }

  /** Per-partition batched feature extraction (mapInPandas analog):
    * the decoder closure is constructed once per partition, rows stream
    * through it. */
  def extractFeatures(rows: Dataset[MediaRow],
                      decode: Array[Byte] => Array[Float] = decodeOrFake)
                     : Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = java.util.HexFormat.of()
      it.map { r =>
        md.reset()
        // HexFormat, not per-byte "%02x".format: format-string parsing
        // and byte boxing per digest byte is measurable in a hot loop
        // over billions of media rows
        val digest = hex.formatHex(md.digest(r.payload))
        MediaFeatures(r.doc_id, r.payload.length, digest, decode(r.payload))
      }
    }
  }

  /** Pure-Column variant of the metadata path (codegen'd; used by the
    * oracle-gated query — no decode, only the plumbing-visible fields). */
  def metadata(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(col(idCol),
      octet_length(col(binCol)).cast("long").as("byte_len"),
      md5(col(binCol)).as("digest"),
      col(binCol).substr(1, 6).cast("string").startsWith("<html>").as("is_html"),
      (octet_length(col(binCol)).cast("long") % 256).as("f1"),
      ((octet_length(col(binCol)).cast("long") * 2654435761L) % 65536L).as("f2"))
}
