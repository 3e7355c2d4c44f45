package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal.MediaRow

/** AUDIO fingerprinting and near-dup over the repo's shared Hamming stack.
  *
  * Decode is REAL for the containers/encodings the JDK ships parsers for
  * (`javax.sound.sampled.AudioSystem`: WAV/AIFF/AU with 8- or 16-bit PCM
  * payloads — zero external libraries, same stance as
  * [[Multimodal.ImageIoDecoder]]); anything else falls back to the
  * deterministic byte surrogate so a mixed-media column never kills a
  * 100 TB scan. A real deployment swaps a JNI codec (mp3/flac/opus) into
  * the same per-partition seam.
  *
  * Fingerprint (the audio analog of [[ImageDedup]]'s dHash — published
  * lineage: energy-envelope / band-energy sign fingerprints per Haitsma &
  * Kalker ISMIR'02): mix to mono, pool the absolute amplitude into the
  * SAME 72-cell grid geometry as dHash (9 cells × 8 segments), then the
  * identical gradient bit-packing ([[ImageDedup.dHashBytesFromGrid]]) —
  * bit (r, c) = cell (r, c+1) > cell (r, c) — rendered as 16 hex chars.
  * Sharing the byte layout is the point: banding, Hamming verify,
  * clustering ([[ImageDedup.imageClusters]]), the persisted incremental
  * index ([[ImageDedup.writeImageHashIndex]] family), and the streaming
  * ingest loop all apply to audio hashes UNCHANGED — one Hamming stack,
  * three modalities (image / video frames / audio).
  *
  * Robustness by construction: gradient bits see only the envelope SHAPE,
  * so uniform amplitude scaling (volume change) preserves every
  * comparison when window populations are equal (exact: the spec locks
  * it), and re-encoding 16-bit ↔ 8-bit preserves the envelope up to
  * quantization.
  */
object Audio {

  /** Windows = the dHash grid (9 × 8 = 72): 8 gradient bits per
    * 9-window segment, 8 segments spanning the clip.
    */
  val Windows: Int = ImageDedup.GridCells // 72

  /** Code-point samples pooled per window on the surrogate column path. */
  val SamplesPerWindow = 4

  /** Real decoded-audio metadata; `decoded = false` rows carry the
    * surrogate fallback (size-derived) values.
    */
  final case class AudioMeta(
      id: Long, decoded: Boolean, sampleRate: Int, channels: Int,
      bitsPerSample: Int, nFrames: Long, durationMs: Long)

  /** REAL decode: container parse via `AudioSystem` (WAV/AIFF/AU), PCM
    * payload read directly — 8-bit (signed or unsigned, centered) and
    * 16-bit (both endiannesses) integer PCM, any channel count. Returns
    * the format plus the per-frame MONO amplitude, mono(i) =
    * floorDiv(Σ_channels sample, channels). None for NULL payloads,
    * containers no JDK parser accepts, non-PCM encodings (μ-law/GSM —
    * the JNI seam), zero-frame clips, and non-positive/NaN/NOT_SPECIFIED
    * sample rates (a hostile header would otherwise divide-by-zero the
    * duration math); NonFatal-guarded throughout
    * (a hostile payload must never kill the scan).
    */
  def decodePcm(payload: Array[Byte]): Option[(javax.sound.sampled.AudioFormat, Array[Long])] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    if (payload == null) return None
    val ais =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (ais == null) return None
    try {
      val fmt = ais.getFormat
      val enc = fmt.getEncoding
      val bits = fmt.getSampleSizeInBits
      val ch = fmt.getChannels
      val signed = enc == AudioFormat.Encoding.PCM_SIGNED
      val unsigned = enc == AudioFormat.Encoding.PCM_UNSIGNED
      if (!(signed || unsigned)) return None
      if (bits != 8 && bits != 16) return None
      if (ch < 1 || fmt.getFrameSize != ch * (bits / 8)) return None
      // A crafted header can carry sample rate 0 / negative /
      // NOT_SPECIFIED (-1); downstream duration math divides by it, so
      // treat it as a decode rejection like the other malformed shapes.
      if (!(fmt.getSampleRate > 0f) || math.round(fmt.getSampleRate) < 1) return None
      val bytes = ais.readAllBytes()
      val frameSize = fmt.getFrameSize
      val n = bytes.length / frameSize // trailing partial frame ignored
      if (n < 1) return None
      val big = fmt.isBigEndian
      val mono = new Array[Long](n)
      var i = 0
      while (i < n) {
        var s = 0L
        var c = 0
        while (c < ch) {
          val off = i * frameSize + c * (bits / 8)
          val v =
            if (bits == 8) {
              if (signed) bytes(off).toLong
              else (bytes(off) & 0xff).toLong - 128L // center unsigned
            } else {
              val b0 = bytes(off) & 0xff
              val b1 = bytes(off + 1) & 0xff
              val raw = if (big) (b0 << 8) | b1 else (b1 << 8) | b0
              val sv = raw.toShort.toLong // wrap to signed 16-bit
              if (signed) sv else ((raw - 32768) & 0xffff).toShort.toLong
            }
          s += v
          c += 1
        }
        mono(i) = Math.floorDiv(s, ch)
        i += 1
      }
      Some((fmt, mono))
    } catch { case scala.util.control.NonFatal(_) => None }
    finally {
      try ais.close() catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** 72-window absolute-amplitude envelope of a mono signal — the
    * [[ImageDedup.grayPool]] analog: window j covers frames
    * [j·n/72, (j+1)·n/72) widened to at least one frame, value =
    * floor(Σ|sample| / count). Deterministic integer math.
    */
  def envelopeGrid(mono: Array[Long]): Array[Long] = {
    val n = mono.length
    require(n >= 1, "envelopeGrid: at least one frame required")
    val out = new Array[Long](Windows)
    var j = 0
    while (j < Windows) {
      val lo = (j.toLong * n / Windows).toInt
      val hi = math.max(lo + 1, (((j + 1).toLong * n) / Windows).toInt)
      var s = 0L
      var k = lo
      while (k < hi) { s += math.abs(mono(k)); k += 1 }
      out(j) = s / (hi - lo)
      j += 1
    }
    out
  }

  /** Energy-envelope hash row-bytes of a REAL audio payload, or None when
    * [[decodePcm]] rejects it — same 8-byte layout as dHash.
    */
  def audioHash(payload: Array[Byte]): Option[Array[Int]] =
    decodePcm(payload).map { case (_, mono) =>
      ImageDedup.dHashBytesFromGrid(envelopeGrid(mono))
    }

  /** Per-partition audio hashing over a media column: real decode first,
    * [[ImageDedup.dHashSurrogateBytes]] for payloads no JDK parser
    * accepts — the same one-pass batch shape as [[ImageDedup.dHashImages]].
    * Output: (id, ahash). Feed the result straight into
    * [[ImageDedup.imageClusters]] / the hash-index family.
    */
  def audioHashes(media: Dataset[MediaRow]): DataFrame =
    media.mapPartitions { rows =>
      rows.map { m =>
        val bytes = audioHash(m.payload)
          .getOrElse(ImageDedup.dHashSurrogateBytes(m.payload))
        (m.id, ImageDedup.hexOf(bytes))
      }
    }(Encoders.product[(Long, String)]).toDF("id", "ahash")

  /** Real audio metadata per payload (`decoded = true`): sample rate,
    * channels, bit depth, frame count, floor duration in ms. Fallback
    * rows (`decoded = false`) derive deterministic values from the byte
    * length alone (nFrames = nBytes, 16 kHz mono 8-bit nominal) — the
    * [[Multimodal.StubDecoder]] stance, recognizable and never a crash.
    */
  def audioMetaOf(media: Dataset[MediaRow]): Dataset[AudioMeta] =
    media.mapPartitions { rows =>
      rows.map { m =>
        decodePcm(m.payload) match {
          case Some((fmt, mono)) =>
            val sr = math.round(fmt.getSampleRate).toInt
            AudioMeta(m.id, decoded = true, sr, fmt.getChannels,
              fmt.getSampleSizeInBits, mono.length,
              mono.length.toLong * 1000L / sr)
          case None =>
            val n = if (m.payload == null) 0L else m.payload.length.toLong
            AudioMeta(m.id, decoded = false, 16000, 1, 8, n, n * 1000L / 16000L)
        }
      }
    }(Encoders.product[AudioMeta])

  /** Pure-column energy hash over a STRING payload — the cross-engine
    * oracle surrogate ([[ImageDedup.dHashTextCol]]'s audio sibling, same
    * contract: Spark `ascii` ≡ DuckDB `ord` on code points). Window j
    * POOLS [[SamplesPerWindow]] code points sampled at
    * floor((4j+m)·len/288), value = their SUM (equal populations per
    * window, so sums compare exactly like means); then the shared
    * gradient bit-packing. Empty/NULL text → [[ImageDedup.ZeroHash]].
    * Pooling — not point-sampling — is what distinguishes the envelope
    * surrogate from dHash's: a one-character change moves at most the
    * windows it lands in, by at most its code-point delta.
    *
    * The sample grid is let-bound through a single-element `transform`
    * (the [[ImageDedup.dHashTextCol]] pin) so projection collapse can't
    * inline the 288-substring chain once per comparison.
    */
  def energyHashTextCol(t: Column): Column = {
    val n = length(t).cast("long")
    val total = lit(Windows * SamplesPerWindow) // 288
    val grid = transform(sequence(lit(0L), lit(Windows - 1L)), j =>
      (0 until SamplesPerWindow).map { m =>
        val pos = floor((j * SamplesPerWindow + m) * n / total) + 1
        ascii(t.substr(pos.cast("int"), lit(1))).cast("long")
      }.reduce(_ + _))
    val hx = element_at(transform(array(grid), g => hexFromGridCol(g)), 1)
    when(coalesce(length(t), lit(0)) < 1, lit(ImageDedup.ZeroHash)).otherwise(hx)
  }

  /** The shared gradient pack as a column over a 72-entry list — the
    * column twin of [[ImageDedup.dHashBytesFromGrid]] (bit (r, c) =
    * g[r·9+c+1] > g[r·9+c], hex per row-byte).
    */
  private def hexFromGridCol(g: Column): Column = {
    val gw = ImageDedup.GridW
    concat((0 until ImageDedup.GridH).map { r =>
      val byteR = (0 until gw - 1).map { c =>
        when(element_at(g, r * gw + c + 2) > element_at(g, r * gw + c + 1),
          lit(1 << c)).otherwise(lit(0))
      }.reduce(_ + _)
      lpad(lower(hex(byteR)), 2, "0")
    }: _*)
  }
}
