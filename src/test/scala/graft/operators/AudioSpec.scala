package graft.operators

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Multimodal.MediaRow

/** Contracts for [[Audio]]: REAL JDK decode (WAV/AIFF via
  * `javax.sound.sampled`, both endiannesses, 8- and 16-bit PCM, mono and
  * stereo), the envelope-hash invariances (amplitude scale, container,
  * bit depth), the surrogate fallback seam, and end-to-end near-dup
  * clustering through the SHARED Hamming stack
  * ([[ImageDedup.imageClusters]] over audio hashes).
  */
class AudioSpec extends SparkSpec {
  import spark.implicits._

  /** Serialize PCM samples into a real container via the JDK encoder —
    * the payloads under test are genuine WAV/AIFF files, not hand-rolled
    * headers. 16-bit signed (any endianness per container) or 8-bit
    * unsigned (the WAV convention); `samples` are per-frame MONO values
    * replicated across `channels` unless `right` supplies channel 2.
    */
  private def containerBytes(
      samples: Array[Int], sampleRate: Float = 8000f, bits: Int = 16,
      channels: Int = 1, fileType: AudioFileFormat.Type = AudioFileFormat.Type.WAVE,
      bigEndian: Boolean = false, right: Option[Array[Int]] = None): Array[Byte] = {
    val signed = bits == 16
    val fmt = new AudioFormat(
      if (signed) AudioFormat.Encoding.PCM_SIGNED else AudioFormat.Encoding.PCM_UNSIGNED,
      sampleRate, bits, channels, channels * bits / 8, sampleRate, bigEndian)
    val raw = new Array[Byte](samples.length * channels * bits / 8)
    samples.indices.foreach { i =>
      (0 until channels).foreach { c =>
        val v = if (c == 1 && right.isDefined) right.get(i) else samples(i)
        val off = (i * channels + c) * bits / 8
        if (bits == 8) raw(off) = v.toByte
        else if (bigEndian) { raw(off) = (v >> 8).toByte; raw(off + 1) = v.toByte }
        else { raw(off) = v.toByte; raw(off + 1) = (v >> 8).toByte }
      }
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, fileType, out)
    out.toByteArray
  }

  /** 720 frames (72 equal 10-frame windows — envelope comparisons exact
    * under uniform scaling), strong per-window levels so ±1 perturbation
    * can't flip a gradient bit.
    */
  private def levels(seed: Int): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    val lv = Array.fill(72)(100 + rnd.nextInt(12000))
    Array.tabulate(720)(i => lv(i / 10))
  }

  private def hashOf(payload: Array[Byte]): String =
    ImageDedup.hexOf(Audio.audioHash(payload).get)

  test("decodePcm: real WAV metadata and exact sample round-trip") {
    val samples = Array(0, 1000, -1000, 32767, -32768, 5)
    val (fmt, mono) = Audio.decodePcm(containerBytes(samples)).get
    assert(fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16)
    assert(math.round(fmt.getSampleRate) == 8000)
    assert(mono.toSeq == samples.map(_.toLong).toSeq)
  }

  test("decodePcm: stereo mixes to floorDiv mono; L=R equals the mono clip") {
    val s = levels(1)
    val stereo = containerBytes(s, channels = 2)
    val (fmt, mono) = Audio.decodePcm(stereo).get
    assert(fmt.getChannels == 2)
    assert(mono.toSeq == s.map(_.toLong).toSeq)
    assert(hashOf(stereo) == hashOf(containerBytes(s)))
    // floorDiv (not truncate) on an odd negative sum: L=-3, R=0 → -2
    val (_, m2) = Audio.decodePcm(containerBytes(
      Array(-3, 7), channels = 2, right = Some(Array(0, 0)))).get
    assert(m2.toSeq == Seq(-2L, 3L))
  }

  test("envelope hash is invariant to amplitude scaling and container/endianness") {
    val s = levels(2)
    val base = hashOf(containerBytes(s))
    assert(hashOf(containerBytes(s.map(_ * 2))) == base, "2x volume")
    assert(hashOf(containerBytes(s, fileType = AudioFileFormat.Type.AIFF,
      bigEndian = true)) == base, "AIFF big-endian")
    assert(base != ImageDedup.ZeroHash)
  }

  test("8-bit unsigned WAV carries the same envelope as its 16-bit scaling") {
    val small = levels(3).map(v => (v % 127) + 1) // 1..127 8-bit-safe levels
    val b16 = hashOf(containerBytes(small.map(_ * 256)))
    val b8 = hashOf(containerBytes(small.map(_ + 128), bits = 8))
    assert(b8 == b16)
  }

  test("audioHashes: real clips hash via decode, junk falls back to the byte surrogate") {
    val wav = containerBytes(levels(4))
    val junk = Array.tabulate(500)(i => (i * 37 % 251).toByte)
    val out = spark.createDataset(Seq(
        MediaRow(1L, "audio", wav), MediaRow(2L, "binary", junk),
        MediaRow(3L, "audio", null)))
      .transform(Audio.audioHashes)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == hashOf(wav))
    assert(out(2L) == ImageDedup.hexOf(ImageDedup.dHashSurrogateBytes(junk)))
    assert(out(3L) == ImageDedup.ZeroHash)
  }

  test("audioMetaOf: real rows carry true format; fallback rows are size-derived") {
    val wav = containerBytes(levels(5), sampleRate = 16000f, channels = 2)
    val rows = spark.createDataset(Seq(
        MediaRow(1L, "audio", wav), MediaRow(2L, "junk", Array[Byte](1, 2, 3))))
      .transform(Audio.audioMetaOf).collect().map(m => m.id -> m).toMap
    val real = rows(1L)
    assert(real.decoded && real.sampleRate == 16000 && real.channels == 2 &&
      real.bitsPerSample == 16 && real.nFrames == 720 && real.durationMs == 45)
    val fb = rows(2L)
    assert(!fb.decoded && fb.nFrames == 3)
  }

  test("near-dup audio clusters through the shared Hamming stack; distinct stays apart") {
    // near-dup: swap one adjacent window pair's levels (an edit), which
    // flips the gradient bit between them by construction and at most
    // the two bits touching the pair from outside — Hamming ∈ [1, 3],
    // far inside maxHamming = 6
    val a = levels(6)
    (190 until 200).foreach(i => a(i) = 200)    // window 19
    (200 until 210).foreach(i => a(i) = 12500)  // window 20
    val b = a.clone()
    (190 until 200).foreach(i => b(i) = 12500)
    (200 until 210).foreach(i => b(i) = 200)
    val c = levels(99)
    val hashed = spark.createDataset(Seq(
        MediaRow(1L, "audio", containerBytes(a)),
        MediaRow(2L, "audio", containerBytes(b)),
        MediaRow(3L, "audio", containerBytes(c))))
      .transform(Audio.audioHashes)
    val h = hashed.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val dAB = ImageDedupSpecHelpers.hamming(h(1L), h(2L))
    val dAC = ImageDedupSpecHelpers.hamming(h(1L), h(3L))
    assert(dAB > 0 && dAB <= 6, s"planted near-dup Hamming $dAB")
    assert(dAC > 6, s"distinct clips Hamming $dAC")
    val reps = ImageDedup.imageClusters(hashed, "id", "ahash", maxHamming = 6)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rep")).toMap
    assert(reps(1L) == 1L && reps(2L) == 1L && reps(3L) == 3L)
  }
}

/** Shared scalar helpers for hash specs. */
object ImageDedupSpecHelpers {
  def hamming(a: String, b: String): Int =
    (0 until 8).map { r =>
      java.lang.Integer.bitCount(
        Integer.parseInt(a.substring(r * 2, r * 2 + 2), 16) ^
          Integer.parseInt(b.substring(r * 2, r * 2 + 2), 16))
    }.sum
}
