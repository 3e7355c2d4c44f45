package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side contract is real — schema, partitioning, batch shape,
  * deterministic outputs. Image decode is REAL for the formats the JDK
  * ships codecs for ([[ImageIoDecoder]]: PNG/BMP/GIF/JPEG via
  * `javax.imageio`, no external libraries); other media (audio/video
  * containers) fall back to the deterministic [[StubDecoder]] — swap in a
  * JNI/FFI codec on a real cluster. The pipeline shape (mapPartitions over
  * binary batches, decoder + digest instantiated once per partition, never
  * per row) is the part that matters at 100 TB.
  */
object Multimodal {

  /** Typed media row: payload + metadata travelling together. */
  final case class MediaRow(id: Long, mediaType: String, payload: Array[Byte])

  /** Extracted features (deterministic stub output). */
  final case class MediaFeatures(
      id: Long, mediaType: String, nBytes: Long, contentHash: String,
      width: Int, height: Int, histogram: Array[Double])

  /** The decode seam. REAL implementations plug in here (per-partition
    * instantiation — expensive native contexts are amortized over the batch).
    */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte]): (Int, Int, Array[Double])
  }

  /** STUB decoder — deterministic fake: dimensions and a 16-bin byte
    * histogram derived from the payload bytes. The fallback for media the
    * JVM has no codec for (audio/video); replace via JNI on a real cluster.
    */
  object StubDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Array[Double]) = {
      // NULL payload ≡ empty payload: a nullable binary column must
      // never NPE a scan
      val n = if (payload == null) 0 else payload.length
      val hist = new Array[Double](16)
      var i = 0
      while (i < n) { hist((payload(i) & 0xff) >> 4) += 1.0; i += 1 }
      if (n > 0) { var j = 0; while (j < 16) { hist(j) /= n; j += 1 } }
      ((n % 1920) + 1, (n % 1080) + 1, hist)
    }
  }

  /** REAL image decoder on the JDK's built-in codecs (PNG, BMP, GIF, JPEG —
    * `javax.imageio`, zero external dependencies): true width/height and a
    * 16-bin luminance histogram (ITU-R BT.601: 0.299 R + 0.587 G +
    * 0.114 B, normalized to sum 1). Payloads no JDK reader accepts fall
    * back to [[StubDecoder]] so a mixed-media column never kills the job —
    * stub rows are recognizable by their size-derived dimensions.
    *
    * In-memory only: `ImageIO`'s default disk cache is disabled via a
    * per-stream `MemoryCacheImageInputStream`, so executors never write
    * scratch files for a 100 TB scan.
    */
  object ImageIoDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Array[Double]) = {
      if (payload == null) return StubDecoder.decode(payload)
      val stream = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      // NonFatal, not just IOException: JDK readers (notably JPEG) throw
      // RuntimeExceptions (CMMException, ArrayIndexOutOfBounds, IAE) on
      // corrupt payloads, and "a mixed-media column never kills the job"
      // must hold for those too
      val img =
        try javax.imageio.ImageIO.read(stream) // closes the stream on success
        catch { case scala.util.control.NonFatal(_) => null }
        finally { // only the failure path still holds an open stream
          try stream.close() catch { case scala.util.control.NonFatal(_) => () }
        }
      if (img == null) StubDecoder.decode(payload)
      else {
        val w = img.getWidth
        val h = img.getHeight
        val hist = new Array[Double](16)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            hist(math.min(15, (lum / 16.0).toInt)) += 1.0
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        if (n > 0) { var j = 0; while (j < 16) { hist(j) /= n; j += 1 } }
        (w, h, hist)
      }
    }
  }

  /** Wrap a text/binary column into the media schema (for the synthetic
    * corpus; real sources read binary files or parquet BLOB columns).
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String)(implicit e: Encoder[MediaRow]): Dataset[MediaRow] =
    df.select(col(idCol).cast("long").as("id"),
        lit(mediaType).as("mediaType"),
        col(payloadCol).cast("binary").as("payload"))
      .as[MediaRow]

  /** Feature extraction over partition-sized batches: the decoder is built
    * once per partition (NOT per row) — the shape a native codec needs.
    */
  def extractFeatures(media: Dataset[MediaRow],
      decoder: MediaDecoder = StubDecoder)(
      implicit e: Encoder[MediaFeatures]): Dataset[MediaFeatures] =
    media.mapPartitions { rows =>
      // per-partition setup: decoder (native context, model, …) AND the
      // digest — `digest()` resets the instance, so one per partition, not
      // one per row
      val dec = decoder
      val md5 = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        // NULL payloads normalize to empty at the seam — hashes, sizes,
        // and decoders all stay total
        val p = if (r.payload == null) Array.emptyByteArray else r.payload
        val (w, h, hist) = dec.decode(p)
        MediaFeatures(r.id, r.mediaType, p.length.toLong,
          md5.digest(p).map("%02x".format(_)).mkString,
          w, h, hist)
      }
    }

  /** Resize plumbing: per-partition "codec" maps each payload to a
    * target-size payload (STUB: deterministic byte down/up-sampling to
    * `targetW*targetH` bytes; a real impl decodes, scales, re-encodes). The
    * contract that matters at scale: output size is bounded by the target,
    * independent of input size — so a resize stage always SHRINKS shuffle
    * volume to a known ceiling.
    */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int)(
      implicit e: Encoder[MediaRow]): Dataset[MediaRow] =
    media.mapPartitions { rows =>
      val target = math.max(1, targetW * targetH)
      rows.map { r =>
        val n = if (r.payload == null) 0 else r.payload.length
        if (n == 0) r // empty (or NULL) media stays as-is
        else {
          // exactly `target` bytes: down-samples long payloads, repeats
          // bytes of short ones — fixed-shape output either way
          val out = new Array[Byte](target)
          var i = 0
          while (i < target) {
            out(i) = r.payload((i.toLong * n / target).toInt)
            i += 1
          }
          r.copy(payload = out)
        }
      }
    }

  /** Frame sampling plumbing for video-like payloads: split a payload into
    * fixed-size "frames", keep every `stride`-th — 1→N explode with bounded
    * output, the distributed shape of video frame extraction.
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, stride: Int)(
      implicit e: Encoder[(Long, Int, Array[Byte])]): Dataset[(Long, Int, Array[Byte])] =
    media.flatMap { r =>
      if (r.payload == null) Iterator.empty // NULL media has no frames
      else r.payload.grouped(frameBytes).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (frame, idx) => (r.id, idx, frame) }
    }
}
