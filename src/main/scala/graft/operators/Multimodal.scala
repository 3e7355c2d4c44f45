package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side contract is real — schema, partitioning, batch shape,
  * deterministic outputs — while the actual media decode is STUBBED (`???`
  * path / deterministic fake): this container has no image/audio libraries.
  * On a real cluster, swap [[MediaDecoder.decode]] for a JNI/FFI decoder; the
  * pipeline shape (mapPartitions over binary batches, decoder instantiated
  * once per partition, never per row) is the part that matters at 100 TB.
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
    * histogram derived from the payload bytes. Replace with a real codec
    * (e.g. via JNI) outside this container.
    */
  object StubDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Array[Double]) = {
      val n = payload.length
      val hist = new Array[Double](16)
      var i = 0
      while (i < n) { hist((payload(i) & 0xff) >> 4) += 1.0; i += 1 }
      if (n > 0) { var j = 0; while (j < 16) { hist(j) /= n; j += 1 } }
      ((n % 1920) + 1, (n % 1080) + 1, hist)
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
      // per-partition decoder setup happens here (native context, model, …)
      val dec = decoder
      rows.map { r =>
        val (w, h, hist) = dec.decode(r.payload)
        MediaFeatures(r.id, r.mediaType, r.payload.length.toLong,
          java.security.MessageDigest.getInstance("MD5")
            .digest(r.payload).map("%02x".format(_)).mkString,
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
        val n = r.payload.length
        if (n == 0) r // empty media stays empty
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
      r.payload.grouped(frameBytes).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (frame, idx) => (r.id, idx, frame) }
    }
}
