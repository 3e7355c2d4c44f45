package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal.MediaRow

/** Perceptual-hash IMAGE deduplication: 64-bit difference hash (dHash —
  * the classic 9×8 gradient fingerprint popularized for near-dup photo
  * detection) plus Hamming near-dup clustering over the repo's existing
  * LSH banding machinery ([[Lsh.candidatePairs]],
  * [[Dedup.connectedComponents]]).
  *
  * Hash definition (integer-exact, engine-mirrorable): sample the media
  * to a 9-wide × 8-tall grayscale grid, then bit (r, c) = 1 iff
  * cell (r, c+1) > cell (r, c) — 8 bits per row, 8 rows, packed
  * row-major into 8 bytes and rendered as 16 lowercase hex chars
  * (`dhash`). Resize- and brightness-shift-robust for real images
  * because only horizontal gradients survive.
  *
  * Three grid sources share the one bit-packing:
  *  - [[dHashImage]]: REAL decode via the JDK's `javax.imageio` codecs
  *    (PNG/BMP/GIF/JPEG) — ITU-R BT.601 luminance (299 R + 587 G +
  *    114 B, kept at ×1000 integer scale), average-pooled per cell
  *    (floor), every cell non-empty for any w, h ≥ 1.
  *  - [[dHashSurrogateBytes]]: deterministic byte-sample fallback for
  *    payloads no JDK codec accepts (audio/video — the same stub seam
  *    as [[Multimodal.StubDecoder]]).
  *  - [[dHashTextCol]]: pure-Catalyst COLUMN form over a string payload
  *    (code-point samples) — the oracle-mirrorable path that lets a
  *    cross-engine gate lock the full hash → band → Hamming → cluster
  *    pipeline bit-for-bit (DuckDB `ord` ≡ Spark `ascii` on code
  *    points; an image codec is the one step SQL cannot host).
  *
  * Near-dup shape at scale: 8 one-byte bands per hash. Pigeonhole gives
  * a DETERMINISTIC detection guarantee for Hamming ≤ 7 (any such pair
  * leaves at least one band untouched); the default `maxHamming` = 6
  * stays inside it. Banding cost is one explode (8 rows/doc) + the
  * one-shuffle sorted-run pair scan with the hot-bucket star guard —
  * at billion-image scale single-byte buckets saturate (256 values per
  * band), and the star pattern keeps each such bucket LINEAR while the
  * Hamming verify discards false star links; recall beyond the
  * guarantee then degrades gracefully instead of cost exploding.
  *
  * Reference scope: the reference engine (Streamiz) has no media
  * operators at all — this is north-star charter work (dedup over
  * multimodal columns), built on published technique (dHash per Krawetz
  * 2013 "Kind of Like That"; multi-index Hamming per Norouzi et al.
  * CVPR'12).
  */
object ImageDedup {

  /** Grid geometry: 9 columns × 8 rows → 8 comparisons × 8 rows = 64 bits. */
  val GridW = 9
  val GridH = 8
  val GridCells: Int = GridW * GridH // 72

  /** The all-zero hash emitted for empty/NULL payloads. */
  val ZeroHash = "0000000000000000"

  /** Pack a 72-cell row-major grid into the 8 dHash row-bytes:
    * byte r bit c = cell(r, c+1) > cell(r, c).
    */
  def dHashBytesFromGrid(g: Array[Long]): Array[Int] = {
    require(g.length == GridCells, s"grid must have $GridCells cells, got ${g.length}")
    val out = new Array[Int](GridH)
    var r = 0
    while (r < GridH) {
      var b = 0
      var c = 0
      while (c < GridW - 1) {
        if (g(r * GridW + c + 1) > g(r * GridW + c)) b |= 1 << c
        c += 1
      }
      out(r) = b
      r += 1
    }
    out
  }

  /** 16 lowercase hex chars from the 8 row-bytes. */
  def hexOf(bytes: Array[Int]): String = {
    require(bytes.length == GridH, s"need $GridH bytes, got ${bytes.length}")
    bytes.map(b => f"${b & 0xff}%02x").mkString
  }

  /** Average-pooled ×1000-luminance grid of a decoded image. Cell (r, c)
    * covers x ∈ [c·w/9, (c+1)·w/9), y ∈ [r·h/8, (r+1)·h/8), widened to
    * at least one pixel so tiny images still produce a full grid; cell
    * value = floor(lumSum / pixelCount) — deterministic integer math.
    */
  def grayGridOf(img: java.awt.image.BufferedImage): Array[Long] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Long](GridCells)
    var r = 0
    while (r < GridH) {
      val y0 = r * h / GridH
      val y1 = math.max(y0 + 1, (r + 1) * h / GridH)
      var c = 0
      while (c < GridW) {
        val x0 = c * w / GridW
        val x1 = math.max(x0 + 1, (c + 1) * w / GridW)
        var sum = 0L
        var cnt = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
              114L * (rgb & 0xff)
            cnt += 1
            x += 1
          }
          y += 1
        }
        out(r * GridW + c) = sum / cnt
        c += 1
      }
      r += 1
    }
    out
  }

  /** dHash row-bytes of a REAL image payload, or None when no JDK codec
    * accepts it (corrupt bytes, audio/video containers). Same NonFatal
    * hygiene as [[Multimodal.ImageIoDecoder]] — a hostile payload must
    * never kill a 100 TB scan.
    */
  def dHashImage(payload: Array[Byte]): Option[Array[Int]] = {
    val stream = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    val img =
      try javax.imageio.ImageIO.read(stream)
      catch { case scala.util.control.NonFatal(_) => null }
      finally {
        try stream.close() catch { case scala.util.control.NonFatal(_) => () }
      }
    if (img == null || img.getWidth < 1 || img.getHeight < 1) None
    else Some(dHashBytesFromGrid(grayGridOf(img)))
  }

  /** Deterministic byte-sample fallback grid: pixel i = unsigned byte at
    * floor(i·n/72). Empty payload → all-zero hash.
    */
  def dHashSurrogateBytes(payload: Array[Byte]): Array[Int] = {
    val n = payload.length
    if (n < 1) new Array[Int](GridH)
    else {
      val g = new Array[Long](GridCells)
      var i = 0
      while (i < GridCells) {
        g(i) = payload(((i.toLong * n) / GridCells).toInt) & 0xffL
        i += 1
      }
      dHashBytesFromGrid(g)
    }
  }

  /** Per-partition dHash over a media column: real decode first, byte
    * surrogate for non-image payloads — one pass, no state, the same
    * batch shape as [[Multimodal.extractFeatures]]. Output: (id, dhash).
    */
  def dHashImages(media: Dataset[MediaRow]): DataFrame =
    media.mapPartitions { rows =>
      rows.map { m =>
        val bytes = dHashImage(m.payload).getOrElse(dHashSurrogateBytes(m.payload))
        (m.id, hexOf(bytes))
      }
    }(Encoders.product[(Long, String)]).toDF("id", "dhash")

  /** Pure-column dHash over a STRING payload: 72 code-point samples at
    * floor(i·len/72) feed the same gradient bits. This is the
    * cross-engine-mirrorable form (Spark `ascii` and DuckDB `ord` agree
    * on code points) — the decode seam swapped for deterministic
    * sampling, everything downstream (banding, Hamming, clustering)
    * identical to the image path. Empty/NULL text → [[ZeroHash]].
    *
    * The sample array is let-bound through a single-element `transform`
    * (the [[Dedup.winnowFingerprints]] pin): 64 bit comparisons
    * reference 72 samples twice each, and projection collapse would
    * otherwise inline the substring chain per reference.
    */
  def dHashTextCol(t: Column): Column = {
    val n = length(t).cast("long")
    val grid = transform(sequence(lit(0L), lit(GridCells - 1L)),
      i => ascii(t.substr((floor(i * n / GridCells) + 1).cast("int"), lit(1))))
    val hx = element_at(transform(array(grid), g => hexFromGrid(g)), 1)
    when(coalesce(length(t), lit(0)) < 1, lit(ZeroHash)).otherwise(hx)
  }

  private def hexFromGrid(g: Column): Column =
    concat((0 until GridH).map { r =>
      val byteR = (0 until GridW - 1).map { c =>
        when(element_at(g, r * GridW + c + 2) > element_at(g, r * GridW + c + 1),
          lit(1 << c)).otherwise(lit(0))
      }.reduce(_ + _)
      lpad(lower(hex(byteR)), 2, "0")
    }: _*)

  /** The 8 band-bytes of a hex hash as array<int> (band r = hex chars
    * 2r..2r+1) — the join/verify representation.
    */
  def hashBytesCol(hash: Column): Column =
    transform(sequence(lit(0), lit(GridH - 1)),
      r => conv(hash.substr(r * 2 + 1, lit(2)), 16, 10).cast("int"))

  /** Exact Hamming distance between two 8-byte arrays. */
  def hammingCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("int")),
      lit(0), (acc, x) => acc + x)

  private val lastHashBarrier =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)
  private val lastBytesBarrier =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  /** Free this operator's one-slot barrier caches — same staleness
    * contract as [[Dedup.releaseBarriers]] (call between an in-place
    * input overwrite and a re-run, or when moving on to unrelated work).
    */
  def releaseBarriers(): Unit =
    Seq(lastHashBarrier, lastBytesBarrier).foreach { slot =>
      slot.synchronized {
        val prev = slot.getAndSet(null)
        if (prev != null && !prev.sparkSession.sparkContext.isStopped)
          prev.unpersist(blocking = false)
      }
    }

  /** Hamming near-dup clusters over perceptual hashes: every id gets its
    * undirected component's MINIMUM id as `rep`, components built from
    * verified pairs (share ≥ 1 of the 8 one-byte bands AND full Hamming
    * ≤ `maxHamming`). Input columns ride through (the sibling-operator
    * contract). Detection is exact for Hamming ≤ 7 (pigeonhole over 8
    * bands); the hot-bucket star guard bounds saturated band buckets —
    * see the object doc. The banded hash table rides the one-slot
    * barrier cache ([[Dedup.swapBarrier]] staleness contract).
    *
    * `collapseExact` (default on, the [[Dedup.dedupNear]] precedent)
    * runs banding/pairing/components over ONE representative per
    * DISTINCT hash (its minimum id) and maps members back through their
    * hash class. Output-identical to the uncollapsed form — same-hash
    * docs are Hamming-0 connected, so components factor through hash
    * classes and the component minimum is the minimum of class minima —
    * but a corpus with heavy exact duplication (the common case: same
    * image re-crawled millions of times) pays pair generation only per
    * distinct hash instead of R² per duplicate group. Measured at 10×
    * replication (sf0.1): 31.9 → 2.25 s (SCALE.md).
    */
  def imageClusters(df: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int = 6,
      hotBucketThreshold: Int = Dedup.DefaultHotBucketThreshold,
      collapseExact: Boolean = true): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64,
      s"maxHamming must be in [0, 64], got $maxHamming")
    QualityFilters.requireFreshColumns(df, "imageClusters",
      Seq("rep", "__cid", "__hb", "__band", "__bv", "ida", "idb"))
    if (!collapseExact) {
      df.join(classReps(df.select(col(idCol), col(hashCol)), idCol, hashCol,
        maxHamming, hotBucketThreshold), Seq(idCol))
    } else {
      // the (id, hash) projection is the expensive part when the hash is
      // computed in-plan (the column surrogate path) — barrier-cache it
      // once, since classes + both join-backs all read it; narrow: one id
      // and 16 chars per row
      val hashed = Dedup.swapBarrier(lastHashBarrier,
        df.select(col(idCol), col(hashCol)))
      // one map-side-combined shuffle builds the hash classes; everything
      // expensive then runs over distinct hashes only
      val classes = hashed.groupBy(col(hashCol)).agg(min(col(idCol)).as("__cid"))
      val cc = classReps(
        classes.select(col("__cid").as(idCol), col(hashCol)),
        idCol, hashCol, maxHamming, hotBucketThreshold)
      // null-safe class join: a NULL hash (possible when the caller
      // supplies a precomputed hash column) forms its own class under
      // groupBy, and <=> keeps its members mapped — an equi-join would
      // silently drop them, diverging from the uncollapsed path
      val mapping = hashed.select(col(idCol), col(hashCol))
        .join(classes, hashed(hashCol) <=> classes(hashCol))
        .join(cc.select(col(idCol).as("__cid"), col("rep")), Seq("__cid"))
        .select(hashed(idCol).as(idCol), col("rep"))
      df.join(mapping, Seq(idCol))
    }
  }

  /** Band → verify → connected components over (id, hash) rows with
    * DISTINCT ids: the clustering core both collapse modes share.
    * Returns (idCol, rep).
    */
  private def classReps(ids: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int, hotBucketThreshold: Int): DataFrame = {
    val withBytes = Dedup.swapBarrier(lastBytesBarrier,
      ids.select(col(idCol), hashBytesCol(col(hashCol)).as("__hb")))
    val bands = withBytes.select(col(idCol),
      posexplode(col("__hb")).as(Seq("__band", "__bv")))
    val cand = Lsh.candidatePairs(bands, idCol, Seq("__band", "__bv"),
      hotBucketThreshold)
    val pairs = cand
      .join(withBytes.as("a"), col(s"a.$idCol") === col("ida"))
      .join(withBytes.as("b"), col(s"b.$idCol") === col("idb"))
      .filter(hammingCol(col("a.__hb"), col("b.__hb")) <= maxHamming)
      .select(col("ida"), col("idb"))
    Dedup.connectedComponents(pairs, ids.select(col(idCol)), idCol)
  }

  /** One-call image dedup: keep each cluster's minimum id. */
  def dedupImages(df: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int = 6,
      hotBucketThreshold: Int = Dedup.DefaultHotBucketThreshold): DataFrame = {
    val survivors = imageClusters(df, idCol, hashCol, maxHamming, hotBucketThreshold)
      .filter(col("rep") === col(idCol)).select(idCol)
    df.join(survivors, Seq(idCol), "left_semi")
  }
}
