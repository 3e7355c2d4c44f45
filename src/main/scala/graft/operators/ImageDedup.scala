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

  /** Average-pooled ×1000-luminance grid of a decoded image at an
    * arbitrary geometry. Cell (r, c) covers x ∈ [c·w/gw, (c+1)·w/gw),
    * y ∈ [r·h/gh, (r+1)·h/gh), widened to at least one pixel so tiny
    * images still produce a full grid; cell value = floor(lumSum /
    * pixelCount) — deterministic integer math.
    */
  def grayPool(img: java.awt.image.BufferedImage, gw: Int, gh: Int): Array[Long] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Long](gw * gh)
    var r = 0
    while (r < gh) {
      val y0 = r * h / gh
      val y1 = math.max(y0 + 1, (r + 1) * h / gh)
      var c = 0
      while (c < gw) {
        val x0 = c * w / gw
        val x1 = math.max(x0 + 1, (c + 1) * w / gw)
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
        out(r * gw + c) = sum / cnt
        c += 1
      }
      r += 1
    }
    out
  }

  /** The dHash pooling geometry (9×8). */
  def grayGridOf(img: java.awt.image.BufferedImage): Array[Long] =
    grayPool(img, GridW, GridH)

  /** The ONE ImageIO decode seam both perceptual hashes share: None for
    * NULL payloads (a nullable binary column must never NPE a scan),
    * payloads no JDK codec accepts, and degenerate images. Same NonFatal
    * hygiene as [[Multimodal.ImageIoDecoder]] — a hostile payload must
    * never kill a 100 TB scan.
    */
  private def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (payload == null) return None
    val stream = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    val img =
      try javax.imageio.ImageIO.read(stream)
      catch { case scala.util.control.NonFatal(_) => null }
      finally {
        try stream.close() catch { case scala.util.control.NonFatal(_) => () }
      }
    if (img == null || img.getWidth < 1 || img.getHeight < 1) None else Some(img)
  }

  /** dHash row-bytes of a REAL image payload, or None when
    * [[decodeImage]] rejects it. */
  def dHashImage(payload: Array[Byte]): Option[Array[Int]] =
    decodeImage(payload).map(img => dHashBytesFromGrid(grayGridOf(img)))

  /** Deterministic byte-sample fallback grid: pixel i = unsigned byte at
    * floor(i·n/72). Empty or NULL payload → all-zero hash.
    */
  def dHashSurrogateBytes(payload: Array[Byte]): Array[Int] = {
    val n = if (payload == null) 0 else payload.length
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

  // ---- pHash (DCT) — the second canonical perceptual hash ----

  /** pHash pooling geometry: 32×32 grayscale ahead of the DCT. */
  val PHashN = 32

  /** Deterministic DCT basis: StrictMath cosines (bit-identical on every
    * JVM/platform, unlike `Math.cos` which may use platform intrinsics).
    * cosTable(u)(x) = cos(π·(2x+1)·u / (2·N)).
    */
  private val cosTable: Array[Array[Double]] =
    Array.tabulate(PHashN, PHashN)((u, x) =>
      StrictMath.cos(StrictMath.PI * (2 * x + 1) * u / (2.0 * PHashN)))

  /** pHash (Krawetz 2013's DCT variant): 32×32 grayscale → 2-D DCT-II →
    * top-left 8×8 low-frequency block → bit (r, c) = coefficient (r, c)
    * greater than the MEAN of the block's 63 AC coefficients. DC — raw
    * brightness — votes NOTHING: it is excluded from the mean AND its
    * bit position (0, 0) is fixed 0, so a uniform brightness shift
    * (which moves only F(0,0)) cannot flip any bit. Same 8-byte/16-hex
    * packing as dHash, so banding, clustering, and the persisted index
    * apply unchanged. Returns None when [[decodeImage]] rejects the
    * payload.
    */
  def pHashImage(payload: Array[Byte]): Option[Array[Int]] =
    decodeImage(payload).map { img =>
      val g = grayPool(img, PHashN, PHashN)
      // separable 2-D DCT-II, rows then columns (orthonormal scale —
      // any uniform scale works, the bits compare against the mean).
      // Only the 8 lowest horizontal frequencies are ever read by pass
      // 2, so pass 1 computes just those (4× less multiply-add than the
      // full 32-frequency transform, bit-identical output)
      val rows = Array.ofDim[Double](PHashN, 8)
      var r = 0
      while (r < PHashN) {
        var u = 0
        while (u < 8) {
          var s = 0.0
          var x = 0
          while (x < PHashN) { s += g(r * PHashN + x) * cosTable(u)(x); x += 1 }
          rows(r)(u) = s
          u += 1
        }
        r += 1
      }
      val block = Array.ofDim[Double](8, 8)
      var v = 0
      while (v < 8) {
        var u = 0
        while (u < 8) {
          var s = 0.0
          var y = 0
          while (y < PHashN) { s += rows(y)(u) * cosTable(v)(y); y += 1 }
          block(v)(u) = s
          u += 1
        }
        v += 1
      }
      var acSum = 0.0
      var i = 1
      while (i < 64) { acSum += block(i / 8)(i % 8); i += 1 }
      val mean = acSum / 63.0
      val bytes = new Array[Int](8)
      var rr = 0
      while (rr < 8) {
        var b = 0
        var cc = 0
        while (cc < 8) {
          if ((rr != 0 || cc != 0) && block(rr)(cc) > mean) b |= 1 << cc
          cc += 1
        }
        bytes(rr) = b
        rr += 1
      }
      bytes
    }

  /** Per-partition pHash over a media column: real decode, byte
    * surrogate fallback (the [[dHashSurrogateBytes]] sampler — a
    * deterministic stand-in, not a DCT) for payloads no codec accepts.
    * Output: (id, phash).
    */
  def pHashImages(media: Dataset[MediaRow]): DataFrame =
    media.mapPartitions { rows =>
      rows.map { m =>
        val bytes = pHashImage(m.payload).getOrElse(dHashSurrogateBytes(m.payload))
        (m.id, hexOf(bytes))
      }
    }(Encoders.product[(Long, String)]).toDF("id", "phash")

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

  /** Exact Hamming distance between two 16-hex hashes as a FLAT scalar
    * expression (8 × bit_count(xor)) — higher-order array functions
    * (`zip_with`/`aggregate`) evaluate their lambdas interpreted per
    * row, which dominates a verify over millions of candidate rows;
    * this form stays inside whole-stage codegen.
    */
  def hammingHexCol(a: Column, b: Column): Column =
    (0 until GridH).map { r =>
      bit_count(
        conv(a.substr(lit(r * 2 + 1), lit(2)), 16, 10).cast("long")
          .bitwiseXOR(conv(b.substr(lit(r * 2 + 1), lit(2)), 16, 10).cast("long")))
        .cast("int")
    }.reduce(_ + _)

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
      // expensive then runs over distinct hashes only. NULL hashes stay
      // OUT of the classes: a NULL hash means "unknown", not "identical"
      // — grouping them would invent Hamming-0 edges between unrelated
      // docs — so null-hash rows keep rep = self via the left-join
      // coalesce below, matching the uncollapsed path exactly (there
      // they are banding-invisible nodes that component to themselves)
      val classes = hashed.filter(col(hashCol).isNotNull)
        .groupBy(col(hashCol)).agg(min(col(idCol)).as("__cid"))
      val cc = classReps(
        classes.select(col("__cid").as(idCol), col(hashCol)),
        idCol, hashCol, maxHamming, hotBucketThreshold)
      val mapping = hashed.select(col(idCol), col(hashCol))
        .join(classes, Seq(hashCol))
        .join(cc.select(col(idCol).as("__cid"), col("rep")), Seq("__cid"))
        .select(col(idCol), col("rep"))
      df.join(mapping, Seq(idCol), "left")
        .withColumn("rep", coalesce(col("rep"), col(idCol)))
    }
  }

  /** Band → verify → connected components over (id, hash) rows with
    * DISTINCT ids: the clustering core both collapse modes share.
    * Returns (idCol, rep).
    *
    * Band WIDTH adapts to the radius (multi-index Hamming, Norouzi
    * CVPR'12): `maxHamming ≤ 3` uses 4 two-byte bands (pigeonhole
    * guarantee ≤ 3, 65536 values per band), else 8 one-byte bands
    * (guarantee ≤ 7). Pure performance choice, provably
    * output-identical: under ANY banding whose guarantee covers
    * `maxHamming`, every within-radius pair shares a band, so the
    * verified pair set is EXACTLY the Hamming-≤-max graph either way —
    * what changes is bucket occupancy. On signature families that crowd
    * a small Hamming ball (narrow-vocabulary text SimHash), one-byte
    * buckets collide massively (measured: 5000 sf0.1 docs → 5.1M
    * candidate pairs, 7.3 s) while two-byte buckets stay cold (188k
    * pairs — 1.7 s warm together with the small-graph components fast
    * path) for the same clusters.
    */
  private def classReps(ids: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int, hotBucketThreshold: Int): DataFrame = {
    val withBytes = Dedup.swapBarrier(lastBytesBarrier,
      ids.filter(col(hashCol).isNotNull)
        .select(col(idCol), hashBytesCol(col(hashCol)).as("__hb")))
    val bandVals =
      if (maxHamming <= 3)
        transform(sequence(lit(0), lit(GridH / 2 - 1)), r =>
          element_at(col("__hb"), r * 2 + 1) * 256 +
            element_at(col("__hb"), r * 2 + 2))
      else col("__hb")
    val bands = withBytes.select(col(idCol),
      posexplode(bandVals).as(Seq("__band", "__bv")))
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

  /** [[dedupImages]] with a SURVIVOR POLICY ([[Dedup.dedupNearBy]]'s
    * contract): keep the cluster member maximizing `keepBy` (highest
    * resolution, best quality score, …; ties → lowest id), instead of
    * the minimum id. One extra map-side-combined per-cluster arg-max
    * shuffle; the id negation in the tie key is monotonic for every
    * long except `Long.MinValue`.
    */
  def dedupImagesBy(df: DataFrame, idCol: String, hashCol: String,
      keepBy: Column, maxHamming: Int = 6,
      hotBucketThreshold: Int = Dedup.DefaultHotBucketThreshold): DataFrame = {
    val survivors = imageClusters(df, idCol, hashCol, maxHamming, hotBucketThreshold)
      .groupBy(col("rep"))
      .agg(max_by(col(idCol),
        struct(keepBy.as("q"), (-col(idCol)).as("negid"))).as("__keep"))
      .select(col("__keep").as(idCol))
    df.join(survivors, Seq(idCol), "left_semi")
  }

  // ---- video near-dup via frame-hash overlap ----

  /** Per-frame perceptual hashes of video-like payloads: the
    * [[Multimodal.sampleFrames]] 1→N explode (every `stride`-th
    * `frameBytes` block) followed by per-frame hashing — real
    * [[dHashImage]] decode when a frame is a decodable image, the
    * deterministic byte surrogate otherwise (the container-codec seam;
    * a real deployment plugs a JNI frame decoder into the same shape).
    * Output: (id, frame_idx, fhash).
    */
  def frameHashes(media: Dataset[MediaRow], frameBytes: Int,
      stride: Int): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[(Long, Int, Array[Byte])] =
      Encoders.product[(Long, Int, Array[Byte])]
    Multimodal.sampleFrames(media, frameBytes, stride)
      .mapPartitions { rows =>
        rows.map { case (id, idx, frame) =>
          (id, idx, hexOf(dHashImage(frame).getOrElse(dHashSurrogateBytes(frame))))
        }
      }(Encoders.product[(Long, Int, String)])
      .toDF("id", "frame_idx", "fhash")
  }

  /** Near-duplicate VIDEO pairs: videos sharing at least `minShared`
    * DISTINCT frame hashes, with the shared/union counts for
    * Jaccard-style filtering — re-cuts, re-encodes, and
    * subset/superset edits of the same footage share most frames while
    * unrelated videos share none. Rides the same ONE-shuffle sorted-run
    * machinery as winnowing/n-gram overlap ([[Lsh.scanRuns]]): exploded
    * distinct frame hashes shuffle once on the hash value, and
    * boilerplate frames held by more than `maxDf` videos (intro cards,
    * logo stings, black frames) are dropped mid-stream with O(maxDf)
    * memory — without the cap one shared intro would pair every video
    * with every other.
    */
  def videoOverlapPairs(media: Dataset[MediaRow], frameBytes: Int,
      stride: Int, maxDf: Int = 64, minShared: Int = 2): DataFrame = {
    require(frameBytes >= 1 && stride >= 1,
      s"frameBytes and stride must be >= 1, got $frameBytes/$stride")
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    // maxDf 0 would hit scanRuns' "0 = unbounded" opt-out and silently
    // disable the load-bearing boilerplate-frame cap
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val exploded = frameHashes(media, frameBytes, stride)
      .select(col("id"), col("fhash")).distinct()
    Lsh.overlapPairsFromScan(
      Lsh.scanRuns(exploded, "id", Seq("fhash"), maxDf,
        hotStar = false, emitMembers = true),
      minShared)
  }

  // ---- persisted image-hash index (incremental image dedup) ----
  // The perceptual-hash sibling of Dedup's MinHash signature index:
  // write once, probe each ingest batch with a pruned scan, append the
  // clean batch, compact periodically, loop via foreachBatch.

  private val ImgMetaFileName = "_graft_imghash_meta.json"

  private def writeImgMeta(df: DataFrame, path: String, idCol: String,
      bandBits: Int): Unit = {
    require(!idCol.exists(c => c == '"' || c == '\\'),
      s"writeImageHashIndex: idCol name must not contain '\"' or '\\' " +
        s"(got '$idCol') — alias the column to a plain name first")
    IndexLifecycle.writeMeta(df.sparkSession, path, ImgMetaFileName,
      s"""{"op":"imageHashIndex","id":"$idCol","bandBits":$bandBits,""" +
        s""""gridW":$GridW,"gridH":$GridH}""")
  }

  /** Read + validate the meta, returning (raw text, persisted idCol,
    * band width in bits). Fails loud on a non-artifact directory or a
    * grid-geometry mismatch (a future wider grid would make every probe
    * silently empty). `bandBits` defaults to 8 for pre-field artifacts.
    */
  private def readImgMeta(spark: org.apache.spark.sql.SparkSession,
      path: String, op: String): (String, String, Int) = {
    val txt = IndexLifecycle.requireMeta(spark, path, ImgMetaFileName, op,
      "writeImageHashIndex")
    def strField(name: String): String =
      IndexLifecycle.strField(txt, name)
        .getOrElse(throw new IllegalArgumentException(
          s"$op: malformed $ImgMetaFileName at $path: $txt"))
    def intField(name: String): Int =
      IndexLifecycle.longField(txt, name).map(_.toInt)
        .getOrElse(throw new IllegalArgumentException(
          s"$op: malformed $ImgMetaFileName at $path: $txt"))
    require(intField("gridW") == GridW && intField("gridH") == GridH,
      s"$op: index at $path uses grid ${intField("gridW")}×${intField("gridH")} " +
        s"but this build hashes $GridW×$GridH — probes would never match; " +
        "rebuild the index")
    val bb = IndexLifecycle.longField(txt, "bandBits").map(_.toInt).getOrElse(8)
    (txt, strField("id"), bb)
  }

  private def validateImgMeta(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, op: String): Int = {
    val (_, persisted, bandBits) = readImgMeta(spark, path, op)
    require(persisted == idCol,
      s"$op: index at $path stores ids under '$persisted' but the call " +
        s"passed '$idCol' — pass the index's own id column or rebuild it")
    bandBits
  }

  /** The index's fixed on-disk schema, supplied explicitly on every read
    * so an EMPTY index (legal: a first batch of all-NULL hashes) reads
    * as empty instead of dying on inference. Ids are long (the repo-wide
    * id convention, same as [[Lsh]]).
    */
  private def imgIndexSchema(idCol: String) = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField(idCol, LongType),
      StructField("dhash", StringType),
      StructField("bv", IntegerType),
      StructField("band", IntegerType)))
  }

  /** Above this many distinct (band, bv) probe keys, the index scan
    * skips literal-IN pruning and relies on the broadcast join alone —
    * see the regime note in [[dedupAgainstImageIndex]].
    */
  val PushdownKeyLimit = 4096

  private def requireBandBits(bandBits: Int, op: String): Unit =
    require(bandBits == 8 || bandBits == 16,
      s"$op: bandBits must be 8 (8 bands, Hamming ≤ 7 guarantee) or 16 " +
        s"(4 bands, Hamming ≤ 3 guarantee — the big-corpus layout), got $bandBits")

  /** One row per (band, id): (idCol, dhash, bv, band), with `bandBits`
    * controlling the band value width — 8 → 8 one-byte bands, 16 → 4
    * two-byte bands. Rows with a NULL hash produce nothing (a NULL hash
    * can match nothing — same rule as the banding in [[classReps]]).
    */
  private def bandedHashes(df: DataFrame, idCol: String,
      hashCol: String, bandBits: Int): DataFrame = {
    requireBandBits(bandBits, "imageHashIndex")
    require(hashCol == "dhash" || !df.columns.map(_.toLowerCase)
        .contains("dhash"),
      s"bandedHashes: input already has a 'dhash' column distinct from " +
        s"hashCol '$hashCol' — drop or rename it first")
    QualityFilters.requireFreshColumns(df, "imageHashIndex",
      Seq("band", "bv", "corpus_id", "hamming"))
    // integral ids only, checked loud: a silent cast('long') of string
    // ids would write an all-NULL id index whose self-pair filter then
    // discards every match — the silent-empty failure mode a dedup gate
    // must never have
    df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.LongType |
          org.apache.spark.sql.types.IntegerType => ()
      case dt => throw new IllegalArgumentException(
        s"imageHashIndex: idCol '$idCol' must be an integral column (got " +
          s"${dt.simpleString}) — derive a long id first (the repo-wide " +
          "id convention, as in Lsh)")
    }
    val hb = hashBytesCol(col("dhash"))
    val bandVals =
      if (bandBits == 16)
        transform(sequence(lit(0), lit(GridH / 2 - 1)), r =>
          element_at(hb, r * 2 + 1) * 256 + element_at(hb, r * 2 + 2))
      else hb
    df.select(col(idCol).cast("long").as(idCol), col(hashCol).as("dhash"))
      // the filter is load-bearing: hashBytesCol of a NULL hash is an
      // array of 8 NULL ints (the outer sequence is a literal), which
      // posexplode would emit as NULL band values
      .filter(col("dhash").isNotNull)
      .select(col(idCol), col("dhash"),
        posexplode(bandVals).as(Seq("band", "bv")))
  }

  /** Build the persisted index: banded hash rows partitioned by `band`
    * (probes prune statically) and salt-clustered + `bv`-sorted
    * ([[IndexLifecycle.clusterForPartitionedWrite]]) so each band writes a
    * bounded number of files with tight `bv` row-group bounds for the
    * probe's IN pushdown.
    *
    * `bandBits` picks the on-disk band width, persisted in the meta so
    * appends and probes self-configure: 8 → 8 one-byte bands (Hamming
    * ≤ 7 detection guarantee), 16 → 4 two-byte bands (guarantee ≤ 3,
    * Manku's production radius — and the layout a LARGE corpus needs:
    * one-byte band values saturate their 256-value domain at any real
    * corpus size, making every probe key match ~N/256 index rows;
    * measured 87.9 → 1.1 s on a 500k-row index probe, SCALE.md.
    * Norouzi CVPR'12's analysis: band width should grow with log₂ N).
    */
  def writeImageHashIndex(df: DataFrame, idCol: String, hashCol: String,
      path: String, bandBits: Int = 8): Unit = {
    requireBandBits(bandBits, "writeImageHashIndex")
    IndexLifecycle.clusterForPartitionedWrite(bandedHashes(df, idCol, hashCol, bandBits),
        "band", sortCols = Seq("bv"))
      .write.mode("overwrite").partitionBy("band").parquet(path)
    writeImgMeta(df, path, idCol, bandBits)
  }

  /** APPEND a cleaned ingest batch's hash rows — one pass over the
    * BATCH, the corpus-sized index is never rewritten. The batch lands as
    * a STAGED subtree (`path/_ingest/<queryTag>/b_<batchId>`, written to
    * `.tmp` and renamed — [[IndexLifecycle.writeViaTmp]]): a crash
    * mid-append leaves nothing probe-visible, and a REPLAYED streaming
    * append overwrites its own subtree instead of duplicating rows —
    * same contract as [[Dedup.appendToSignatureIndex]]. The manual
    * default allocates the next free id under the `append` tag.
    */
  def appendToImageHashIndex(df: DataFrame, idCol: String, hashCol: String,
      path: String, queryTag: String = "append", batchId: Long = -1L): Unit = {
    val spark = df.sparkSession
    val bandBits = validateImgMeta(spark, path, idCol,
      "appendToImageHashIndex")
    val id = if (batchId >= 0L) batchId
      else IndexLifecycle.nextAppendBatchId(spark, path, queryTag)
    IndexLifecycle.requireBatchIdFresh(spark, path, queryTag, id,
      "appendToImageHashIndex")
    val dir = IndexLifecycle.ingestBatchDir(path, queryTag, id)
    val rows = bandedHashes(df, idCol, hashCol, bandBits)
    IndexLifecycle.writeViaTmp(spark, dir) { tmp =>
      rows.write.mode("overwrite").partitionBy("band").parquet(tmp)
    }
  }

  /** Base tree ∪ published append subtrees (in-flight `.tmp` stages
    * invisible), minus the optionally-excluded one (a replaying batch
    * must not probe its own previous write).
    */
  private def imageIndexRoots(spark: org.apache.spark.sql.SparkSession,
      path: String, exclude: Option[String] = None): Seq[String] =
    IndexLifecycle.liveRoots(spark, path, exclude)

  /** INCREMENTAL near-dup check of an ingest batch against the index:
    * one row per (batch doc, matched corpus doc) with the exact Hamming
    * distance (≤ `maxHamming`). Probe shape mirrors
    * [[Dedup.dedupAgainstIndex]]: the batch's distinct (band, bv) keys —
    * bounded by 8 × |batch|, the ingest-batch contract, checked via
    * `maxProbeKeys` — collect into a per-band `bv IN (…)` filter pushed
    * into the index scan (partition pruning on `band`, row-group pruning
    * on `bv`); surviving index rows hash-join the BROADCAST batch side;
    * the corpus index never shuffles.
    */
  def dedupAgainstImageIndex(newDocs: DataFrame, idCol: String,
      hashCol: String, indexPath: String, maxHamming: Int = 6,
      maxProbeKeys: Int = 1 << 20,
      excludeSubtree: Option[String] = None): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64,
      s"maxHamming must be in [0, 64], got $maxHamming")
    val spark = newDocs.sparkSession
    val bandBits = validateImgMeta(spark, indexPath, idCol,
      "dedupAgainstImageIndex")
    val probes = bandedHashes(newDocs, idCol, hashCol, bandBits)
    val keyRows = probes.select(col("band"), col("bv")).distinct()
      .take(maxProbeKeys + 1)
    require(keyRows.length <= maxProbeKeys,
      s"dedupAgainstImageIndex collects the batch's (band, bv) probe keys " +
        s"to the driver, and they exceed maxProbeKeys=$maxProbeKeys — this " +
        "operator is for BOUNDED ingest batches probing a large index; " +
        "split the batch or raise maxProbeKeys explicitly")
    if (keyRows.isEmpty)
      return probes.select(col(idCol), col(idCol).as("corpus_id"),
        lit(0).as("hamming")).limit(0)
    val index0 = imageIndexRoots(spark, indexPath, excludeSubtree)
      .map(r => spark.read.schema(imgIndexSchema(idCol)).parquet(r))
      .reduce(_ unionByName _)
    // two probe regimes by key count:
    //  - SMALL key sets: literal (band, bv) pruning pushes into the scan
    //    as a data filter (flat IN) + per-band OR refinement — the
    //    sig-index two-stage pattern, skipping row groups entirely.
    //  - LARGE key sets (a big batch saturating the band-value domain):
    //    the literals prune nothing — every row group contains matching
    //    values — while the 10⁴–10⁵-literal expression tree costs real
    //    evaluation time and real memory in EVERY task's deserialized
    //    plan (measured: driver-side OOM class at 2×10⁴ literals).
    //    Skip the filters; the broadcast hash join below IS the filter,
    //    at O(1) per index row.
    val index =
      if (keyRows.length > PushdownKeyLimit) index0
      else {
        val keysByBand = keyRows.groupBy(_.getInt(0)).view
          .mapValues(_.map(_.getInt(1)).toSeq).toMap
        val prune = keysByBand.toSeq.sortBy(_._1).map { case (b, bvs) =>
          col("band") === b && col("bv").isin(bvs: _*)
        }.reduce(_ || _)
        val allBvs = keysByBand.values.flatten.toSeq.distinct
        index0.filter(col("bv").isin(allBvs: _*)).filter(prune)
      }
    val ham = hammingHexCol(col("n.dhash"), col("c.dhash"))
    index.as("c")
      .join(broadcast(probes.as("n")),
        col("n.band") === col("c.band") && col("n.bv") === col("c.bv"))
      .filter(col(s"n.$idCol") =!= col(s"c.$idCol"))
      .select(col(s"n.$idCol").as(idCol), col(s"c.$idCol").as("corpus_id"),
        ham.as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct() // bands agreeing on the same pair collapse
  }

  /** [[dedupAgainstImageIndex]] keep-side filter: the batch with indexed
    * near-dups removed — only genuinely new images enter the corpus.
    */
  def cleanAgainstImageIndex(newDocs: DataFrame, idCol: String,
      hashCol: String, indexPath: String, maxHamming: Int = 6,
      maxProbeKeys: Int = 1 << 20,
      excludeSubtree: Option[String] = None): DataFrame =
    newDocs.join(
      dedupAgainstImageIndex(newDocs, idCol, hashCol, indexPath, maxHamming,
        maxProbeKeys, excludeSubtree).select(idCol).distinct(),
      Seq(idCol), "left_anti")

  /** Compact an appended index into `targetPath` (NEW disjoint path —
    * in-place would race live probes): bounded files per band, `bv`
    * re-sorted for row-group pruning, exact duplicate rows from replayed
    * appends dropped, meta copied verbatim.
    */
  def compactImageHashIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, targetPath: String, filesPerBand: Int = 1): Unit = {
    require(filesPerBand >= 1, s"filesPerBand must be >= 1, got $filesPerBand")
    IndexLifecycle.requireDistinctPaths(spark, path, targetPath, "compactImageHashIndex")
    val (txt, idCol, _) = readImgMeta(spark, path, "compactImageHashIndex")
    // append subtrees fold into the compacted base (clean _ingest slate)
    val all = imageIndexRoots(spark, path)
      .map(r => spark.read.schema(imgIndexSchema(idCol)).parquet(r))
      .reduce(_ unionByName _)
    IndexLifecycle.clusterForPartitionedWrite(all.distinct(),
        "band", filesPerPartition = filesPerBand, sortCols = Seq("bv"))
      .write.mode("overwrite").partitionBy("band").parquet(targetPath)
    IndexLifecycle.writeMeta(spark, targetPath, ImgMetaFileName, txt)
  }

  /** The full append-only image-ingest loop as ONE Structured Streaming
    * query — the perceptual-hash counterpart of [[Dedup.streamingIngest]]:
    * per microbatch over (id, hash) rows, (1) near-dedup WITHIN the batch
    * ([[dedupImages]] — the index only knows previous batches), (2) drop
    * docs with an indexed near-dup ([[cleanAgainstImageIndex]]), (3) hand
    * survivors to `sink`, (4) [[appendToImageHashIndex]] them for the
    * next batch. Hash upstream (e.g. [[dHashImages]] over the decoded
    * media column) so the loop stays decoder-agnostic.
    *
    * Delivery: a replayed append OVERWRITES its own staged subtree and
    * the replay's probe excludes it (see [[appendToImageHashIndex]]), so
    * a replayed batch sees exactly the pre-batch index state; `sink`
    * must be idempotent, the standard `foreachBatch` contract. Batch and
    * its cleaned half are persisted for the trigger only.
    */
  def streamingImageIngest(stream: DataFrame, idCol: String, hashCol: String,
      indexPath: String, checkpointDir: String,
      sink: (DataFrame, Long) => Unit,
      maxHamming: Int = 6,
      maxProbeKeys: Int = 1 << 20,
      maxLiveSubtrees: Int = 0): org.apache.spark.sql.streaming.StreamingQuery = {
    val tag = IndexLifecycle.queryTagOf(stream.sparkSession, checkpointDir)
    // banded-row schema from the PLAN only (no job) — what the in-loop
    // compaction reads possibly-empty subtrees under; the band width is
    // the index's own (immutable for its lifetime, resolved once)
    val bandBits = validateImgMeta(stream.sparkSession, indexPath, idCol,
      "streamingImageIngest")
    val hashSchema = bandedHashes(stream.sparkSession
        .createDataFrame(stream.sparkSession.sparkContext
          .emptyRDD[org.apache.spark.sql.Row], stream.schema),
      idCol, hashCol, bandBits).schema
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        maybeCompactImageIngest(batch.sparkSession, indexPath, tag, batchId,
          maxLiveSubtrees, hashSchema)
        val b = batch.persist()
        try {
          val inBatch = dedupImages(b.toDF(), idCol, hashCol, maxHamming)
          // a REPLAY must not probe its own previous append
          val own = IndexLifecycle.ingestBatchDir(indexPath, tag, batchId)
          val clean = cleanAgainstImageIndex(inBatch, idCol, hashCol,
            indexPath, maxHamming, maxProbeKeys,
            excludeSubtree = Some(own)).persist()
          try {
            sink(clean, batchId)
            appendToImageHashIndex(clean, idCol, hashCol, indexPath,
              queryTag = tag, batchId = batchId)
          } finally { clean.unpersist(); () }
        } finally {
          b.unpersist()
          // each batch's plan differs (fresh offsets), so the one-slot
          // barrier caches dedupImages filled can never be reused by the
          // NEXT trigger — release per trigger, or the last batch's two
          // cached projections pin executor storage for the session
          releaseBarriers()
        }
      }
      .start()
  }

  /** The loop's `maxLiveSubtrees` trigger ([[IndexLifecycle
    * .compactOwnSubtrees]] mechanics): the query's accumulated hash
    * subtrees fold into one under the base clustered layout (band
    * partitions, bv-sorted row groups). Row-identical union → every later
    * probe is bit-identical; only the file/subtree count collapses. 0
    * disables.
    */
  private[operators] def maybeCompactImageIngest(
      spark: org.apache.spark.sql.SparkSession, indexPath: String,
      queryTag: String, batchId: Long, maxLiveSubtrees: Int,
      hashSchema: org.apache.spark.sql.types.StructType): Boolean =
    maxLiveSubtrees > 0 &&
      IndexLifecycle.compactOwnSubtrees(spark, indexPath, queryTag, batchId,
          maxLiveSubtrees) { (sources, tmp) =>
        val all = sources.map(s => spark.read.schema(hashSchema).parquet(s))
          .reduce(_ unionByName _)
        IndexLifecycle.clusterForPartitionedWrite(all, "band",
            sortCols = Seq("bv"))
          .write.mode("overwrite").partitionBy("band").parquet(tmp)
      }
}
