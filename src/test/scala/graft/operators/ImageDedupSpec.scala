package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Multimodal.MediaRow

/** Real-decoder leg of [[ImageDedup]]: the oracle entry (`q_image_dedup`)
  * locks the surrogate column path cross-engine; this suite locks the
  * `javax.imageio` path on GENERATED images — determinism, resize
  * robustness, corrupt-payload fallback, and end-to-end clustering of a
  * planted duplicate set.
  */
class ImageDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic synthetic photo: a horizontal gradient plus a seeded
    * blocky texture — enough horizontal structure for a non-degenerate
    * dHash (a flat fill would hash to all zeros).
    */
  private def makeImage(w: Int, h: Int, seed: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rnd = new java.util.Random(seed)
    val blocks = Array.fill(8, 8)(rnd.nextInt(128))
    for (y <- 0 until h; x <- 0 until w) {
      val base = 127 * x / math.max(1, w - 1)
      val tex = blocks(math.min(7, y * 8 / h))(math.min(7, x * 8 / w))
      val v = math.min(255, base + tex)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def pngBytes(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def resized(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, w, h, null)
    g.dispose()
    out
  }

  private def hamming(a: String, b: String): Int =
    (0 until 8).map { r =>
      java.lang.Integer.bitCount(
        Integer.parseInt(a.substring(r * 2, r * 2 + 2), 16) ^
          Integer.parseInt(b.substring(r * 2, r * 2 + 2), 16))
    }.sum

  test("dHashImage: deterministic, resize-robust, distinct for distinct content") {
    val base = makeImage(240, 160, seed = 7)
    val h1 = ImageDedup.hexOf(ImageDedup.dHashImage(pngBytes(base)).get)
    val h2 = ImageDedup.hexOf(ImageDedup.dHashImage(pngBytes(base)).get)
    assert(h1 === h2, "same payload must hash identically")
    assert(h1.matches("[0-9a-f]{16}"), s"16 lowercase hex chars: $h1")
    assert(h1 !== ImageDedup.ZeroHash, "textured image must not hash to zero")

    // the dHash property: a downscaled copy stays within a small Hamming
    // ball of the original (gradients survive resampling)
    val small = ImageDedup.hexOf(
      ImageDedup.dHashImage(pngBytes(resized(base, 96, 64))).get)
    assert(hamming(h1, small) <= 6,
      s"resize must stay near-dup: d(${h1}, ${small}) = ${hamming(h1, small)}")

    // different content lands far away
    val other = ImageDedup.hexOf(
      ImageDedup.dHashImage(pngBytes(makeImage(240, 160, seed = 99))).get)
    assert(hamming(h1, other) > 6,
      s"distinct images must separate: d = ${hamming(h1, other)}")

    // 1×1 and tiny images produce a full (degenerate) grid, no crash
    assert(ImageDedup.dHashImage(pngBytes(makeImage(1, 1, seed = 1))).get
      .forall(_ == 0), "flat 1x1 image has no gradients")
    assert(ImageDedup.dHashImage(pngBytes(makeImage(3, 2, seed = 5))).isDefined)
  }

  test("pHash: deterministic, brightness-invariant, resize-robust, distinct content separates") {
    def brightened(img: BufferedImage, delta: Int): BufferedImage = {
      val out = new BufferedImage(img.getWidth, img.getHeight,
        BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        def ch(s: Int) = math.min(255, math.max(0, ((rgb >> s) & 0xff) + delta))
        out.setRGB(x, y, (ch(16) << 16) | (ch(8) << 8) | ch(0))
      }
      out
    }
    val base = makeImage(240, 160, seed = 7)
    val h1 = ImageDedup.hexOf(ImageDedup.pHashImage(pngBytes(base)).get)
    val h2 = ImageDedup.hexOf(ImageDedup.pHashImage(pngBytes(base)).get)
    assert(h1 === h2 && h1.matches("[0-9a-f]{16}"))
    // AC coefficients ignore a uniform brightness shift entirely — the
    // pHash property dHash does not have by construction
    val bright = ImageDedup.hexOf(
      ImageDedup.pHashImage(pngBytes(brightened(base, 12))).get)
    assert(hamming(h1, bright) <= 2,
      s"brightness shift must barely move pHash: ${hamming(h1, bright)}")
    val small = ImageDedup.hexOf(
      ImageDedup.pHashImage(pngBytes(resized(base, 96, 64))).get)
    assert(hamming(h1, small) <= 6,
      s"resize must stay near: ${hamming(h1, small)}")
    val other = ImageDedup.hexOf(
      ImageDedup.pHashImage(pngBytes(makeImage(240, 160, seed = 99))).get)
    assert(hamming(h1, other) > 6,
      s"distinct images must separate: ${hamming(h1, other)}")
    assert(ImageDedup.pHashImage("not an image".getBytes("UTF-8")).isEmpty)
    // the "brightness never votes" invariant is structural: bit (0,0)
    // is fixed 0, so every pHash byte 0 has its LSB clear
    assert((Integer.parseInt(h1.substring(0, 2), 16) & 1) === 0)
    // NULL payloads are rejected cleanly, never an NPE (nullable binary
    // columns are legal media inputs)
    assert(ImageDedup.pHashImage(null).isEmpty)
    assert(ImageDedup.dHashImage(null).isEmpty)
    assert(ImageDedup.dHashSurrogateBytes(null).forall(_ == 0))
    // the shared stack consumes pHash columns unchanged
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/png", pngBytes(base)),
      Multimodal.MediaRow(2L, "image/png", pngBytes(brightened(base, 12))),
      Multimodal.MediaRow(3L, "image/png", pngBytes(makeImage(240, 160, seed = 99)))
    ).toDS()
    val reps = ImageDedup.imageClusters(
        ImageDedup.pHashImages(rows), "id", "phash")
      .select("id", "rep").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps === Map(1L -> 1L, 2L -> 1L, 3L -> 3L), s"$reps")
  }

  test("dHashImage falls back for corrupt payloads; grid core matches packing contract") {
    assert(ImageDedup.dHashImage("not an image".getBytes("UTF-8")).isEmpty)
    assert(ImageDedup.dHashSurrogateBytes(Array.emptyByteArray)
      .forall(_ == 0))
    // bit packing: strictly increasing row -> all 8 bits set per row
    val inc = Array.tabulate(72)(i => i.toLong)
    assert(ImageDedup.dHashBytesFromGrid(inc).forall(_ == 0xff))
    assert(ImageDedup.hexOf(ImageDedup.dHashBytesFromGrid(inc)) === "ff" * 8)
    // flat grid -> no bits (comparison is strict)
    assert(ImageDedup.dHashBytesFromGrid(Array.fill(72)(5L)).forall(_ == 0))
  }

  test("end-to-end: PNG media column clusters duplicates and resizes together, singletons apart") {
    val a = makeImage(240, 160, seed = 7)
    val b = makeImage(240, 160, seed = 99)
    val c = makeImage(200, 140, seed = 1234)
    val rows = Seq(
      MediaRow(1L, "image/png", pngBytes(a)),
      MediaRow(2L, "image/png", pngBytes(a)), // exact dup of 1
      MediaRow(3L, "image/png", pngBytes(resized(a, 120, 80))), // near dup of 1
      MediaRow(4L, "image/png", pngBytes(b)),
      MediaRow(5L, "image/png", pngBytes(c)),
      MediaRow(6L, "application/octet-stream", "not an image".getBytes("UTF-8"))
    ).toDS()
    val hashed = ImageDedup.dHashImages(rows)
    val reps = ImageDedup.imageClusters(hashed, "id", "dhash")
      .select("id", "rep").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps(1L) === 1L && reps(2L) === 1L && reps(3L) === 1L,
      s"exact + resized copies must cluster with the original: $reps")
    assert(reps(4L) === 4L && reps(5L) === 5L && reps(6L) === 6L,
      s"distinct images and the non-image payload stay singletons: $reps")
    val kept = ImageDedup.dedupImages(hashed, "id", "dhash")
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L, 5L, 6L))

    // collapse-exact is an optimization, not a semantics change: both
    // modes must produce identical (id, rep) assignments
    val uncollapsed = ImageDedup
      .imageClusters(hashed, "id", "dhash", collapseExact = false)
      .select("id", "rep").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(uncollapsed === reps, "collapseExact must be output-identical")

    // survivor policy: keep the highest-keepBy member per cluster, not
    // the minimum id (ties break to the lowest id)
    val withQuality = hashed.withColumn("w",
      when(col("id") === 3L, 100).otherwise(col("id").cast("int")))
    val best = ImageDedup.dedupImagesBy(withQuality, "id", "dhash",
        keepBy = col("w"))
      .select("id").as[Long].collect().toSet
    assert(best === Set(3L, 4L, 5L, 6L),
      s"cluster {1,2,3} must keep the max-quality member 3: $best")

    // NULL hashes mean "unknown", never "identical": two null-hash docs
    // must each stay their own singleton in BOTH modes (the collapse
    // must not invent a Hamming-0 class out of NULLs)
    val withNulls = Seq((3L, null.asInstanceOf[String]),
      (7L, null.asInstanceOf[String]), (9L, "0f0f0f0f0f0f0f0f"))
      .toDF("id", "dhash")
    for (collapse <- Seq(true, false)) {
      val m = ImageDedup.imageClusters(withNulls, "id", "dhash",
          collapseExact = collapse)
        .select("id", "rep").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(m === Map(3L -> 3L, 7L -> 7L, 9L -> 9L),
        s"null hashes must be singletons (collapse=$collapse): $m")
    }
  }

  test("image-hash index: probe catches exact and near dups, append accumulates, compact merges, guards fail loud") {
    val idx = tempDir("graft_imgidx") + "/idx"
    val A = "0000000000000000"
    val F = "ffffffffffffffff"
    val corpus = Seq((1L, A), (2L, F)).toDF("id", "dhash")
    ImageDedup.writeImageHashIndex(corpus, "id", "dhash", idx)

    val nearA = "0100000000000000" // Hamming 1 from A, shares 7 bands
    val newH = "0f0f0f0f0f0f0f0f" // Hamming 32 from both corpus hashes
    val batch = Seq((10L, A), (11L, nearA), (12L, newH)).toDF("id", "dhash")
    val flagged = ImageDedup.dedupAgainstImageIndex(batch, "id", "dhash", idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(flagged === Set((10L, 1L, 0), (11L, 1L, 1)),
      s"exact + near dup must flag against corpus id 1 only: $flagged")
    val clean = ImageDedup.cleanAgainstImageIndex(batch, "id", "dhash", idx)
      .select("id").as[Long].collect().toSet
    assert(clean === Set(12L))

    // append the clean doc; a later near-dup of it is now caught
    ImageDedup.appendToImageHashIndex(
      Seq((12L, newH)).toDF("id", "dhash"), "id", "dhash", idx)
    val batch2 = Seq((20L, "0f0f0f0f0f0f0f1f"), (21L, "3333333333333333"))
      .toDF("id", "dhash") // 20 is Hamming 1 from newH; 21 is far from all
    def probe(p: String) = ImageDedup
      .dedupAgainstImageIndex(batch2, "id", "dhash", p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(probe(idx) === Set((20L, 12L, 1)),
      s"appended hashes must be probe-able: ${probe(idx)}")

    // compaction answers identically with bounded files per band
    val compacted = tempDir("graft_imgidx") + "/compacted"
    ImageDedup.compactImageHashIndex(spark, idx, compacted)
    assert(probe(compacted) === probe(idx))
    val bandFiles = new java.io.File(compacted, "band=0")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(bandFiles <= 1, s"compaction must bound files per band, got $bandFiles")

    // an all-NULL-hash batch probes as empty (no crash, no rows)
    assert(ImageDedup.dedupAgainstImageIndex(
      Seq((30L, null.asInstanceOf[String])).toDF("id", "dhash"),
      "id", "dhash", idx).count() === 0L)

    // bandBits = 16 (the big-corpus layout: 4 two-byte bands, Hamming
    // ≤ 3 guarantee): appends and probes self-configure from the meta
    // and agree with the 8-bit layout on within-guarantee pairs
    val idx16 = tempDir("graft_imgidx16") + "/idx"
    ImageDedup.writeImageHashIndex(corpus, "id", "dhash", idx16, bandBits = 16)
    ImageDedup.appendToImageHashIndex(
      Seq((12L, newH)).toDF("id", "dhash"), "id", "dhash", idx16)
    assert(probe(idx16) === probe(idx),
      "16-bit-band probes must find the same within-guarantee pairs")
    val bandDirs16 = new java.io.File(idx16).listFiles()
      .count(_.getName.startsWith("band="))
    assert(bandDirs16 === 4, s"16-bit layout has 4 bands, got $bandDirs16")

    // guards: non-artifact dir; id-column mismatch; nested compact target
    val e1 = intercept[IllegalArgumentException] {
      ImageDedup.dedupAgainstImageIndex(batch, "id", "dhash",
        tempDir("graft_imgidx_bogus"))
    }
    assert(e1.getMessage.contains("writeImageHashIndex"))
    val e2 = intercept[IllegalArgumentException] {
      ImageDedup.appendToImageHashIndex(
        batch.withColumnRenamed("id", "img_id"), "img_id", "dhash", idx)
    }
    assert(e2.getMessage.contains("img_id"))
    val e3 = intercept[IllegalArgumentException] {
      ImageDedup.compactImageHashIndex(spark, idx, idx + "/compacted")
    }
    assert(e3.getMessage.contains("disjoint"))
    // string ids would silently cast to all-NULL and make the self-pair
    // filter discard every match — the guard fails loud instead
    val e4 = intercept[IllegalArgumentException] {
      ImageDedup.writeImageHashIndex(
        Seq(("doc-001", A)).toDF("id", "dhash"), "id", "dhash",
        tempDir("graft_imgidx_sid"))
    }
    assert(e4.getMessage.contains("integral"), e4.getMessage)
  }

  test("streamingImageIngest: within-batch dedup -> index clean -> sink -> append, per microbatch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val idx = tempDir("graft_imgidx_si") + "/idx"
    ImageDedup.writeImageHashIndex(
      Seq((1L, "0000000000000000")).toDF("id", "dhash"), "id", "dhash", idx)

    val in = MemoryStream[(Long, String)]
    val perBatch = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val q = ImageDedup.streamingImageIngest(
      in.toDF().toDF("id", "dhash"), "id", "dhash", idx,
      tempDir("graft_imgsi_ckpt"),
      sink = (clean, batchId) => {
        perBatch(batchId) = clean.select("id").collect().map(_.getLong(0)).toSet
        ()
      })
    try {
      // batch 0: an indexed near-dup (drops), a new hash, and a
      // WITHIN-batch exact dup of that new hash (one survivor)
      in.addData(
        (10L, "0100000000000000"), // Hamming 1 from indexed -> drops
        (11L, "0f0f0f0f0f0f0f0f"), // new
        (12L, "0f0f0f0f0f0f0f0f")) // within-batch dup of 11
      q.processAllAvailable()
      assert(perBatch(0L) === Set(11L), s"batch 0: ${perBatch.toMap}")
      // batch 1: near-dup of the doc APPENDED in batch 0 -> caught via
      // the index append; plus one genuinely new hash
      in.addData(
        (20L, "0f0f0f0f0f0f0f1f"), // Hamming 1 from appended 11
        (21L, "3333333333333333"))
      q.processAllAvailable()
      assert(perBatch(1L) === Set(21L), s"batch 1: ${perBatch.toMap}")
    } finally q.stop()
  }

  test("video near-dup: shared-frame overlap pairs re-cuts, df cap kills boilerplate intros") {
    // synthetic "videos": payload = concatenated fixed-size frames, each
    // frame a distinct deterministic byte pattern (the stub-decode seam —
    // frame hash = byte-surrogate dHash of the block)
    val fb = 64
    def frame(tag: Int): Array[Byte] =
      Array.tabulate(fb)(i => ((tag * 31 + i * 7) % 251).toByte)
    val intro = frame(999) // shared by EVERY video (logo sting)
    def video(frames: Seq[Int]): Array[Byte] =
      (intro +: frames.map(frame)).reduce(_ ++ _)
    val rows = Seq(
      Multimodal.MediaRow(1L, "video/raw", video(Seq(1, 2, 3, 4, 5, 6, 7, 8))),
      Multimodal.MediaRow(2L, "video/raw", video(Seq(1, 2, 3, 4, 5, 6, 20, 21))), // re-cut: 6 shared
      Multimodal.MediaRow(3L, "video/raw", video(Seq(30, 31, 32, 33, 34, 35, 36, 37))), // unrelated
      Multimodal.MediaRow(4L, "video/raw", video(Seq(40, 41))),
      Multimodal.MediaRow(5L, "video/raw", null) // NULL media: no frames, no NPE
    ).toDS()
    val fh = ImageDedup.frameHashes(rows, frameBytes = fb, stride = 1)
    assert(fh.filter(col("id") === 1L).count() === 9L, "intro + 8 frames")
    // identical content blocks hash identically across videos
    val f1 = fh.filter(col("id") === 1L && col("frame_idx") === 1)
      .select("fhash").collect().head.getString(0)
    val f2 = fh.filter(col("id") === 2L && col("frame_idx") === 1)
      .select("fhash").collect().head.getString(0)
    assert(f1 === f2)

    // maxDf = 3 drops the intro (df 4); the re-cut pair shares 6 frames
    val pairs = ImageDedup.videoOverlapPairs(rows, frameBytes = fb,
        stride = 1, maxDf = 3, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // union counts over the DF-CAPPED hash universe (the dropped intro
    // contributes to neither side — winnowOverlapPairs semantics)
    assert(pairs.toSeq === Seq((1L, 2L, 6L, 10L)),
      s"only the re-cut pair, 6 shared of 10 capped-union: ${pairs.toSeq}")

    // without the cap the intro links everything — the guard the cap exists for
    val uncapped = ImageDedup.videoOverlapPairs(rows, frameBytes = fb,
      stride = 1, maxDf = 64, minShared = 1).count()
    assert(uncapped === 6L, "all C(4,2) pairs link through the shared intro")
  }

  test("surrogate column path agrees with the Scala surrogate on UTF-8-safe text") {
    // dHashTextCol samples CODE POINTS of the string; dHashSurrogateBytes
    // samples BYTES — on ASCII they coincide, which is the bridge the
    // oracle entry stands on
    val texts = Seq("", "short", "a" * 71, ("the quick brown fox " * 20).trim,
      (0 until 300).map(i => ('a' + i % 26).toChar).mkString)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val colHashes = df.select(col("id"),
        ImageDedup.dHashTextCol(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val scalaHash = ImageDedup.hexOf(
        ImageDedup.dHashSurrogateBytes(t.getBytes("UTF-8")))
      assert(colHashes(i.toLong) === scalaHash, s"text #$i '$t'")
    }
    // NULL text takes the ZeroHash guard
    val nullHash = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .select(ImageDedup.dHashTextCol(col("text"))).collect().head.getString(0)
    assert(nullHash === ImageDedup.ZeroHash)
  }
}
