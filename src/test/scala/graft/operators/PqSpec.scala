package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IVF-PQ contracts ([[Pq]]): integer-exact encoding and ADC, the rerank
  * exactness contract, training determinism and convergence, and the
  * persisted index (codes-only bytes, codebook roundtrip).
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = graft.Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding"))

  private def corpusVecs(n: Int): Seq[(Long, Array[Float])] =
    emb.limit(n).collect()
      .map(r => (r.getLong(0), r.getAs[Seq[Float]](1).toArray)).toSeq

  test("encode: every code in range; argmin matches a driver brute force") {
    val cb = Pq.train(emb, "vec_id", "embedding", subspaces = 8, codes = 16,
      iters = 3, trainN = 200)
    val got = Pq.encode(emb.limit(50), "embedding", cb)
      .select(col("vec_id"), col("embedding"), col("pq_code")).collect()
      .map(r => (r.getLong(0), r.getAs[Seq[Float]](1).toArray,
        r.getSeq[Int](2).toArray))
    assert(got.nonEmpty)
    got.foreach { case (id, vec, code) =>
      assert(code.length == 8, s"id $id: ${code.length} codes")
      val xq = Pq.quantizeUnitDriver(vec, cb.scale)
      code.zipWithIndex.foreach { case (c, s) =>
        assert(c >= 0 && c < 16, s"id $id sub $s code $c out of range")
        // brute-force integer-L2 argmin, tie -> lowest code
        val dists = cb.books(s).map { cw =>
          (0 until cb.subDim).map { i =>
            val d = xq(s * cb.subDim + i) - cw(i); d * d
          }.sum
        }
        val want = dists.zipWithIndex.minBy { case (d, i) => (d, i) }._2
        assert(c == want, s"id $id sub $s: got $c want $want")
      }
    }
  }

  test("ADC score equals the driver integer table sum, row by row") {
    val cb = Pq.train(emb, "vec_id", "embedding", subspaces = 8, codes = 16,
      iters = 2, trainN = 100)
    val query = corpusVecs(1).head._2
    val tables = Pq.adcTables(query, cb)
    val got = Pq.encode(emb.limit(40), "embedding", cb)
      .select(col("vec_id"), col("pq_code"),
        Pq.adcScore(col("pq_code"), tables).as("adc")).collect()
    got.foreach { r =>
      val code = r.getSeq[Int](1)
      val want = code.zipWithIndex.map { case (c, s) => tables(s)(c) }.sum
      assert(r.getLong(2) == want, s"vec ${r.getLong(0)}")
    }
  }

  test("rerank contract: rerankK = corpus size reproduces exact top-k, flat and IVF") {
    val corpus = emb.filter(col("vec_id") =!= 0)
    val query = emb.filter(col("vec_id") === 0)
      .select("embedding").collect().head.getAs[Seq[Float]](0).toArray
    val n = corpus.count().toInt
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        query, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    val cb = Pq.train(corpus, "vec_id", "embedding", subspaces = 8, codes = 16,
      iters = 3, trainN = 200)
    val encoded = Pq.encode(corpus, "embedding", cb)
    val flat = Pq.pqSearchTopK(encoded, corpus, "vec_id", "embedding", cb,
        query, k = 10, rerankK = n)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(flat === exact, "flat PQ with full rerank must be exact")

    val cents = Similarity.collectCentroids(
      emb.filter(col("vec_id") < 8), "vec_id", "embedding")
    val assigned = Similarity.ivfAssign(corpus, "vec_id", "embedding", cents)
    val encodedIvf = Pq.encode(assigned, "embedding", cb)
    val ivfAll = Pq.ivfPqSearchTopK(encodedIvf, corpus, "vec_id", "embedding",
        cents, cb, query, k = 10, rerankK = n, nprobe = cents.size)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivfAll === exact, "IVF-PQ probing every cell with full rerank must be exact")
  }

  test("a modest rerankK already recovers the exact top-k on real embeddings") {
    val corpus = emb.filter(col("vec_id") =!= 0)
    val query = emb.filter(col("vec_id") === 0)
      .select("embedding").collect().head.getAs[Seq[Float]](0).toArray
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        query, k = 10).collect().map(_.getLong(0)).toSeq
    // the canonical FAISS shape: 16 subspaces x 256 codes = 16-byte codes
    // (16x smaller than 64 float32s); on these near-random synthetic
    // embeddings the coarser 8x16 config cannot separate neighbors
    val cb = Pq.train(corpus, "vec_id", "embedding", subspaces = 16,
      codes = 256, iters = 5)
    val encoded = Pq.encode(corpus, "embedding", cb)
    val got = Pq.pqSearchTopK(encoded, corpus, "vec_id", "embedding", cb,
        query, k = 10, rerankK = 64)
      .collect().map(_.getLong(0)).toSeq
    assert(got === exact,
      "16x256 PQ at rerankK=64 over ~500 rows should recover the exact " +
        "top-10 (ADC recall regression if this trips)")
  }

  test("training is deterministic and Lloyd iterations reduce quantization error") {
    val a = Pq.train(emb, "vec_id", "embedding", subspaces = 4, codes = 8,
      iters = 4, trainN = 150, seed = 7L)
    val b = Pq.train(emb, "vec_id", "embedding", subspaces = 4, codes = 8,
      iters = 4, trainN = 150, seed = 7L)
    assert(a.books.flatten.map(_.toSeq) == b.books.flatten.map(_.toSeq),
      "same seed must reproduce identical codebooks")

    // total integer-L2 quantization error must not grow with training
    def errorOf(cb: Pq.Codebooks): Long = {
      val rows = emb.collect()
        .map(r => Pq.quantizeUnitDriver(r.getAs[Seq[Float]](1).toArray, cb.scale))
      rows.map { xq =>
        (0 until cb.subspaces).map { s =>
          cb.books(s).map { cw =>
            (0 until cb.subDim).map { i =>
              val d = xq(s * cb.subDim + i) - cw(i); d * d
            }.sum
          }.min
        }.sum
      }.sum
    }
    val seeded = Pq.train(emb, "vec_id", "embedding", subspaces = 4, codes = 8,
      iters = 0, trainN = 150, seed = 7L)
    assert(errorOf(a) <= errorOf(seeded),
      "4 Lloyd iterations must not increase quantization error vs raw seeds")
  }

  test("persisted index: roundtrip, partition pruning filter shape, code bytes << vector bytes") {
    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString
    val corpus = emb.filter(col("vec_id") >= 8)
    val cents = Similarity.collectCentroids(
      emb.filter(col("vec_id") < 8), "vec_id", "embedding")
    val cb = Pq.train(corpus, "vec_id", "embedding", subspaces = 8, codes = 16,
      iters = 2, trainN = 200)
    val encoded = Pq.encode(
      Similarity.ivfAssign(corpus, "vec_id", "embedding", cents),
      "embedding", cb)
    Pq.writeIndex(encoded, "vec_id", cents, cb, s"$dir/pq")
    Similarity.ivfWrite(
      Similarity.ivfAssign(corpus, "vec_id", "embedding", cents), s"$dir/full")

    val cb2 = Pq.readCodebooks(spark, s"$dir/pq")
    assert(cb2.books.flatten.map(_.toSeq) == cb.books.flatten.map(_.toSeq) &&
      cb2.scale == cb.scale && cb2.subDim == cb.subDim)
    val cents2 = Similarity.ivfReadCentroids(spark, s"$dir/pq")
    assert(cents2.map(_._1) == cents.map(_._1))

    val idx = Pq.readIndex(spark, s"$dir/pq")
    assert(idx.columns.sorted.toSeq == Seq("centroid_id", "pq_code", "vec_id"))
    assert(idx.count() == corpus.count())

    // the storage claim: code cells a fraction of full-vector cells
    def cellBytes(root: String): Long = {
      val base = new java.io.File(root)
      def walk(f: java.io.File): Long =
        if (f.isFile && f.getName.endsWith(".parquet")) f.length()
        else if (f.isDirectory && !f.getName.startsWith("_"))
          f.listFiles().map(walk).sum
        else 0L
      base.listFiles().filter(_.getName.startsWith("centroid_id=")).map(walk).sum
    }
    val (pqB, fullB) = (cellBytes(s"$dir/pq"), cellBytes(s"$dir/full"))
    assert(pqB * 3 < fullB,
      s"PQ cells ($pqB B) should be well under full-vector cells ($fullB B)")

    // query through the persisted artifacts only
    val query = emb.filter(col("vec_id") === 8)
      .select("embedding").collect().head.getAs[Seq[Float]](0).toArray
    val got = Pq.ivfPqSearchTopK(idx, corpus, "vec_id", "embedding",
        cents2, cb2, query, k = 5, rerankK = corpus.count().toInt,
        nprobe = cents2.size)
      .collect().map(_.getLong(0)).toSeq
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        query, k = 5).collect().map(_.getLong(0)).toSeq
    assert(got === exact)
  }

  test("batch serving equals per-query single searches; append self-configures") {
    val corpus = emb.filter(col("vec_id") > 9)
    val cents = Similarity.collectCentroids(
      emb.filter(col("vec_id") < 8), "vec_id", "embedding")
    val cb = Pq.train(corpus, "vec_id", "embedding", subspaces = 16,
      codes = 256, iters = 2)
    val encoded = Pq.encode(
      Similarity.ivfAssign(corpus, "vec_id", "embedding", cents),
      "embedding", cb)
    val queries = emb.filter(col("vec_id") === 8 || col("vec_id") === 9)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val batch = Pq.ivfPqJoinTopK(encoded, corpus, "vec_id", "embedding",
        queries, "qid", "qvec", cents, cb, k = 5, rerankK = 64, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val single = Seq(8L, 9L).flatMap { qid =>
      val qv = emb.filter(col("vec_id") === qid).select("embedding")
        .collect().head.getAs[Seq[Float]](0).toArray
      Pq.ivfPqSearchTopK(encoded, corpus, "vec_id", "embedding", cents, cb,
          qv, k = 5, rerankK = 64, nprobe = 3)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1)))
    }.toSet
    assert(batch === single)

    // append path: index artifacts configure the encoding; an appended
    // vector becomes findable
    val dir = java.nio.file.Files.createTempDirectory("pqapp").toString + "/idx"
    val half = corpus.filter(col("vec_id") % 2 === 0)
    Pq.writeIndex(Pq.encode(
        Similarity.ivfAssign(half, "vec_id", "embedding", cents),
        "embedding", cb), "vec_id", cents, cb, dir)
    Pq.appendToIndex(corpus.filter(col("vec_id") % 2 === 1),
      "vec_id", "embedding", dir)
    val idx = Pq.readIndex(spark, dir)
    assert(idx.count() === corpus.count())
    val query = emb.filter(col("vec_id") === 8).select("embedding")
      .collect().head.getAs[Seq[Float]](0).toArray
    val got = Pq.ivfPqSearchTopK(idx, corpus, "vec_id", "embedding",
        Similarity.ivfReadCentroids(spark, dir), Pq.readCodebooks(spark, dir),
        query, k = 5, rerankK = corpus.count().toInt, nprobe = cents.size)
      .collect().map(_.getLong(0)).toSeq
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        query, k = 5).collect().map(_.getLong(0)).toSeq
    assert(got === exact)

    // compaction: appends accrete files per cell; compaction bounds them,
    // carries both artifacts, and probes agree pre/post
    val tgt = java.nio.file.Files.createTempDirectory("pqcpt").toString + "/idx"
    Pq.compactIndex(spark, dir, tgt)
    val cb2 = Pq.readCodebooks(spark, tgt)
    assert(cb2.books.flatten.map(_.toSeq) ==
      Pq.readCodebooks(spark, dir).books.flatten.map(_.toSeq))
    val gotC = Pq.ivfPqSearchTopK(Pq.readIndex(spark, tgt), corpus,
        "vec_id", "embedding",
        Similarity.ivfReadCentroids(spark, tgt), cb2,
        query, k = 5, rerankK = corpus.count().toInt, nprobe = cents.size)
      .collect().map(_.getLong(0)).toSeq
    assert(gotC === exact)
    def cellFiles(root: String): Int = {
      val base = new java.io.File(root)
      base.listFiles().filter(_.getName.startsWith("centroid_id="))
        .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    }
    assert(cellFiles(tgt) <= cents.size,
      "compaction must bound files to filesPerCell per cell")
    val e = intercept[IllegalArgumentException](
      Pq.compactIndex(spark, dir, s"$dir/nested"))
    assert(e.getMessage.contains("disjoint"))
  }

  test("recall evaluator: full probe+rerank scores 1.0; recall rises with rerankK") {
    val corpus = emb.filter(col("vec_id") > 9)
    val cents = Similarity.collectCentroids(
      emb.filter(col("vec_id") < 8), "vec_id", "embedding")
    val cb = Pq.train(corpus, "vec_id", "embedding", subspaces = 8, codes = 16,
      iters = 2, trainN = 200)
    val encoded = Pq.encode(
      Similarity.ivfAssign(corpus, "vec_id", "embedding", cents),
      "embedding", cb).localCheckpoint()
    val queries = emb.filter(col("vec_id") === 8 || col("vec_id") === 9)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray).toSeq
    val n = corpus.count().toInt
    val full = Pq.ivfPqRecallAt(encoded, corpus, "vec_id", "embedding",
      cents, cb, queries, k = 10, rerankK = n, nprobe = cents.size)
    assert(full === 1.0, "probing every cell with full rerank must be exact")
    val lo = Pq.ivfPqRecallAt(encoded, corpus, "vec_id", "embedding",
      cents, cb, queries, k = 10, rerankK = 16, nprobe = 2)
    val hi = Pq.ivfPqRecallAt(encoded, corpus, "vec_id", "embedding",
      cents, cb, queries, k = 10, rerankK = 128, nprobe = 2)
    assert(lo <= hi, s"recall must not fall as rerankK grows: $lo vs $hi")
  }

  test("batched recall evaluator agrees exactly with the per-query loop, raw and residual") {
    val corpus = emb.filter(col("vec_id") > 9)
    val cents = centsOf(8)
    val queries = emb.filter(col("vec_id") === 8 || col("vec_id") === 9)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray).toSeq
    for (residual <- Seq(false, true)) {
      val cb = if (residual)
        Pq.trainResidual(corpus, "vec_id", "embedding", cents,
          subspaces = 8, codes = 16, iters = 1, trainN = 150)
      else Pq.train(corpus, "vec_id", "embedding", subspaces = 8,
        codes = 16, iters = 1, trainN = 150)
      val assigned = Similarity.ivfAssign(corpus, "vec_id", "embedding", cents)
      val encoded = (if (residual)
          Pq.encodeResidual(assigned, "embedding", cb, cents)
        else Pq.encode(assigned, "embedding", cb)).localCheckpoint()
      for ((rk, np) <- Seq((16, 2), (64, 3))) {
        val single = Pq.ivfPqRecallAt(encoded, corpus, "vec_id", "embedding",
          cents, cb, queries, k = 10, rerankK = rk, nprobe = np)
        val batch = Pq.ivfPqRecallAtBatch(encoded, corpus, "vec_id",
          "embedding", cents, cb, queries, k = 10, rerankK = rk, nprobe = np)
        assert(batch === single,
          s"residual=$residual rerankK=$rk nprobe=$np: batch $batch != single $single")
      }
    }
  }

  test("train fails loud on ragged or null-element vectors (no silent codebook poison)") {
    val ragged = Seq((1L, Array(1f, 0f, 0f, 0f)), (2L, Array(1f, 0f)))
      .toDF("id", "vec")
    val e = intercept[Exception](
      Pq.train(ragged, "id", "vec", subspaces = 2, codes = 2, iters = 0))
    assert(e.getMessage.contains("vector size != dim") ||
      Option(e.getCause).exists(_.getMessage.contains("vector size != dim")),
      e.getMessage)
    val nullElem = Seq((1L, Array[java.lang.Float](1f, null, 0f, 0f)))
      .toDF("id", "vec").selectExpr("id", "cast(vec as array<float>) as vec")
    val e2 = intercept[Exception](
      Pq.train(nullElem, "id", "vec", subspaces = 2, codes = 2, iters = 0))
    assert(e2.getMessage.contains("null element") ||
      Option(e2.getCause).exists(_.getMessage.contains("null element")),
      e2.getMessage)
  }

  // ----------------------------------------------------------------------
  // IVFADC residual lifecycle
  // ----------------------------------------------------------------------

  private def centsOf(maxId: Int): Seq[(Int, Array[Float])] =
    Similarity.collectCentroids(
      emb.filter(col("vec_id") < maxId), "vec_id", "embedding")

  test("residual encode: every code matches a driver brute force over quantized residuals") {
    val cents = centsOf(8)
    val cb = Pq.trainResidual(emb, "vec_id", "embedding", cents,
      subspaces = 8, codes = 16, iters = 2, trainN = 200)
    val got = Pq.encodeResidual(
        Similarity.ivfAssign(emb.limit(50), "vec_id", "embedding", cents),
        "embedding", cb, cents)
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
        col("pq_code")).collect()
      .map(r => (r.getLong(0), r.getAs[Seq[Float]](1).toArray,
        r.getInt(2), r.getSeq[Int](3).toArray))
    assert(got.nonEmpty)
    val cmap = cents.toMap
    got.foreach { case (id, vec, cell, code) =>
      assert(code.length == 8, s"id $id: ${code.length} codes")
      val xq = Pq.quantizeUnitDriver(vec, cb.scale)
      val cq = Pq.quantizeUnitDriver(cmap(cell), cb.scale)
      val rq = xq.indices.map(i => xq(i) - cq(i)).toArray
      code.zipWithIndex.foreach { case (c, s) =>
        assert(c >= 0 && c < 16, s"id $id sub $s code $c out of range")
        val dists = cb.books(s).map { cw =>
          (0 until cb.subDim).map { i =>
            val d = rq(s * cb.subDim + i) - cw(i); d * d
          }.sum
        }
        val want = dists.zipWithIndex.minBy { case (d, i) => (d, i) }._2
        assert(c == want, s"id $id sub $s: got $c want $want (cell $cell)")
      }
    }
  }

  test("residual: rerank contract holds; batch path agrees with single-query path including the per-cell offset") {
    val corpus = emb.filter(col("vec_id") > 9)
    val cents = centsOf(8)
    val cb = Pq.trainResidual(corpus, "vec_id", "embedding", cents,
      subspaces = 16, codes = 256, iters = 2)
    assert(cb.encoding == Pq.EncResidual)
    val encoded = Pq.encodeResidual(
      Similarity.ivfAssign(corpus, "vec_id", "embedding", cents),
      "embedding", cb, cents).localCheckpoint()
    val n = corpus.count().toInt
    // full probe + full rerank must be exact (encoding-independent)
    val query = emb.filter(col("vec_id") === 8).select("embedding")
      .collect().head.getAs[Seq[Float]](0).toArray
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      query, k = 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = Pq.ivfPqSearchTopK(encoded, corpus, "vec_id", "embedding",
        cents, cb, query, k = 10, rerankK = n, nprobe = cents.size)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === exact, "residual IVF-PQ full probe + full rerank must be exact")
    // batch ≡ single at a small rerankK across MULTIPLE probed cells —
    // this is where a wrong/missing per-cell coarse offset diverges the
    // two paths (their shortlists are assembled differently)
    val queries = emb.filter(col("vec_id") === 8 || col("vec_id") === 9)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val batch = Pq.ivfPqJoinTopK(encoded, corpus, "vec_id", "embedding",
        queries, "qid", "qvec", cents, cb, k = 5, rerankK = 32, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val single = Seq(8L, 9L).flatMap { qid =>
      val qv = emb.filter(col("vec_id") === qid).select("embedding")
        .collect().head.getAs[Seq[Float]](0).toArray
      Pq.ivfPqSearchTopK(encoded, corpus, "vec_id", "embedding", cents, cb,
          qv, k = 5, rerankK = 32, nprobe = 3)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1)))
    }.toSet
    assert(batch === single,
      "residual batch serving must equal per-query single searches")
  }

  test("residual: enc tag survives writeIndex -> append -> compact; probes agree at every stage") {
    val corpus = emb.filter(col("vec_id") > 9)
    val cents = centsOf(8)
    val cb = Pq.trainResidual(corpus, "vec_id", "embedding", cents,
      subspaces = 8, codes = 16, iters = 2, trainN = 200)
    val dir = tempDir("pqres") + "/idx"
    Pq.writeIndex(Pq.encodeResidual(
        Similarity.ivfAssign(corpus.filter(col("vec_id") % 2 === 0),
          "vec_id", "embedding", cents), "embedding", cb, cents),
      "vec_id", cents, cb, dir)
    assert(Pq.readCodebooks(spark, dir).encoding == Pq.EncResidual,
      "writeIndex must persist the residual tag")
    // append self-resolves the encoding from the artifact
    Pq.appendToIndex(corpus.filter(col("vec_id") % 2 === 1),
      "vec_id", "embedding", dir)
    val query = emb.filter(col("vec_id") === 8).select("embedding")
      .collect().head.getAs[Seq[Float]](0).toArray
    val n = corpus.count().toInt
    def probe(path: String): Seq[Long] =
      Pq.ivfPqSearchTopK(Pq.readIndex(spark, path), corpus, "vec_id",
          "embedding", Similarity.ivfReadCentroids(spark, path),
          Pq.readCodebooks(spark, path), query, k = 5, rerankK = n,
          nprobe = cents.size)
        .collect().map(_.getLong(0)).toSeq
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      query, k = 5).collect().map(_.getLong(0)).toSeq
    assert(probe(dir) === exact)
    val tgt = tempDir("pqresc") + "/idx"
    Pq.compactIndex(spark, dir, tgt)
    val cb2 = Pq.readCodebooks(spark, tgt)
    assert(cb2.encoding == Pq.EncResidual,
      "compactIndex must carry the residual tag, not default it to raw")
    assert(cb2.books.flatten.map(_.toSeq) == cb.books.flatten.map(_.toSeq))
    assert(probe(tgt) === exact)
  }

  test("residual: mixed-encoding guards refuse the wrong encode path and flat search") {
    val corpus = emb.filter(col("vec_id") > 9)
    val cents = centsOf(8)
    val resCb = Pq.trainResidual(corpus, "vec_id", "embedding", cents,
      subspaces = 8, codes = 16, iters = 0, trainN = 100)
    val rawCb = Pq.train(corpus, "vec_id", "embedding",
      subspaces = 8, codes = 16, iters = 0, trainN = 100)
    val assigned = Similarity.ivfAssign(corpus, "vec_id", "embedding", cents)
    val e1 = intercept[IllegalArgumentException](
      Pq.encode(corpus, "embedding", resCb))
    assert(e1.getMessage.contains("encodeResidual"))
    val e2 = intercept[IllegalArgumentException](
      Pq.encodeResidual(assigned, "embedding", rawCb, cents))
    assert(e2.getMessage.contains("raw-encoded"))
    val e3 = intercept[IllegalArgumentException](
      Pq.encodeResidual(corpus, "embedding", resCb, cents))
    assert(e3.getMessage.contains("centroid_id"))
    // residual codes only rank within their cells — flat search refuses
    val enc = Pq.encodeResidual(assigned, "embedding", resCb, cents)
    val qv = emb.filter(col("vec_id") === 8).select("embedding")
      .collect().head.getAs[Seq[Float]](0).toArray
    val e4 = intercept[IllegalArgumentException](
      Pq.pqSearchTopK(enc, corpus, "vec_id", "embedding", resCb, qv,
        k = 5, rerankK = 10))
    assert(e4.getMessage.contains("ivfPqSearchTopK"))
  }

  test("residual: unknown cell and ragged vector yield NULL codes, and every persist path fails loud on them") {
    val corpus = emb.filter(col("vec_id") > 9)
    val cents = centsOf(8)
    val cb = Pq.trainResidual(corpus, "vec_id", "embedding", cents,
      subspaces = 8, codes = 16, iters = 0, trainN = 100)
    // kernel level: a coarse cell the codebooks never saw -> NULL code
    val goodVec = emb.filter(col("vec_id") === 10).select("embedding")
      .collect().head.getSeq[Float](0)
    val forged = Seq((999L, goodVec, 99))
      .toDF("vec_id", "embedding", "centroid_id")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding",
        "centroid_id")
    val enc = Pq.encodeResidual(forged, "embedding", cb, cents)
    assert(enc.select("pq_code").collect().head.isNullAt(0),
      "unknown cell must yield a NULL code")
    // ragged vector -> NULL code too
    val ragged = Seq((998L, Seq(1f, 0f), 0))
      .toDF("vec_id", "embedding", "centroid_id")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding",
        "centroid_id")
    assert(Pq.encodeResidual(ragged, "embedding", cb, cents)
      .select("pq_code").collect().head.isNullAt(0),
      "ragged vector must yield a NULL code")
    // persist paths: a NULL code must fail the job, not vanish from the
    // index (it would silently drop out of every future shortlist)
    val dir = tempDir("pqnull") + "/idx"
    val e = intercept[Exception](Pq.writeIndex(enc, "vec_id", cents, cb, dir))
    def msgChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(msgChain(e).contains("NULL pq_code"), msgChain(e))
    // a valid base build, then an append of a ragged vector fails loud
    Pq.writeIndex(Pq.encodeResidual(
        Similarity.ivfAssign(corpus, "vec_id", "embedding", cents),
        "embedding", cb, cents), "vec_id", cents, cb, dir)
    val raggedRaw = Seq((997L, Seq(1f, 0f))).toDF("vec_id", "embedding")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding")
    val e2 = intercept[Exception](
      Pq.appendToIndex(raggedRaw, "vec_id", "embedding", dir))
    assert(msgChain(e2).contains("NULL pq_code"), msgChain(e2))
  }

  test("readCodebooks refuses a torn _pq_codebooks (mixed enc or scale rows)") {
    val corpus = emb.filter(col("vec_id") > 9)
    val cents = centsOf(8)
    val cb = Pq.train(corpus, "vec_id", "embedding", subspaces = 4,
      codes = 8, iters = 0, trainN = 100)
    val dir = tempDir("pqtorn") + "/idx"
    Pq.writeIndex(Pq.encode(
        Similarity.ivfAssign(corpus, "vec_id", "embedding", cents),
        "embedding", cb), "vec_id", cents, cb, dir)
    // simulate a torn write: one extra codebook row with a different tag
    Seq((0, 999, Seq(0L), cb.scale, Pq.EncResidual))
      .toDF("sub", "code", "cw", "scale", "enc")
      .write.mode("append").parquet(s"$dir/_pq_codebooks")
    val e = intercept[IllegalArgumentException](Pq.readCodebooks(spark, dir))
    assert(e.getMessage.contains("mixes"))
  }

  // ----------------------------------------------------------------------
  // Streaming ingest + replayed-append shortlist regression
  // ----------------------------------------------------------------------

  test("streaming ingest: MemoryStream batches land as idempotent subtrees; probe equals the full build; compaction folds them in") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = emb.filter(col("vec_id") > 9).localCheckpoint()
    val cents = centsOf(8)
    val cb = Pq.train(corpus, "vec_id", "embedding", subspaces = 8,
      codes = 16, iters = 2, trainN = 200)
    val dir = tempDir("pqstream") + "/idx"
    val base = corpus.filter(col("vec_id") % 3 === 0)
    Pq.writeIndex(Pq.encode(
        Similarity.ivfAssign(base, "vec_id", "embedding", cents),
        "embedding", cb), "vec_id", cents, cb, dir)
    val rest = corpus.filter(col("vec_id") % 3 =!= 0)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val (b0, b1) = rest.partition(_._1 % 3 == 1)
    val in = MemoryStream[(Long, Array[Float])]
    val q = Pq.streamingPqIngest(in.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir, tempDir("pqstream_ckpt"))
    try {
      in.addData(b0.toIndexedSeq)
      q.processAllAvailable()
      in.addData(b1.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val idx = Pq.readIndex(spark, dir)
    assert(idx.count() == corpus.count(),
      "base + streamed batches must cover the corpus exactly once")
    val query = emb.filter(col("vec_id") === 8).select("embedding")
      .collect().head.getAs[Seq[Float]](0).toArray
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      query, k = 5).collect().map(_.getLong(0)).toSeq
    val n = corpus.count().toInt
    val got = Pq.ivfPqSearchTopK(idx, corpus, "vec_id", "embedding",
        cents, Pq.readCodebooks(spark, dir), query, k = 5, rerankK = n,
        nprobe = cents.size)
      .collect().map(_.getLong(0)).toSeq
    assert(got === exact, "streamed index probe must equal the full build")
    // a REPLAY of batch 0 (same queryTag + batchId — what a crash-restart
    // does) overwrites its own subtree: same row count, same probe
    val tag = IndexLifecycle.queryTagOf(spark,
      // the checkpoint dir used above is gone from scope; replay under a
      // fresh tag pair instead: write batch 0 twice under one tag
      tempDir("pqstream_ckpt2"))
    Pq.ingestPqBatch(base.sparkSession.createDataFrame(b0.toIndexedSeq)
      .toDF("vec_id", "embedding"), "vec_id", "embedding", dir, tag, 7L)
    val afterFirst = Pq.readIndex(spark, dir).count()
    Pq.ingestPqBatch(base.sparkSession.createDataFrame(b0.toIndexedSeq)
      .toDF("vec_id", "embedding"), "vec_id", "embedding", dir, tag, 7L)
    assert(Pq.readIndex(spark, dir).count() == afterFirst,
      "a replayed batch must overwrite its own subtree, not append")
    // compaction folds base + every subtree into one layout; probe agrees
    val tgt = tempDir("pqstreamc") + "/idx"
    Pq.compactIndex(spark, dir, tgt)
    assert(spark.read.parquet(tgt).count() == afterFirst,
      "compaction must fold the ingest subtrees into the base layout")
    assert(IndexLifecycle.listIngestDirs(spark, tgt).isEmpty)
    val gotC = Pq.ivfPqSearchTopK(Pq.readIndex(spark, tgt), corpus,
        "vec_id", "embedding", Similarity.ivfReadCentroids(spark, tgt),
        Pq.readCodebooks(spark, tgt), query, k = 5, rerankK = n,
        nprobe = cents.size)
      .collect().map(_.getLong(0)).toSeq
    assert(gotC === exact)
  }

  test("streaming ingest self-resolves RESIDUAL encoding from the index's codebooks") {
    val corpus = emb.filter(col("vec_id") > 9)
    val cents = centsOf(8)
    val cb = Pq.trainResidual(corpus, "vec_id", "embedding", cents,
      subspaces = 8, codes = 16, iters = 1, trainN = 150)
    val dir = tempDir("pqstreamres") + "/idx"
    Pq.writeIndex(Pq.encodeResidual(
        Similarity.ivfAssign(corpus.filter(col("vec_id") % 2 === 0),
          "vec_id", "embedding", cents), "embedding", cb, cents),
      "vec_id", cents, cb, dir)
    // the ingest batch passes RAW vectors; encoding must come from the
    // persisted residual codebooks, not a caller parameter
    Pq.ingestPqBatch(corpus.filter(col("vec_id") % 2 === 1)
      .select("vec_id", "embedding"), "vec_id", "embedding", dir, "qres", 0L)
    val query = emb.filter(col("vec_id") === 8).select("embedding")
      .collect().head.getAs[Seq[Float]](0).toArray
    val n = corpus.count().toInt
    val got = Pq.ivfPqSearchTopK(Pq.readIndex(spark, dir), corpus,
        "vec_id", "embedding", Similarity.ivfReadCentroids(spark, dir),
        Pq.readCodebooks(spark, dir), query, k = 5, rerankK = n,
        nprobe = cents.size)
      .collect().map(_.getLong(0)).toSeq
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      query, k = 5).collect().map(_.getLong(0)).toSeq
    assert(got === exact,
      "a residual index's streamed batch must be findable exactly")
  }

  test("readIndex union keeps partition pruning: every scan leg carries the probed-cell partition filter") {
    val corpus = emb.filter(col("vec_id") > 9)
    val cents = centsOf(8)
    val cb = Pq.train(corpus, "vec_id", "embedding", subspaces = 4,
      codes = 8, iters = 0, trainN = 100)
    val dir = tempDir("pqprune") + "/idx"
    Pq.writeIndex(Pq.encode(
        Similarity.ivfAssign(corpus.filter(col("vec_id") % 2 === 0),
          "vec_id", "embedding", cents), "embedding", cb),
      "vec_id", cents, cb, dir)
    Pq.ingestPqBatch(corpus.filter(col("vec_id") % 2 === 1)
      .select("vec_id", "embedding"), "vec_id", "embedding", dir, "qp", 0L)
    // the probe's candidate scan: base + one ingest subtree, cell filter
    val probe = Pq.readIndex(spark, dir)
      .filter(col("centroid_id").isin(0, 1))
    val p = probe.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pfs = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(pfs.size >= 2,
      s"expected >= 2 parquet scan legs (base + ingest subtree), plan:\n$p")
    pfs.foreach(f => assert(f.contains("centroid_id"),
      s"a union leg lost the centroid_id partition filter: [$f]\n$p"))
  }

  test("regression: duplicate code rows (simulated replayed append) keep rerankK counting DISTINCT docs — output equals the clean index") {
    // the r14 fix (shortlist groupBy BEFORE the limit/rank): with
    // duplicates and a pre-fix shortlist, rerankK slots fill with copies
    // and the DISTINCT shortlist shrinks below rerankK, breaking the
    // "rerankK >= distinct candidates => exact probed-cell top-k" rule
    val corpus = emb.filter(col("vec_id") > 9)
    val cents = centsOf(8)
    val cb = Pq.train(corpus, "vec_id", "embedding", subspaces = 8,
      codes = 16, iters = 2, trainN = 200)
    val encoded = Pq.encode(
      Similarity.ivfAssign(corpus, "vec_id", "embedding", cents),
      "embedding", cb).localCheckpoint()
    val doubled = encoded.unionAll(encoded) // every code row twice
    val n = corpus.count().toInt
    val query = emb.filter(col("vec_id") === 8).select("embedding")
      .collect().head.getAs[Seq[Float]](0).toArray
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      query, k = 10).collect().map(_.getLong(0)).toSeq
    val got = Pq.ivfPqSearchTopK(doubled, corpus, "vec_id", "embedding",
        cents, cb, query, k = 10, rerankK = n, nprobe = cents.size)
      .collect().map(_.getLong(0)).toSeq
    assert(got === exact,
      "rerankK = corpus size on a doubled index must still be exact " +
        "(duplicates must not consume shortlist slots)")
    // batch path: doubled index ≡ clean index row-for-row
    val queries = emb.filter(col("vec_id") === 8 || col("vec_id") === 9)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def batchOn(e: org.apache.spark.sql.DataFrame) =
      Pq.ivfPqJoinTopK(e, corpus, "vec_id", "embedding", queries, "qid",
          "qvec", cents, cb, k = 5, rerankK = 16, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batchOn(doubled) === batchOn(encoded),
      "batch serving on a replayed (doubled) index must equal the clean index")
  }

  test("guards fail loud: indivisible dim, rerankK < k, overflowing scale") {
    val df = Seq((1L, Array(1f, 0f, 0f))).toDF("id", "vec")
    val e1 = intercept[IllegalArgumentException](
      Pq.train(df, "id", "vec", subspaces = 2, codes = 4))
    assert(e1.getMessage.contains("not divisible"))
    val e2 = intercept[IllegalArgumentException](
      Pq.train(df, "id", "vec", subspaces = 3, codes = 4, scale = 4000000000L))
    assert(e2.getMessage.contains("overflows"))
    val cb = Pq.Codebooks(1, 3, 1000L, IndexedSeq(IndexedSeq(Array(0L, 0L, 0L))))
    val e3 = intercept[IllegalArgumentException](
      Pq.pqSearchTopK(df, df, "id", "vec", cb, Array(1f, 0f, 0f),
        k = 5, rerankK = 3))
    assert(e3.getMessage.contains("rerankK"))
  }
}
