package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SemDeDup (Abbas et al. arXiv:2303.09540) — cluster-scoped semantic dedup:
  * the dominated-by-earlier keep policy, cell isolation, and the LSH-blocked
  * candidate mode's subset relationship to the exact within-cell pair set.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val r2 = (math.sqrt(0.5)).toFloat

  test("dominated-by-earlier: a chain removes every dominated row, keeps the head") {
    // one cell; cos(a,b) = cos(b,c) = 0.707 > tau, cos(a,c) = 0 < tau.
    // EXISTS semantics: c is dominated by b even though b is itself removed.
    val df = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(r2, r2, 0f)),
      (3L, Array(0f, 1f, 0f))
    ).toDF("id", "vec")
    val cents = Seq((0, Array(1f, 1f, 1f)))
    val flagged = Similarity.semDedupFlag(df, "id", "vec", cents, tau = 0.5)
      .select("id", "is_semdup").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flagged === Map(1L -> false, 2L -> true, 3L -> true))
    val survivors = Similarity.semDedup(df, "id", "vec", cents, tau = 0.5)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(survivors === Seq(1L))
  }

  test("cluster scoping: similar rows in different cells are never compared") {
    // v1 lands on c1, v2 on c2; cos(v1, v2) = 0.8 > tau, but SemDeDup only
    // pairs within a cell — the paper's documented recall trade at cell
    // boundaries. Both survive.
    val df = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(0.8f, 0.6f, 0f))
    ).toDF("id", "vec")
    val cents = Seq((0, Array(1f, 0f, 0f)), (1, Array(0.8f, 0.6f, 0f)))
    val out = Similarity.semDedupFlag(df, "id", "vec", cents, tau = 0.7)
      .select("id", "centroid_id", "is_semdup").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    assert(out === Set((1L, 0, false), (2L, 1, false)))
  }

  test("LSH-blocked mode flags a subset of the exact mode on real embeddings") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity.collectCentroids(
      emb.filter(col("vec_id") < 8), "vec_id", "embedding")
    val corpus = emb.filter(col("vec_id") >= 8)
    def removedIds(bands: Int): Set[Long] =
      Similarity.semDedupFlag(corpus, "vec_id", "embedding", cents,
          tau = 0.35, bands = bands)
        .filter(col("is_semdup")).select("vec_id")
        .collect().map(_.getLong(0)).toSet
    val exact = removedIds(bands = 0)
    val lsh = removedIds(bands = 4)
    assert(exact.nonEmpty, "the policy must actually fire on test data")
    assert(lsh.nonEmpty && lsh.subsetOf(exact),
      s"LSH candidates must verify into the exact removal set (${lsh.size}/${exact.size})")
    // survivors + removed partition the corpus
    val n = corpus.count()
    val kept = Similarity.semDedup(corpus, "vec_id", "embedding", cents, 0.35).count()
    assert(kept + exact.size === n)
  }

  test("collapseExact is row-for-row identical to the naive path on a twinned corpus") {
    // 5× duplicated corpus: every vector appears as a 5-twin clique with
    // distinct ids. The collapsed path pairs only the 492 distinct reps,
    // the naive path pays the full twin quadratic — flags must agree on
    // EVERY row (rep survival + twin domination + cell assignment).
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity.collectCentroids(
      emb.filter(col("vec_id") < 8), "vec_id", "embedding")
    val base = emb.filter(col("vec_id") >= 8)
    val twinned = (0 until 5).map { r =>
      base.select((col("vec_id") * 5 + r).as("vec_id"), col("embedding"))
    }.reduce(_ union _)
    def flags(collapse: Boolean): Map[Long, (Int, Boolean)] =
      Similarity.semDedupFlag(twinned, "vec_id", "embedding", cents,
          tau = 0.35, collapseExact = collapse)
        .select("vec_id", "centroid_id", "is_semdup").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    val collapsed = flags(true)
    val naive = flags(false)
    assert(collapsed.size === 492 * 5)
    assert(collapsed === naive)
    // every non-min twin is dominated by its group min (cos = 1 > tau)
    assert(collapsed.count { case (id, (_, dup)) => id % 5 != 0 && !dup } === 0)
  }

  test("semDedupBy keeps each semantic component's best-keepBy member, not its min id") {
    // one cell; edges a-b and b-c (cos 0.707 > tau), so {1,2,3} is ONE
    // component. keepBy = L2 norm: c (norm 2) survives — where semDedup's
    // earliest-id policy keeps a instead.
    val df = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(r2, r2, 0f)),
      (3L, Array(0f, 2f, 0f)),
      (4L, Array(-1f, -1f, -1f)) // lone far-away singleton: survives as-is
    ).toDF("id", "vec")
    val cents = Seq((0, Array(1f, 1f, 0f)), (1, Array(-1f, -1f, -1f)))
    val best = Similarity.semDedupBy(df, "id", "vec", cents, tau = 0.5,
        keepBy = Similarity.norm(col("vec")))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(best === Array(3L, 4L))
    val earliest = Similarity.semDedup(df, "id", "vec", cents, tau = 0.5)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(earliest === Array(1L, 4L))
  }

  test("null vectors survive both modes identically (never semantic dups, cell -1)") {
    val df = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, null.asInstanceOf[Array[Float]]),
      (3L, null.asInstanceOf[Array[Float]])
    ).toDF("id", "vec")
    val cents = Seq((0, Array(1f, 0f, 0f)))
    def flags(collapse: Boolean): Map[Long, (Int, Boolean)] =
      Similarity.semDedupFlag(df, "id", "vec", cents, tau = 0.5,
          collapseExact = collapse)
        .select("id", "centroid_id", "is_semdup").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    val c = flags(true)
    assert(c === flags(false))
    assert(c === Map(1L -> (0, false), 2L -> (-1, false), 3L -> (-1, false)))
  }

  test("null-ELEMENT vectors are singletons in both modes and both forms") {
    // two rows with IDENTICAL null-bearing arrays: array grouping treats
    // null elements as equal, so the collapse would otherwise glue them
    // into one group and drop a row the naive path keeps (the dot — and so
    // every cosine — is null; they can never pair)
    // build the null-element rows through SQL to get true nulls in the array
    val withNulls = spark.sql(
      "SELECT * FROM VALUES " +
        "(1L, array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))), " +
        "(2L, array(CAST(NULL AS FLOAT), CAST(1.0 AS FLOAT))), " +
        "(3L, array(CAST(NULL AS FLOAT), CAST(1.0 AS FLOAT))) " +
        "AS t(id, vec)")
    val cents = Seq((0, Array(1f, 0f)))
    def run(collapse: Boolean, by: Boolean): Set[Long] =
      (if (by)
        Similarity.semDedupBy(withNulls, "id", "vec", cents, tau = 0.5,
          keepBy = col("id"), collapseExact = collapse)
      else
        Similarity.semDedup(withNulls, "id", "vec", cents, tau = 0.5,
          collapseExact = collapse))
        .select("id").collect().map(_.getLong(0)).toSet
    for (by <- Seq(false, true); collapse <- Seq(true, false))
      assert(run(collapse, by) === Set(1L, 2L, 3L),
        s"by=$by collapse=$collapse must keep all three rows")
  }

  test("NaN-element vectors are singletons in both modes and both forms") {
    // two IDENTICAL NaN-bearing arrays: array grouping treats NaN elements
    // as equal, so the collapse would glue them into one group and the
    // twin rule would flag the second — but every cosine involving NaN is
    // NaN, which exceedsTau rejects, so the naive path keeps both
    val df = Seq(
      (1L, Array(1f, 0f)),
      (2L, Array(Float.NaN, 1f)),
      (3L, Array(Float.NaN, 1f))
    ).toDF("id", "vec")
    val cents = Seq((0, Array(1f, 0f)))
    def run(collapse: Boolean, by: Boolean): Set[Long] =
      (if (by)
        Similarity.semDedupBy(df, "id", "vec", cents, tau = 0.5,
          keepBy = col("id"), collapseExact = collapse)
      else
        Similarity.semDedup(df, "id", "vec", cents, tau = 0.5,
          collapseExact = collapse))
        .select("id").collect().map(_.getLong(0)).toSet
    for (by <- Seq(false, true); collapse <- Seq(true, false))
      assert(run(collapse, by) === Set(1L, 2L, 3L),
        s"by=$by collapse=$collapse must keep all three rows")
  }

  test("zero-norm vectors are singletons in both modes and both forms") {
    // two IDENTICAL all-zero rows: cosine = 0/0 = NaN, and Spark's
    // NaN-is-largest comparison would call NaN > tau TRUE — the exceedsTau
    // guard plus unpairableVec's zero-norm clause must keep them
    // unpairable (Java/driver-side semantics: NaN > tau is false), in the
    // naive path AND under the collapse's twin-domination rule
    val df = Seq(
      (1L, Array(1f, 0f)),
      (2L, Array(0f, 0f)),
      (3L, Array(0f, 0f))
    ).toDF("id", "vec")
    val cents = Seq((0, Array(1f, 0f)))
    def run(collapse: Boolean, by: Boolean): Set[Long] =
      (if (by)
        Similarity.semDedupBy(df, "id", "vec", cents, tau = 0.5,
          keepBy = col("id"), collapseExact = collapse)
      else
        Similarity.semDedup(df, "id", "vec", cents, tau = 0.5,
          collapseExact = collapse))
        .select("id").collect().map(_.getLong(0)).toSet
    for (by <- Seq(false, true); collapse <- Seq(true, false))
      assert(run(collapse, by) === Set(1L, 2L, 3L),
        s"by=$by collapse=$collapse must keep all three rows")
    // and the pair scan itself emits nothing for zero vectors
    val pairs = Similarity.nearDupPairs(df, "id", "vec", minCosine = 0.5,
      bands = 2, bitsPerBand = 2, dim = 2)
    assert(pairs.collect().isEmpty,
      "zero vectors hash to one LSH bucket but must not verify as pairs")
  }

  test("semantic index: probe prunes to batch cells, append catches batch-2 dups") {
    val idx = tempDir("graft_semidx_spec") + "/idx"
    // two far-apart cells; corpus has one member in each
    val cents = Seq((0, Array(1f, 0f, 0f)), (1, Array(0f, 0f, 1f)))
    val corpus = Seq(
      (1L, Array(0.9f, 0.1f, 0f)),
      (2L, Array(0f, 0.1f, 0.9f))
    ).toDF("id", "vec")
    Similarity.writeSemIndex(corpus, "id", "vec", cents, idx)
    // batch: a near-dup of id 1, and a cell-0 vector far from both
    val batch = Seq(
      (10L, Array(0.9f, 0.1f, 0f)),   // identical to 1 -> dominated
      (11L, Array(1f, -0.9f, 0f))     // same cell, cos < tau -> clean
    ).toDF("id", "vec")
    val matches = Similarity.semDedupAgainstIndex(batch, "id", "vec", idx, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(matches === Set((10L, 1L)))
    val clean = Similarity.cleanSemAgainstIndex(batch, "id", "vec", idx, 0.8)
    assert(clean.select("id").collect().map(_.getLong(0)).toSeq === Seq(11L))
    // append the clean row; a batch-2 near-dup of it is now caught
    Similarity.appendToSemIndex(clean, "id", "vec", idx)
    val batch2 = Seq((20L, Array(1f, -0.9f, 0.01f))).toDF("id", "vec")
    val m2 = Similarity.semDedupAgainstIndex(batch2, "id", "vec", idx, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m2 === Set((20L, 11L)))
    // a replayed append (crash between sink and append: the batch lands in
    // the index anyway) must not self-flag the same id on the next probe
    Similarity.appendToSemIndex(batch2, "id", "vec", idx)
    val replayRows = Similarity.semDedupAgainstIndex(batch2, "id", "vec", idx, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(replayRows === Seq((20L, 11L)), "self-pairs excluded on replay")
    // the replayed append left id 20 in the index TWICE; a fresh batch
    // matching it must see ONE match row, not one per index copy
    val batch3 = Seq((30L, Array(1f, -0.9f, 0.01f))).toDF("id", "vec")
    val m3 = Similarity.semDedupAgainstIndex(batch3, "id", "vec", idx, 0.8)
      .select("id", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(m3 === Seq((30L, 11L), (30L, 20L)),
      s"duplicate index rows must not surface as duplicate matches: $m3")
  }

  test("semantic index probe reads ONLY the batch's cells' files") {
    val idx = tempDir("graft_semidx_prune") + "/idx"
    val cents = Seq((0, Array(1f, 0f, 0f)), (1, Array(0f, 0f, 1f)))
    val corpus = Seq(
      (1L, Array(0.9f, 0.1f, 0f)),  // cell 0
      (2L, Array(0f, 0.1f, 0.9f))   // cell 1
    ).toDF("id", "vec")
    Similarity.writeSemIndex(corpus, "id", "vec", cents, idx)
    // the batch lands entirely in cell 1 -> the index scan must not open
    // cell 0's files at all (static partition pruning on centroid_id)
    val batch = Seq((10L, Array(0f, 0.2f, 0.9f))).toDF("id", "vec")
    val probe = Similarity.semDedupAgainstIndex(batch, "id", "vec", idx, 0.8)
    assert(probe.collect().map(_.getLong(1)).toSet === Set(2L))
    // sparkPlan (pre-AQE) exposes the scan directly; AQE only re-plans
    // exchanges, never partition pruning
    val files = probe.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.flatMap(_.selectedPartitions.toPartitionArray.map(_.urlEncodedPath))
      .filter(_.contains("centroid_id="))
    assert(files.nonEmpty && files.forall(_.contains("centroid_id=1")),
      s"index scan must touch only cell 1: ${files.take(3).toSeq}")
  }

  test("compactSemIndex: appends accrete files, compaction bounds them, probes agree") {
    val base = tempDir("graft_semidx_compact")
    val idx = base + "/idx"
    val compacted = base + "/idx2"
    val cents = Seq((0, Array(1f, 0f, 0f)), (1, Array(0f, 0f, 1f)))
    Similarity.writeSemIndex(
      Seq((1L, Array(0.9f, 0.1f, 0f)), (2L, Array(0f, 0.1f, 0.9f)))
        .toDF("id", "vec"),
      "id", "vec", cents, idx)
    (0 until 4).foreach { k =>
      Similarity.appendToSemIndex(
        Seq((100L + k, Array(0.8f, 0.2f, 0f))).toDF("id", "vec"),
        "id", "vec", idx)
    }
    def cellFiles(p: String): Map[String, Int] =
      new java.io.File(p).listFiles().filter(_.getName.startsWith("centroid_id="))
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    assert(cellFiles(idx)("centroid_id=0") >= 5, s"appends must accrete: ${cellFiles(idx)}")
    Similarity.compactSemIndex(spark, idx, compacted)
    assert(cellFiles(compacted).values.forall(_ == 1),
      s"compacted cells must hold one file: ${cellFiles(compacted)}")
    val batch = Seq((50L, Array(0.85f, 0.15f, 0f))).toDF("id", "vec")
    def probe(p: String) =
      Similarity.semDedupAgainstIndex(batch, "id", "vec", p, 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe(compacted) === probe(idx) && probe(compacted).nonEmpty)
    intercept[IllegalArgumentException] {
      Similarity.compactSemIndex(spark, idx, idx)
    }
  }

  test("semantic index guards: batch cap and column mismatch fail loud") {
    val idx = tempDir("graft_semidx_guard") + "/idx"
    val cents = Seq((0, Array(1f, 0f)))
    val corpus = Seq((1L, Array(1f, 0f))).toDF("id", "vec")
    Similarity.writeSemIndex(corpus, "id", "vec", cents, idx)
    val batch = (10L to 20L).map(i => (i, Array(1f, 0f))).toDF("id", "vec")
    val e1 = intercept[IllegalArgumentException] {
      Similarity.semDedupAgainstIndex(batch, "id", "vec", idx, 0.8,
        maxBatchRows = 5)
    }
    assert(e1.getMessage.contains("maxBatchRows"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.semDedupAgainstIndex(
        batch.withColumnRenamed("vec", "emb"), "id", "emb", idx, 0.8)
    }
    assert(e2.getMessage.contains("column"))
  }

  test("streamingSemIngest: within-batch dedup -> index probe -> sink -> append") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val idx = tempDir("graft_semidx_stream") + "/idx"
    val cents = Seq((0, Array(1f, 0f, 0f)), (1, Array(0f, 0f, 1f)))
    Similarity.writeSemIndex(
      Seq((1L, Array(0.9f, 0.1f, 0f))).toDF("id", "vec"),
      "id", "vec", cents, idx)

    val in = MemoryStream[(Long, Array[Float])]
    val perBatch = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val q = Similarity.streamingSemIngest(in.toDF().toDF("id", "vec"),
      "id", "vec", idx, tempDir("graft_sem_ckpt"),
      sink = (clean, batchId) => {
        perBatch(batchId) = clean.select("id").collect().map(_.getLong(0)).toSet
        ()
      },
      tau = 0.8)
    try {
      // batch 0: an indexed near-dup (drops), a new vector, and a
      // within-batch near-dup of that new vector (earliest id survives)
      in.addData(
        (10L, Array(0.9f, 0.1f, 0f)),   // dominated by indexed 1
        (11L, Array(0f, 0.2f, 0.9f)),   // new, cell 1
        (12L, Array(0f, 0.21f, 0.9f)))  // within-batch dup of 11
      q.processAllAvailable()
      assert(perBatch(0L) === Set(11L), s"batch 0: ${perBatch.toMap}")
      // batch 1: near-dup of the vector APPENDED in batch 0 -> caught
      in.addData(
        (20L, Array(0f, 0.19f, 0.9f)),  // dup of appended 11
        (21L, Array(0f, 0f, -1f)))      // genuinely new
      q.processAllAvailable()
      assert(perBatch(1L) === Set(21L), s"batch 1: ${perBatch.toMap}")
    } finally q.stop()
  }

  test("projectJL preserves norms in expectation and distances in rank") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val proj = emb.select(col("vec_id"),
      Similarity.norm(col("embedding")).as("n_full"),
      Similarity.norm(Similarity.projectJL(col("embedding"), 32)).as("n_proj"))
    val rows = proj.collect().map(r => (r.getDouble(1), r.getDouble(2)))
    // E[||Px||^2] = ||x||^2 for the ±1/sqrt(k) sign matrix; squared-norm
    // relative error has σ ≈ sqrt(2/k) ≈ 0.25 at k = 32, so the mean
    // |error| sits near 0.2-0.3 on these (non-isotropic) embeddings — the
    // bounds below fail any broken projection (wrong scale, collapsed
    // matrix) while tolerating the lemma's own variance
    val relErr = rows.map { case (nf, np) =>
      math.abs(np * np - nf * nf) / (nf * nf) }
    assert(relErr.sum / relErr.length < 0.35,
      s"mean norm distortion too high: ${relErr.sum / relErr.length}")
    assert(relErr.max < 2.0, s"worst-case distortion blowup: ${relErr.max}")
    // deterministic: identical vectors project identically
    val twice = emb.orderBy("vec_id").limit(5)
      .select(Similarity.projectJL(col("embedding"), 8).as("p")).collect()
    val again = emb.orderBy("vec_id").limit(5)
      .select(Similarity.projectJL(col("embedding"), 8).as("p")).collect()
    assert(twice.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("bruteForceTopKProjected: full overfetch equals exact; small prefilter keeps recall") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val queryVec = emb.filter(col("vec_id") === 0)
      .select("embedding").collect().head.getAs[Seq[Float]](0).toArray
    val corpus = emb.filter(col("vec_id") =!= 0)
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        queryVec, 10)
      .collect().map(_.getLong(0)).toSet
    // candidate set >= corpus: the prefilter is a no-op, results identical
    val full = Similarity.bruteForceTopKProjected(corpus, "vec_id",
        "embedding", queryVec, k = 10, outDim = 8, overfetch = 1000)
      .collect().map(_.getLong(0)).toSet
    assert(full === exact)
    // the real prefilter (16 dims, 16x overfetch — these near-random
    // synthetic embeddings are the JL worst case; measured 10/10 here,
    // floor left loose for testdata regeneration) keeps the true top-10
    val pre = Similarity.bruteForceTopKProjected(corpus, "vec_id",
        "embedding", queryVec, k = 10, outDim = 16, overfetch = 16)
      .collect().map(_.getLong(0)).toSet
    assert(pre.intersect(exact).size >= 7,
      s"projected prefilter recall too low: ${pre.intersect(exact).size}/10")
    // the serving shape: projection MATERIALIZED once, passed as projCol —
    // identical results to the inline form (same folds, just precomputed)
    val materialized = corpus.withColumn("proj",
      Similarity.projectJL(col("embedding"), 16))
    val served = Similarity.bruteForceTopKProjected(materialized, "vec_id",
        "embedding", queryVec, k = 10, outDim = 16, overfetch = 16,
        projCol = "proj")
      .collect().map(_.getLong(0)).toSet
    assert(served === pre)
    // the width guard must raise its DESCRIPTIVE error on a mismatch even
    // when the sampled row's projection is null (size(null) = null; a raw
    // getInt would NPE), and must survive leading null projections
    val withNullFirst = materialized
      .withColumn("proj", when(col("vec_id") <= 5, col("proj")))
    val err = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopKProjected(withNullFirst, "vec_id",
        "embedding", queryVec, k = 10, outDim = 8, overfetch = 16,
        projCol = "proj")
    }
    assert(err.getMessage.contains("16-dim projections"),
      s"wrong-width error must stay descriptive under null rows: ${err.getMessage}")
  }

  test("guards: tau range and reserved column names fail loud") {
    val df = Seq((1L, Array(1f, 0f))).toDF("id", "vec")
    val cents = Seq((0, Array(1f, 0f)))
    intercept[IllegalArgumentException] {
      Similarity.semDedupFlag(df, "id", "vec", cents, tau = 1.0)
    }
    intercept[IllegalArgumentException] {
      Similarity.semDedupFlag(df.withColumn("is_semdup", lit(true)),
        "id", "vec", cents, tau = 0.5)
    }
  }
}
