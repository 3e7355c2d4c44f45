package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The `maxLiveSubtrees` in-loop auto-compaction every streaming-ingest
  * family shares ([[IndexLifecycle.compactOwnSubtrees]]): when a query's
  * published subtree count reaches the cap, its subtrees fold into ONE
  * compacted subtree with bit-identical probe results — and the fold is
  * crash/replay-repairable (publish-then-delete, target keyed by batch id).
  * One trigger test per family (text/BM25, MinHash signatures, image
  * hashes, PQ codes, line frequencies), plus the crash-repair branch and
  * the loop-level integration.
  */
class IngestCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String = tempDir(tag) + "/idx"

  /** The query's own published subtree dirs (live tag + compact tag). */
  private def ownSubtrees(idx: String, tag: String): Seq[String] =
    Seq(tag, tag + "-c").flatMap { t =>
      val d = new java.io.File(s"$idx/_ingest/$t")
      if (!d.isDirectory) Seq.empty
      else d.listFiles().toSeq
        .filter(f => f.isDirectory && !f.getName.endsWith(".tmp"))
        .map(f => s"$t/${f.getName}")
    }.sorted

  /** The rule-filtered live subtrees (what probes actually read),
    * relative, sorted — [[ownSubtrees]] is the raw DISK view including
    * superseded leftovers awaiting deferred GC.
    */
  private def liveSubtrees(idx: String): Seq[String] =
    IndexLifecycle.listIngestDirs(spark, idx)
      .map(_.split("/_ingest/").last).sorted

  /** Full index content (base ∪ published subtrees) as sorted row strings
    * — probe bit-identity for ANY probe.
    */
  private def contentOf(idx: String): Seq[String] = {
    val schema = spark.read.parquet(idx).schema
    (idx +: IndexLifecycle.listIngestDirs(spark, idx))
      .map(r => spark.read.schema(schema).parquet(r))
      .reduce(_ unionByName _)
      .collect().map(_.toString).sorted.toSeq
  }

  private def copyDir(src: String, dst: String): Unit = {
    val s = java.nio.file.Paths.get(src)
    val d = java.nio.file.Paths.get(dst)
    java.nio.file.Files.walk(s).forEach { p =>
      val t = d.resolve(s.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) {
        java.nio.file.Files.createDirectories(t); ()
      } else {
        java.nio.file.Files.createDirectories(t.getParent)
        java.nio.file.Files.copy(p, t); ()
      }
    }
  }

  // ---------------------------------------------------------------------
  // Retrieval (postings + _block_stats sidecar) — the richest family
  // ---------------------------------------------------------------------

  private def docs(lo: Long, hi: Long): DataFrame = Seq(
    (0L, "a a b x"), (1L, "a c"), (2L, "b b b c y y"),
    (3L, "z z"), (4L, "a b a b c"), (5L, ""), (6L, "a a a b"),
    (7L, "c c b")
  ).toDF("doc_id", "text").where($"doc_id" >= lo && $"doc_id" < hi)

  test("text ingest: cap folds subtrees into one; plain and WAND probes bit-identical; below-cap is a no-op") {
    val q = Seq("a", "b", "c")
    val idx = freshDir("cmp_text")
    Retrieval.writeTextIndex(docs(0, 2), "doc_id", "text", idx, nBuckets = 4)
    (0 to 2).foreach { i =>
      Retrieval.ingestTextBatch(docs(2 + 2 * i, 4 + 2 * i), "doc_id", "text",
        idx, queryTag = "qr", batchId = i.toLong)
    }
    assert(ownSubtrees(idx, "qr").size === 3)
    val plainBefore = Retrieval.bm25AgainstIndex(spark, idx, q, 10).collect()
      .map(_.toString).toSeq
    val wandBefore = Retrieval.bm25WandAgainstIndex(spark, idx, q, 10)
      .collect().map(_.toString).toSeq
    val rowsBefore = contentOf(idx)

    // below the cap: nothing moves
    assert(!Retrieval.maybeCompactTextIngest(spark, idx, "qr", 3L,
      maxLiveSubtrees = 10))
    assert(ownSubtrees(idx, "qr").size === 3)
    // disabled: nothing moves
    assert(!Retrieval.maybeCompactTextIngest(spark, idx, "qr", 3L, 0))

    // at the cap: the three subtrees fold into _ingest/qr-c/b_3; the
    // sources stay on DISK (deferred GC) but leave the LIVE view — the
    // cutoff rule makes the fold race-free for concurrent readers
    assert(Retrieval.maybeCompactTextIngest(spark, idx, "qr", 3L,
      maxLiveSubtrees = 3))
    assert(liveSubtrees(idx) === Seq("qr-c/b_3"))
    assert(ownSubtrees(idx, "qr").size === 4, "sources deferred, not deleted")
    assert(contentOf(idx) === rowsBefore,
      "compaction must be row-identical")
    // the NEXT trigger call garbage-collects the superseded sources
    assert(!Retrieval.maybeCompactTextIngest(spark, idx, "qr", 4L,
      maxLiveSubtrees = 3))
    assert(ownSubtrees(idx, "qr") === Seq("qr-c/b_3"))
    assert(contentOf(idx) === rowsBefore)
    assert(Retrieval.bm25AgainstIndex(spark, idx, q, 10).collect()
      .map(_.toString).toSeq === plainBefore)
    // the sidecar folded too — WAND still exact AND its per-term df gate
    // (sidecar Σ n_docs == postings df) still holds on the merged rows
    assert(Retrieval.bm25WandAgainstIndex(spark, idx, q, 10).collect()
      .map(_.toString).toSeq === wandBefore)
  }

  test("batch-id regression below the compact cutoff fails loudly (stale checkpoint reuse)") {
    val idx = freshDir("cmp_regress")
    Retrieval.writeTextIndex(docs(0, 2), "doc_id", "text", idx, nBuckets = 4)
    (0 to 2).foreach { i =>
      Retrieval.ingestTextBatch(docs(2 + 2 * i, 4 + 2 * i), "doc_id", "text",
        idx, queryTag = "qg", batchId = i.toLong)
    }
    assert(Retrieval.maybeCompactTextIngest(spark, idx, "qg", 3L,
      maxLiveSubtrees = 3)) // marked compact at b_3 — the cutoff
    val rowsBefore = contentOf(idx)

    // a wiped-but-path-reused checkpoint restarts ids at 0 under the SAME
    // tag: pre-guard, the append landed, was invisible to every probe,
    // and the next trigger GC'd it — permanent silent data loss. Now it
    // fails before writing anything, naming the cause.
    val e = intercept[IllegalArgumentException] {
      Retrieval.ingestTextBatch(docs(0, 2), "doc_id", "text", idx,
        queryTag = "qg", batchId = 0L)
    }
    assert(e.getMessage.contains("regressed below"), e.getMessage)
    assert(e.getMessage.contains("checkpoint"), e.getMessage)
    assert(contentOf(idx) === rowsBefore, "the refused append wrote nothing")

    // the compactor refuses a regressed trigger the same way
    val e2 = intercept[IllegalArgumentException] {
      Retrieval.maybeCompactTextIngest(spark, idx, "qg", 1L,
        maxLiveSubtrees = 1)
    }
    assert(e2.getMessage.contains("regressed below"), e2.getMessage)

    // ids AT or ABOVE the cutoff stay legal (the normal resumed loop)
    Retrieval.ingestTextBatch(docs(0, 2), "doc_id", "text", idx,
      queryTag = "qg", batchId = 4L)
    assert(liveSubtrees(idx).toSet === Set("qg-c/b_3", "qg/b_4"))

    // an UNRELATED tag on the same index is not constrained by qg's cutoff
    Retrieval.ingestTextBatch(docs(2, 4), "doc_id", "text", idx,
      queryTag = "qh", batchId = 0L)
    assert(liveSubtrees(idx).toSet === Set("qg-c/b_3", "qg/b_4", "qh/b_0"))
  }

  test("text ingest: crash between publish and source deletes is repaired by the replay's trigger call") {
    val q = Seq("a", "b", "c")
    val idx = freshDir("cmp_text_crash")
    Retrieval.writeTextIndex(docs(0, 2), "doc_id", "text", idx, nBuckets = 4)
    (0 to 2).foreach { i =>
      Retrieval.ingestTextBatch(docs(2 + 2 * i, 4 + 2 * i), "doc_id", "text",
        idx, queryTag = "qr", batchId = i.toLong)
    }
    val before = Retrieval.bm25AgainstIndex(spark, idx, q, 10).collect()
      .map(_.toString).toSeq
    // fold, then crash before any GC: under deferred deletion the
    // post-publish on-disk state IS the crash state — sources + compact
    // both present (no stash/restore simulation needed anymore)
    assert(Retrieval.maybeCompactTextIngest(spark, idx, "qr", 3L, 3))
    assert(ownSubtrees(idx, "qr").toSet
      === Set("qr-c/b_3", "qr/b_0", "qr/b_1", "qr/b_2"))
    // the leftover is INVISIBLE to probes: the cutoff rule excludes
    // anything older than the newest compact at LISTING time, so the
    // crash window is never over-read (this assertion fails on the old
    // eager-delete design, where the leftover doubled batch 1's postings)
    assert(liveSubtrees(idx) === Seq("qr-c/b_3"))
    assert(Retrieval.bm25AgainstIndex(spark, idx, q, 10).collect()
      .map(_.toString).toSeq === before)
    // the replay's trigger call sees the published target and garbage-
    // collects the leftover WITHOUT re-merging (its rows already live there)
    assert(Retrieval.maybeCompactTextIngest(spark, idx, "qr", 3L, 3))
    assert(ownSubtrees(idx, "qr") === Seq("qr-c/b_3"))
    assert(Retrieval.bm25AgainstIndex(spark, idx, q, 10).collect()
      .map(_.toString).toSeq === before)
  }

  test("torn compact publish (unmarked dir): invisible to probes — committed rows never under-read; replay rebuilds") {
    val q = Seq("a", "b", "c")
    val idx = freshDir("cmp_text_torn")
    Retrieval.writeTextIndex(docs(0, 2), "doc_id", "text", idx, nBuckets = 4)
    (0 to 2).foreach { i =>
      Retrieval.ingestTextBatch(docs(2 + 2 * i, 4 + 2 * i), "doc_id", "text",
        idx, queryTag = "qr", batchId = i.toLong)
    }
    val before = Retrieval.bm25AgainstIndex(spark, idx, q, 10).collect()
      .map(_.toString).toSeq
    assert(Retrieval.maybeCompactTextIngest(spark, idx, "qr", 3L, 3))
    // simulate the torn-rename state on an object store: the compact dir
    // is (partially) visible but its completion marker never landed
    val marker = new java.io.File(
      s"$idx/_ingest/qr-c/b_3/_GRAFT_COMPACT_COMPLETE")
    assert(marker.isFile, "a completed fold must carry the marker")
    assert(marker.delete())
    // ...and the copy genuinely incomplete: drop a data file, so a rule
    // that trusted bare directory existence would UNDER-read (the probe
    // below would lose committed postings, not just double them)
    def firstParquet(f: java.io.File): java.io.File =
      if (f.isFile) (if (f.getName.endsWith(".parquet")) f else null)
      else f.listFiles().iterator.map(firstParquet).find(_ != null).orNull
    val victim = firstParquet(new java.io.File(s"$idx/_ingest/qr-c/b_3"))
    assert(victim != null && victim.delete())
    // an UNMARKED compact supersedes nothing and is itself invisible:
    // probes read the intact sources — committed rows are never
    // under-read (this assertion fails if the cutoff rule trusted bare
    // directory existence)
    assert(liveSubtrees(idx) === Seq("qr/b_0", "qr/b_1", "qr/b_2"))
    assert(Retrieval.bm25AgainstIndex(spark, idx, q, 10).collect()
      .map(_.toString).toSeq === before)
    // the replay's trigger deletes the debris and re-merges from the
    // intact sources — nothing was lost
    assert(Retrieval.maybeCompactTextIngest(spark, idx, "qr", 3L, 3))
    assert(liveSubtrees(idx) === Seq("qr-c/b_3"))
    assert(new java.io.File(
      s"$idx/_ingest/qr-c/b_3/_GRAFT_COMPACT_COMPLETE").isFile)
    assert(Retrieval.bm25AgainstIndex(spark, idx, q, 10).collect()
      .map(_.toString).toSeq === before)
  }

  test("foreign-named subtree dirs: live for probes, never merge sources, never GC'd") {
    val q = Seq("a", "b", "c")
    val idx = freshDir("cmp_text_foreign")
    Retrieval.writeTextIndex(docs(0, 2), "doc_id", "text", idx, nBuckets = 4)
    (0 to 1).foreach { i =>
      Retrieval.ingestTextBatch(docs(2 + 2 * i, 4 + 2 * i), "doc_id", "text",
        idx, queryTag = "qr", batchId = i.toLong)
    }
    // a manually-restored dir with a non-b_<n> name joins the namespace
    copyDir(s"$idx/_ingest/qr/b_1", s"$idx/_ingest/qr/restored_backup")
    // its rows count (batch 1's postings are deliberately doubled now)
    val before = Retrieval.bm25AgainstIndex(spark, idx, q, 10).collect()
      .map(_.toString).toSeq
    // the fold must NOT consume it: the cutoff rule can't supersede a
    // foreign name, so folding it would leave both copies live (rows
    // tripled) — and GC must never touch it
    assert(Retrieval.maybeCompactTextIngest(spark, idx, "qr", 2L, 2))
    assert(liveSubtrees(idx) === Seq("qr-c/b_2", "qr/restored_backup"))
    assert(Retrieval.bm25AgainstIndex(spark, idx, q, 10).collect()
      .map(_.toString).toSeq === before,
      "fold + foreign dir must stay row-identical (each row read once)")
    assert(!Retrieval.maybeCompactTextIngest(spark, idx, "qr", 3L, 2))
    assert(ownSubtrees(idx, "qr").toSet
      === Set("qr-c/b_2", "qr/restored_backup"),
      "GC must remove folded sources but never the foreign dir")
  }

  // ---------------------------------------------------------------------
  // MinHash signatures
  // ---------------------------------------------------------------------

  test("append-id allocator clears the compact cutoff: manual append resumes after a fold GC'd every plain subtree") {
    val idx = freshDir("cmp_alloc")
    val base = Seq((1L,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
      .toDF("doc_id", "text")
    Dedup.writeSignatureIndex(base, "doc_id", "text", idx)
    (0 to 2).foreach { i =>
      Dedup.appendToSignatureIndex(
        Seq((10L + i, s"tok$i one two three four five six seven eight nine ten eleven"))
          .toDF("doc_id", "text"),
        "doc_id", "text", idx, queryTag = "qa", batchId = i.toLong)
    }
    val sigSchema = spark.read.parquet(idx).schema
    assert(Dedup.maybeCompactSignatureIngest(spark, idx, "qa", 3L, 3, sigSchema))
    assert(!Dedup.maybeCompactSignatureIngest(spark, idx, "qa", 4L, 3,
      sigSchema)) // deferred GC removes the folded plain b_* dirs
    assert(ownSubtrees(idx, "qa") === Seq("qa-c/b_3"))
    // pre-fix: nextAppendBatchId saw an empty plain namespace, allocated
    // 0, and requireBatchIdFresh refused it FOREVER (0 < cutoff 3) — a
    // dead end where resuming above the cutoff is safe. The allocator
    // now clears the cutoff, so the default batchId = -1 append lands.
    Dedup.appendToSignatureIndex(
      Seq((20L, "resumed append lands above the compact cutoff just fine yes"))
        .toDF("doc_id", "text"),
      "doc_id", "text", idx, queryTag = "qa") // batchId = -1 → allocator
    assert(ownSubtrees(idx, "qa").toSet === Set("qa-c/b_3", "qa/b_3"),
      "the allocated id must be >= the cutoff, not 0")
  }

  test("signature ingest: cap folds subtrees; index probe bit-identical") {
    val idx = freshDir("cmp_sig")
    val base = Seq((1L,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
      .toDF("doc_id", "text")
    Dedup.writeSignatureIndex(base, "doc_id", "text", idx)
    val batches = Seq(
      (10L, "one two three four five six seven eight nine ten eleven twelve"),
      (11L, "red orange yellow green blue indigo violet cyan magenta black white gray"),
      (12L, "spark parquet shuffle broadcast partition codegen catalyst tungsten arrow row column batch"))
    batches.zipWithIndex.foreach { case ((id, txt), i) =>
      Dedup.appendToSignatureIndex(Seq((id, txt)).toDF("doc_id", "text"),
        "doc_id", "text", idx, queryTag = "qd", batchId = i.toLong)
    }
    assert(ownSubtrees(idx, "qd").size === 3)
    // a probe batch near-duplicating one base doc and one ingested doc
    val probe = Seq(
      (90L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
      (91L, "one two three four five six seven eight nine ten eleven thirteen"))
      .toDF("doc_id", "text")
    val hitsBefore = Dedup.dedupAgainstIndex(probe, "doc_id", "text", idx,
      minAgreeFraction = 0.3).collect().map(_.toString).sorted.toSeq
    assert(hitsBefore.nonEmpty)
    val rowsBefore = contentOf(idx)
    val sigSchema = spark.read.parquet(idx).schema
    assert(Dedup.maybeCompactSignatureIngest(spark, idx, "qd", 3L, 3,
      sigSchema))
    assert(liveSubtrees(idx) === Seq("qd-c/b_3"))
    assert(contentOf(idx) === rowsBefore)
    assert(!Dedup.maybeCompactSignatureIngest(spark, idx, "qd", 4L, 3,
      sigSchema)) // deferred-GC pass
    assert(ownSubtrees(idx, "qd") === Seq("qd-c/b_3"))
    assert(Dedup.dedupAgainstIndex(probe, "doc_id", "text", idx,
      minAgreeFraction = 0.3).collect().map(_.toString).sorted.toSeq
      === hitsBefore)
  }

  // ---------------------------------------------------------------------
  // Image hashes
  // ---------------------------------------------------------------------

  test("image-hash ingest: cap folds subtrees; index probe bit-identical") {
    val idx = freshDir("cmp_img")
    ImageDedup.writeImageHashIndex(
      Seq((1L, "0000000000000000"), (2L, "ffffffffffffffff"))
        .toDF("id", "dhash"), "id", "dhash", idx)
    val batches = Seq("0f0f0f0f0f0f0f0f", "f0f0f0f0f0f0f0f0",
      "00ff00ff00ff00ff")
    batches.zipWithIndex.foreach { case (h, i) =>
      ImageDedup.appendToImageHashIndex(
        Seq((10L + i, h)).toDF("id", "dhash"), "id", "dhash", idx,
        queryTag = "qi", batchId = i.toLong)
    }
    assert(ownSubtrees(idx, "qi").size === 3)
    val probe = Seq((90L, "0100000000000000"), (91L, "0f0f0f0f0f0f0f1f"))
      .toDF("id", "dhash")
    val hitsBefore = ImageDedup.dedupAgainstImageIndex(probe, "id", "dhash",
      idx).collect().map(_.toString).sorted.toSeq
    assert(hitsBefore.nonEmpty)
    val rowsBefore = contentOf(idx)
    assert(ImageDedup.maybeCompactImageIngest(spark, idx, "qi", 3L, 3,
      spark.read.parquet(idx).schema))
    assert(liveSubtrees(idx) === Seq("qi-c/b_3"))
    assert(contentOf(idx) === rowsBefore)
    assert(!ImageDedup.maybeCompactImageIngest(spark, idx, "qi", 4L, 3,
      spark.read.parquet(idx).schema)) // deferred-GC pass
    assert(ownSubtrees(idx, "qi") === Seq("qi-c/b_3"))
    assert(ImageDedup.dedupAgainstImageIndex(probe, "id", "dhash", idx)
      .collect().map(_.toString).sorted.toSeq === hitsBefore)
  }

  // ---------------------------------------------------------------------
  // PQ codes
  // ---------------------------------------------------------------------

  test("pq ingest: cap folds subtrees; readIndex bit-identical") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding")).limit(60).localCheckpoint()
    val cents = Similarity.collectCentroids(
      emb.filter(col("vec_id") < 4), "vec_id", "embedding")
    val cb = Pq.train(emb, "vec_id", "embedding", subspaces = 4, codes = 8,
      iters = 1, trainN = 60)
    val idx = freshDir("cmp_pq")
    val base = emb.filter(col("vec_id") % 4 === 0)
    Pq.writeIndex(Pq.encode(
        Similarity.ivfAssign(base, "vec_id", "embedding", cents),
        "embedding", cb), "vec_id", cents, cb, idx)
    (1 to 3).foreach { i =>
      Pq.ingestPqBatch(emb.filter(col("vec_id") % 4 === i), "vec_id",
        "embedding", idx, queryTag = "qp", batchId = i.toLong)
    }
    assert(ownSubtrees(idx, "qp").size === 3)
    val rowsBefore = Pq.readIndex(spark, idx).collect()
      .map(_.toString).sorted.toSeq
    assert(Pq.maybeCompactPqIngest(spark, idx, "qp", 4L, 3))
    assert(liveSubtrees(idx) === Seq("qp-c/b_4"))
    assert(Pq.readIndex(spark, idx).collect().map(_.toString).sorted.toSeq
      === rowsBefore)
    assert(!Pq.maybeCompactPqIngest(spark, idx, "qp", 5L, 3)) // deferred GC
    assert(ownSubtrees(idx, "qp") === Seq("qp-c/b_4"))
  }

  // ---------------------------------------------------------------------
  // Semantic vectors (newly subtree-based: replay-idempotent + cap)
  // ---------------------------------------------------------------------

  test("sem ingest: replayed batch overwrites its subtree; cap folds subtrees; probe and ivfRead bit-identical") {
    val idx = freshDir("cmp_sem")
    val cents = Seq((0, Array(1f, 0f, 0f)), (1, Array(0f, 0f, 1f)))
    Similarity.writeSemIndex(
      Seq((1L, Array(0.9f, 0.1f, 0f))).toDF("id", "vec"),
      "id", "vec", cents, idx)
    val batches = Seq(
      Seq((10L, Array(0f, 0.2f, 0.9f))),
      Seq((11L, Array(0.1f, 0.9f, 0f))),
      Seq((12L, Array(-0.9f, 0f, 0.1f))))
    batches.zipWithIndex.foreach { case (b, i) =>
      Similarity.ingestSemBatch(b.toDF("id", "vec"), "id", "vec", idx,
        queryTag = "qs", batchId = i.toLong)
    }
    assert(ownSubtrees(idx, "qs").size === 3)
    // a REPLAY overwrites its own subtree — same total rows
    Similarity.ingestSemBatch(batches(1).toDF("id", "vec"), "id", "vec",
      idx, queryTag = "qs", batchId = 1L)
    assert(Similarity.ivfRead(spark, idx).count() === 4L,
      "a replayed sem batch must overwrite, not append")
    val probe = Seq((90L, Array(0f, 0.19f, 0.9f)), (91L, Array(0.5f, 0.5f, 0.5f)))
      .toDF("id", "vec")
    val hitsBefore = Similarity.semDedupAgainstIndex(probe, "id", "vec",
      idx, tau = 0.8).collect().map(_.toString).sorted.toSeq
    assert(hitsBefore.nonEmpty)
    val rowsBefore = Similarity.ivfRead(spark, idx).collect()
      .map(_.toString).sorted.toSeq
    assert(Similarity.maybeCompactSemIngest(spark, idx, "qs", 3L, 3))
    assert(liveSubtrees(idx) === Seq("qs-c/b_3"))
    assert(!Similarity.maybeCompactSemIngest(spark, idx, "qs", 4L, 3))
    assert(ownSubtrees(idx, "qs") === Seq("qs-c/b_3"))
    assert(Similarity.ivfRead(spark, idx).collect().map(_.toString).sorted.toSeq
      === rowsBefore)
    assert(Similarity.semDedupAgainstIndex(probe, "id", "vec", idx,
      tau = 0.8).collect().map(_.toString).sorted.toSeq === hitsBefore)
    // offline compaction folds base + subtrees into a clean-slate target
    val target = freshDir("cmp_sem_out")
    Similarity.compactSemIndex(spark, idx, target)
    assert(Similarity.ivfRead(spark, target).collect().map(_.toString).sorted.toSeq
      === rowsBefore)
  }

  // ---------------------------------------------------------------------
  // Line frequencies (the one SUMMING merge: partials collapse per line)
  // ---------------------------------------------------------------------

  test("line-freq ingest: cap folds subtrees summing partials; strip probe value-identical") {
    val idx = freshDir("cmp_line")
    Boilerplate.writeLineFreqIndex(
      Seq((1L, "d", "HEADER\nbody one"), (2L, "d", "HEADER\nbody two"))
        .toDF("doc_id", "src", "text"),
      "doc_id", "text", "src", idx)
    val noSink = (_: DataFrame, _: Long) => ()
    (0 to 2).foreach { i =>
      Boilerplate.ingestLineBatch(
        Seq((10L + 2 * i, "d", s"HEADER\nunique $i a"),
          (11L + 2 * i, "d", s"HEADER\nunique $i b"))
          .toDF("doc_id", "src", "text"),
        "doc_id", "text", "src", idx, queryTag = "ql", batchId = i.toLong,
        minDf = 3L, sink = noSink)
    }
    assert(ownSubtrees(idx, "ql").size === 3)
    val probe = Seq((90L, "d", "HEADER\nfresh body"))
      .toDF("doc_id", "src", "text")
    def strip() = Boilerplate.stripAgainstLineIndex(probe, "doc_id", "text",
      "src", idx, minDf = 3L).select("doc_id", "text_kept", "lines_removed")
      .collect().map(_.toString).sorted.toSeq
    def totals() = {
      val schema = spark.read.parquet(idx).schema
      (idx +: IndexLifecycle.listIngestDirs(spark, idx))
        .map(r => spark.read.schema(schema).parquet(r))
        .reduce(_ unionByName _)
        .groupBy(col("src"), col("__ln")).agg(sum("df_count").as("df"))
        .collect().map(_.toString).sorted.toSeq
    }
    val stripBefore = strip()
    assert(stripBefore.head.contains("fresh body") &&
      !stripBefore.head.contains("HEADER"),
      s"HEADER (df 8 across base+batches) must strip: $stripBefore")
    val totalsBefore = totals()
    assert(Boilerplate.maybeCompactLineIngest(spark, idx, "ql", 3L, 3, "src"))
    assert(liveSubtrees(idx) === Seq("ql-c/b_3"))
    assert(!Boilerplate.maybeCompactLineIngest(spark, idx, "ql", 4L, 3, "src"))
    assert(ownSubtrees(idx, "ql") === Seq("ql-c/b_3"))
    assert(totals() === totalsBefore,
      "summed per-(group, line) counts must be preserved")
    assert(strip() === stripBefore)
    // the HEADER partials (1 per batch subtree + base) really collapsed
    val headerRows = (idx +: IndexLifecycle.listIngestDirs(spark, idx))
      .map(r => spark.read.schema(spark.read.parquet(idx).schema).parquet(r))
      .reduce(_ unionByName _)
      .filter(col("__ln") === "HEADER").count()
    assert(headerRows === 2L,
      s"base partial + ONE merged partial expected, got $headerRows")
  }

  // ---------------------------------------------------------------------
  // Loop-level integration: the streaming query compacts itself
  // ---------------------------------------------------------------------

  test("streamingIngest(maxLiveSubtrees): the loop compacts in-flight and keeps catching dups across the fold") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val idx = freshDir("cmp_loop")
    Dedup.writeSignatureIndex(
      Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
        .toDF("doc_id", "text"), "doc_id", "text", idx)
    val in = MemoryStream[(Long, String)]
    val perBatch = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val ckpt = tempDir("cmp_loop_ckpt")
    val q = Dedup.streamingIngest(in.toDF().toDF("doc_id", "text"),
      "doc_id", "text", idx, ckpt,
      sink = (clean, batchId) => {
        perBatch(batchId) = clean.select("doc_id").collect()
          .map(_.getLong(0)).toSet
        ()
      },
      minAgreeFraction = 0.3, maxLiveSubtrees = 2)
    val tag = IndexLifecycle.queryTagOf(spark, ckpt)
    try {
      in.addData((10L, "one two three four five six seven eight nine ten eleven twelve"))
      q.processAllAvailable()
      in.addData((11L, "red orange yellow green blue indigo violet cyan magenta black white gray"))
      q.processAllAvailable()
      // batch 2 starts with 2 live subtrees = the cap -> folds them, then
      // appends its own; its probe must still catch batch-0's doc
      in.addData(
        (20L, "one two three four five six seven eight nine ten eleven thirteen"),
        (21L, "entirely unrelated words about spark parquet shuffles and caching"))
      q.processAllAvailable()
      assert(perBatch(2L) === Set(21L),
        s"the dup of batch 0's doc must still be caught AFTER the fold: ${perBatch.toMap}")
      // the fold really happened: batch 0/1 folded out of the LIVE view
      // (their dirs await the next trigger's deferred GC)
      assert(liveSubtrees(idx) === Seq(s"$tag-c/b_2", s"$tag/b_2"),
        s"got ${liveSubtrees(idx)}")
      // one more batch: its trigger garbage-collects the first fold's
      // sources (b_0/b_1 leave the DISK), and at cap=2 it folds again —
      // deferring ITS sources (c/b_2, b_2) to the next cycle
      in.addData((30L, "completely fresh vocabulary nothing matches here at all today ok fine"))
      q.processAllAvailable()
      assert(ownSubtrees(idx, tag) ===
        Seq(s"$tag-c/b_2", s"$tag-c/b_3", s"$tag/b_2", s"$tag/b_3"),
        s"got ${ownSubtrees(idx, tag)}")
      assert(liveSubtrees(idx) === Seq(s"$tag-c/b_3", s"$tag/b_3"),
        s"got ${liveSubtrees(idx)}")
    } finally q.stop()
  }
}
