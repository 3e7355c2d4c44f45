package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Block-max WAND probe contracts ([[Retrieval.bm25WandAgainstIndex]]):
  * exactness against the unpruned probe under every index lifecycle shape
  * (split appends, streaming ingest, tiny blocks forcing real pruning,
  * n larger than the corpus), plus the upgrade/refusal paths.
  */
class WandSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/idx"

  private def rows(df: DataFrame): Seq[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq

  /** Skewed corpus: a handful of term-dense docs in low id ranges, then a
    * long tail of low-tf docs across many doc-id blocks — the shape block
    * pruning exists for.
    */
  private def skewed(nTail: Int): DataFrame = {
    val heads = Seq(
      (0L, "spark spark spark join join hash"),
      (1L, "spark join hash hash hash"),
      (2L, "spark spark join"))
    val tail = (1 to nTail).map { i =>
      (100L + i, "spark filler" + (" pad" * (i % 7)))
    }
    (heads ++ tail).toDF("doc_id", "text")
  }

  test("WAND probe hash-matches the plain probe across lifecycle shapes") {
    val docs = skewed(200)
    val q = Seq("spark", "join", "hash")
    val idx = freshDir("wand_eq")
    Retrieval.writeTextIndex(docs.where(col("doc_id") % 2 === 0),
      "doc_id", "text", idx, nBuckets = 4, blockSize = 16)
    Retrieval.appendToTextIndex(docs.where(col("doc_id") % 2 === 1),
      "doc_id", "text", idx)
    for (n <- Seq(1, 5, 20, 500)) {
      val plain = rows(Retrieval.bm25AgainstIndex(spark, idx, q, n))
      val wand = rows(Retrieval.bm25WandAgainstIndex(spark, idx, q, n))
      assert(wand === plain, s"n=$n")
    }
    // single-term and absent-term queries
    assert(rows(Retrieval.bm25WandAgainstIndex(spark, idx, Seq("hash"), 5)) ===
      rows(Retrieval.bm25AgainstIndex(spark, idx, Seq("hash"), 5)))
    assert(Retrieval.bm25WandAgainstIndex(spark, idx, Seq("nosuchterm"), 5)
      .isEmpty)
  }

  test("pruning is real: tiny blocks + tiny maxSurvivors falls back without changing results") {
    val docs = skewed(300)
    val q = Seq("spark", "join", "hash")
    val idx = freshDir("wand_prune")
    Retrieval.writeTextIndex(docs, "doc_id", "text", idx,
      nBuckets = 4, blockSize = 8)
    val plain = rows(Retrieval.bm25AgainstIndex(spark, idx, q, 3))
    // normal path (pruned) and the degraded path (maxSurvivors = 0 forces
    // the unpruned fallback) must both equal the plain probe
    assert(rows(Retrieval.bm25WandAgainstIndex(spark, idx, q, 3)) === plain)
    assert(rows(Retrieval.bm25WandAgainstIndex(spark, idx, q, 3,
      maxSurvivors = 0)) === plain)
  }

  test("WAND sees streaming-ingested batches and their stats") {
    val idx = freshDir("wand_ingest")
    Retrieval.writeTextIndex(
      Seq((0L, "spark join")).toDF("doc_id", "text"), "doc_id", "text", idx,
      nBuckets = 4, blockSize = 16)
    Retrieval.ingestTextBatch(
      Seq((1L, "spark spark hash"), (2L, "join hash")).toDF("doc_id", "text"),
      "doc_id", "text", idx, "qtest", 0L)
    val q = Seq("spark", "hash")
    assert(rows(Retrieval.bm25WandAgainstIndex(spark, idx, q, 10)) ===
      rows(Retrieval.bm25AgainstIndex(spark, idx, q, 10)))
  }

  test("regression: an over-complete sidecar (phantom blocks, no postings) never misprunes") {
    // the crash contract: every observable subtree state is sidecar ≥
    // postings, where phantom (term, block) rows bound documents that do
    // not exist. WAND must stay exact because scoring df comes from the
    // POSTINGS, never the sidecar — simulate the extreme over-complete
    // state by deleting a batch subtree's postings while keeping its
    // _block_stats intact.
    val idx = freshDir("wand_phantom")
    Retrieval.writeTextIndex(skewed(100), "doc_id", "text", idx,
      nBuckets = 4, blockSize = 16)
    // the phantom batch is ADVERSARIAL for the one-pass θ lower bound: a
    // FULL block (ids 896-910 at blockSize 16) of docs carrying
    // rare "hash" (postings df=2) — its 15 witnesses alone cover any
    // n ≤ 15, so an ungated lb would set θ above the real tail's bounds
    // and prune true top-n docs (verified: removing the df gate fails
    // this test at n=10)
    Retrieval.ingestTextBatch(
      (896L to 910L).map(i => (i, ("spark " * 30).trim + " hash hash"))
        .toDF("doc_id", "text"),
      "doc_id", "text", idx, "qphantom", 0L)
    val dir = IndexLifecycle.ingestBatchDir(idx, "qphantom", 0L)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    // delete every postings partition, keep the sidecar: the subtree is
    // now maximally over-complete (all its blocks are phantoms)
    fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("__tb="))
      .foreach(s => fs.delete(s.getPath, true))
    val q = Seq("spark", "hash", "join")
    for (n <- Seq(1, 3, 10)) {
      val plain = rows(Retrieval.bm25AgainstIndex(spark, idx, q, n))
      assert(plain.nonEmpty && !plain.exists(_._1 >= 900L),
        s"postings-less batch docs must be gone from the plain probe (n=$n)")
      assert(rows(Retrieval.bm25WandAgainstIndex(spark, idx, q, n)) === plain,
        s"phantom sidecar blocks must weaken bounds only, never prune (n=$n)")
    }
    // the BATCH probe under the same phantoms: its one-pass θ lower
    // bound must be DISABLED by the df gate (sidecar Σ n_docs > postings
    // df for every phantom-inflated term), never inflate θ and misprune
    // n=10 reaches tail docs whose blocks an inflated θ_lb would prune
    val batch = q.map(t => (1L, t)).toDF("query_id", "term")
    val wandB = Retrieval.bm25WandBatchAgainstIndex(spark, idx, batch,
      "query_id", "term", 10).drop("query_id")
    assert(rows(wandB) === rows(Retrieval.bm25AgainstIndex(spark, idx, q, 10)),
      "phantom-inflated terms must fall back to upper-bound-only pruning")
  }

  test("pre-v2 sidecar (no lb columns) batch-probes exactly, lb-pruning disabled") {
    // a sidecar written before min_tf/max_dl reads those columns as NULL;
    // the batch probe must derive no θ lower bound from it (NULL poisons
    // the min/max merge via the validity conjunct) and stay exact
    val idx = freshDir("wand_prev2")
    Retrieval.writeTextIndex(skewed(150), "doc_id", "text", idx,
      nBuckets = 4, blockSize = 16)
    // strip the v2 columns in place, simulating an old artifact
    val scDir = idx + "/_block_stats"
    val stripped = spark.read.parquet(scDir)
      .drop("min_tf", "max_dl").collect()
    val schema = org.apache.spark.sql.types.StructType(
      spark.read.parquet(scDir).drop("min_tf", "max_dl").schema)
    spark.createDataFrame(java.util.Arrays.asList(stripped: _*), schema)
      .write.mode("overwrite").partitionBy("__tb").parquet(scDir)
    val q = Seq("spark", "join", "hash")
    val batch = q.map(t => (7L, t)).toDF("query_id", "term")
    val wandB = Retrieval.bm25WandBatchAgainstIndex(spark, idx, batch,
      "query_id", "term", 5).drop("query_id")
    assert(rows(wandB) === rows(Retrieval.bm25AgainstIndex(spark, idx, q, 5)))
    // the single probe's upper-bound pruning is unaffected by the strip
    assert(rows(Retrieval.bm25WandAgainstIndex(spark, idx, q, 5)) ===
      rows(Retrieval.bm25AgainstIndex(spark, idx, q, 5)))
  }


  test("two-tier plane: tier one collects only the seed prefix; a uniform corpus takes the bounded extension") {
    // Tier one collects only the seed prefix (≤ seedBoost·n rows — the
    // r15 plane collected max(seedBoost·n, maxSurvivors+1) ≈ 1M rows per
    // probe). The survivor set must still be EXACT in both regimes:
    //  (a) skewed corpus — θ beats the prefix's minimum bound, survivors
    //      come off the tier-one array, NO extension job;
    //  (b) uniform corpus — every block bounds identically, θ == the
    //      prefix minimum, tier one cannot prove coverage, and ONE extra
    //      bounded job collects every clearing block.
    val q = Seq("spark", "join")

    val skIdx = freshDir("wand_tier1")
    Retrieval.writeTextIndex(skewed(200), "doc_id", "text", skIdx,
      nBuckets = 4, blockSize = 16)
    val (skRes, skPlan) = Retrieval.bm25WandWithPlan(spark, skIdx, q, 3)
    assert(rows(skRes) === rows(Retrieval.bm25AgainstIndex(spark, skIdx, q, 3)))
    assert(!skPlan.extended,
      "a skewed corpus must resolve survivors off the tier-one prefix")
    assert(skPlan.planeRows <= 32L * 3,
      s"tier one must collect at most seedBoost*n rows, got ${skPlan.planeRows}")
    assert(skPlan.survivors.exists(_.nonEmpty))

    val uIdx = freshDir("wand_tier2")
    Retrieval.writeTextIndex(
      (0 until 96).map(i => (i.toLong, "spark join")).toDF("doc_id", "text"),
      "doc_id", "text", uIdx, nBuckets = 4, blockSize = 8)
    val (uRes, uPlan) = Retrieval.bm25WandWithPlan(spark, uIdx, q, 1,
      seedBoost = 1, collectStats = true)
    assert(rows(uRes) === rows(Retrieval.bm25AgainstIndex(spark, uIdx, q, 1)))
    // every one of the 12 blocks bounds == θ: tier one held only the
    // single seed block, so the extension must recover all 12
    assert(uPlan.extended, "uniform bounds must force the extension job")
    assert(uPlan.planeRows === 1L)
    assert(uPlan.seedBlocks === 1L)
    assert(uPlan.totalBlocks === 12L)
    assert(uPlan.survivors.exists(_.size === 12),
      s"extension must recover every clearing block: ${uPlan.survivors}")
  }

  test("compaction regenerates the sidecar; probe results unchanged") {
    val docs = skewed(100)
    val idx = freshDir("wand_cpt")
    val tgt = freshDir("wand_cpt_tgt")
    Retrieval.writeTextIndex(docs.where(col("doc_id") < 50), "doc_id", "text",
      idx, nBuckets = 4, blockSize = 16)
    Retrieval.appendToTextIndex(docs.where(col("doc_id") >= 50),
      "doc_id", "text", idx)
    Retrieval.compactTextIndex(spark, idx, tgt, blockSize = 32)
    val q = Seq("spark", "join")
    assert(rows(Retrieval.bm25WandAgainstIndex(spark, tgt, q, 10)) ===
      rows(Retrieval.bm25AgainstIndex(spark, idx, q, 10)))
  }

  test("batch WAND equals the plain batch probe, pruned and degraded") {
    val docs = skewed(250)
    val idx = freshDir("wand_batch")
    Retrieval.writeTextIndex(docs.where(col("doc_id") % 2 === 0),
      "doc_id", "text", idx, nBuckets = 4, blockSize = 16)
    Retrieval.appendToTextIndex(docs.where(col("doc_id") % 2 === 1),
      "doc_id", "text", idx)
    val batch = Seq((1L, "spark"), (1L, "join"), (2L, "hash"), (2L, "join"),
      (3L, "nosuchterm"), (1L, "join")) // repeat = a set; q3 matches nothing
      .toDF("query_id", "term")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    for (n <- Seq(1, 3, 500)) {
      val plain = rows(Retrieval.bm25BatchAgainstIndex(spark, idx, batch,
        "query_id", "term", n))
      assert(rows(Retrieval.bm25WandBatchAgainstIndex(spark, idx, batch,
        "query_id", "term", n)) === plain, s"n=$n")
    }
  }

  test("doc-id reordering restores pruning on an interleaved corpus") {
    // quality alternates with doc id: every 8-doc block contains rich
    // docs, so every block bounds high and NOTHING prunes — the
    // WAND-adversarial interleaving. Reordering by a quality proxy
    // clusters the rich docs into few blocks.
    val docs = (0 until 256).map { i =>
      if (i % 8 == 0) (i.toLong, "spark spark spark join join hash")
      else (i.toLong, "spark filler pad pad pad pad pad pad pad pad")
    }.toDF("doc_id", "text")
    val q = Seq("spark", "join", "hash")

    def planFor(d: org.apache.spark.sql.DataFrame, tag: String) = {
      val idx = freshDir(tag)
      Retrieval.writeTextIndex(d, "doc_id", "text", idx,
        nBuckets = 4, blockSize = 8)
      val (df, plan) = Retrieval.bm25WandWithPlan(spark, idx, q, 5,
        collectStats = true)
      (df.collect().map(r => r.getLong(1)).toSeq, plan)
    }

    val (scoresBefore, before) = planFor(docs, "wand_reorder_a")
    assert(before.survivors.map(_.size.toLong).getOrElse(-1L) ==
      before.totalBlocks, "interleaved ids must defeat pruning (premise)")

    val reordered = Retrieval.reorderDocs(docs, "doc_id",
        Seq(length(col("text")).desc))
      .select(col("doc_id_new").as("doc_id"), col("text"))
    val (scoresAfter, after) = planFor(reordered, "wand_reorder_b")
    assert(after.survivors.exists(_.size.toLong < after.totalBlocks),
      s"reordering must restore pruning: $after")
    // reordering renames ids but cannot change the score multiset
    assert(scoresBefore.sorted === scoresAfter.sorted)
  }

  test("a version-1 index (no blockSize in meta) is refused loudly") {
    val idx = freshDir("wand_v1")
    Retrieval.writeTextIndex(skewed(10), "doc_id", "text", idx, nBuckets = 2)
    // rewrite the meta as version 1 (no blockSize) and drop the sidecar
    val metaFile = new java.io.File(s"$idx/_graft_text_index_meta.json")
    java.nio.file.Files.write(metaFile.toPath,
      """{"nBuckets": 2, "version": 1}""".getBytes("UTF-8"))
    // the local Hadoop FS keeps a sidecar checksum; drop it or the read
    // of the hand-edited meta fails on CRC, not on version
    new java.io.File(s"$idx/._graft_text_index_meta.json.crc").delete()
    val e = intercept[IllegalArgumentException](
      Retrieval.bm25WandAgainstIndex(spark, idx, Seq("spark"), 5))
    assert(e.getMessage.contains("predates block stats"))
    // plain probe still works on the same index
    assert(Retrieval.bm25AgainstIndex(spark, idx, Seq("spark"), 5)
      .count() > 0)
  }
}
