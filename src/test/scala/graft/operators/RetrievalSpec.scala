package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Lifecycle contracts for the BM25 inverted index
  * ([[Retrieval.writeTextIndex]] / append / probe / compact): the probe
  * must return EXACTLY what the one-shot [[Retrieval.bm25Rank]] returns
  * over the same corpus — including when the corpus reached the index
  * through split appends — plus the loud guards.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus: DataFrame = Seq(
    (0L, "a a b x"),
    (1L, "a c"),
    (2L, "b b b c y y"),
    (3L, "z z"),
    (4L, "a b a b c"),
    (5L, "")
  ).toDF("doc_id", "text")

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/idx"

  private def rows(df: DataFrame): Seq[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq

  test("index probe equals the one-shot ranking, write-only and write+append") {
    val q = Seq("a", "b")
    val direct = rows(Retrieval.bm25Rank(corpus, "doc_id", "text", q, 10))
    assert(direct.nonEmpty)

    val whole = freshDir("retr_whole")
    Retrieval.writeTextIndex(corpus, "doc_id", "text", whole, nBuckets = 4)
    assert(rows(Retrieval.bm25AgainstIndex(spark, whole, q, 10)) === direct)

    // the same corpus split across a build and two appends — per-batch
    // stats rows must SUM to the same N/avgdl and df must be additive
    val split = freshDir("retr_split")
    Retrieval.writeTextIndex(corpus.where($"doc_id" < 2), "doc_id", "text",
      split, nBuckets = 4)
    Retrieval.appendToTextIndex(corpus.where($"doc_id" >= 2 && $"doc_id" < 4),
      "doc_id", "text", split)
    Retrieval.appendToTextIndex(corpus.where($"doc_id" >= 4), "doc_id", "text",
      split)
    assert(rows(Retrieval.bm25AgainstIndex(spark, split, q, 10)) === direct)
  }

  test("compaction folds append partials and preserves probe results") {
    val q = Seq("a", "b", "c")
    val idx = freshDir("retr_cmp")
    Retrieval.writeTextIndex(corpus.where($"doc_id" % 2 === 0), "doc_id",
      "text", idx, nBuckets = 4)
    Retrieval.appendToTextIndex(corpus.where($"doc_id" % 2 === 1), "doc_id",
      "text", idx)
    val before = rows(Retrieval.bm25AgainstIndex(spark, idx, q, 10))
    val target = freshDir("retr_cmp_out")
    Retrieval.compactTextIndex(spark, idx, target)
    assert(rows(Retrieval.bm25AgainstIndex(spark, target, q, 10)) === before)
    assert(before === rows(Retrieval.bm25Rank(corpus, "doc_id", "text", q, 10)))
  }

  test("an empty build is legal; probing it returns no rows") {
    val idx = freshDir("retr_empty")
    Retrieval.writeTextIndex(corpus.where($"doc_id" < 0), "doc_id", "text",
      idx, nBuckets = 4)
    assert(Retrieval.bm25AgainstIndex(spark, idx, Seq("a"), 5).count() === 0L)
  }

  test("guards fail loud: missing index, nested compact target, bad inputs") {
    val none = intercept[IllegalArgumentException](
      Retrieval.bm25AgainstIndex(spark, freshDir("retr_none"), Seq("a"), 5))
    assert(none.getMessage.contains("writeTextIndex"))

    val idx = freshDir("retr_guard")
    Retrieval.writeTextIndex(corpus, "doc_id", "text", idx, nBuckets = 4)
    val nested = intercept[IllegalArgumentException](
      Retrieval.compactTextIndex(spark, idx, idx + "/compacted"))
    assert(nested.getMessage.contains("disjoint"))

    intercept[IllegalArgumentException](
      Retrieval.bm25AgainstIndex(spark, idx, Nil, 5))
    intercept[IllegalArgumentException](
      Retrieval.bm25AgainstIndex(spark, idx, Seq("a"), 0))
    intercept[IllegalArgumentException](
      Retrieval.writeTextIndex(corpus.withColumn("doc_id",
        $"doc_id".cast("string")), "doc_id", "text", freshDir("retr_str"), 4))
  }

  test("streaming ingest: probes see each batch; replay leaves the index bit-identical") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val q = Seq("a", "b")
    val idx = freshDir("retr_stream")
    Retrieval.writeTextIndex(corpus.where($"doc_id" < 2), "doc_id", "text",
      idx, nBuckets = 4)

    val in = MemoryStream[(Long, String)]
    val sq = Retrieval.streamingTextIngest(in.toDF().toDF("doc_id", "text"),
      "doc_id", "text",
      idx, java.nio.file.Files.createTempDirectory("retr_ckpt").toString)
    try {
      in.addData((2L, "b b b c y y"), (3L, "z z"))
      sq.processAllAvailable()
      in.addData((4L, "a b a b c"), (5L, ""))
      sq.processAllAvailable()
    } finally sq.stop()
    val direct = rows(Retrieval.bm25Rank(corpus, "doc_id", "text", q, 10))
    assert(rows(Retrieval.bm25AgainstIndex(spark, idx, q, 10)) === direct)

    // a crash-replay of batch 1 OVERWRITES its own subtree — no duplicate
    // postings, no double-counted stats
    Retrieval.ingestTextBatch(
      corpus.where($"doc_id" >= 4), "doc_id", "text", idx,
      queryTag = streamQueryTag(idx), batchId = 1L)
    assert(rows(Retrieval.bm25AgainstIndex(spark, idx, q, 10)) === direct)

    // compaction folds base + subtrees and keeps results
    val target = freshDir("retr_stream_cmp")
    Retrieval.compactTextIndex(spark, idx, target)
    assert(rows(Retrieval.bm25AgainstIndex(spark, target, q, 10)) === direct)
  }

  test("regression: a crashed replay never unpublishes the batch it replays (stage-then-rename)") {
    // pre-fix shape (r14's delete-subtree-first order): a replay DELETED
    // the committed subtree before recomputing it, so a crash mid-replay
    // left the batch silently absent from every probe until the next
    // replay. Post-fix, the replay stages into `<dir>.tmp` and the
    // committed subtree survives any crash before the final rename.
    val q = Seq("a", "b")
    val idx = freshDir("retr_crash")
    Retrieval.writeTextIndex(corpus.where($"doc_id" < 2), "doc_id", "text",
      idx, nBuckets = 4)
    Retrieval.ingestTextBatch(corpus.where($"doc_id" >= 2), "doc_id", "text",
      idx, queryTag = "qcrash", batchId = 0L)
    val committed = rows(Retrieval.bm25AgainstIndex(spark, idx, q, 10))
    assert(committed === rows(Retrieval.bm25Rank(corpus, "doc_id", "text", q, 10)))

    // replay batch 0 with a batch whose evaluation explodes mid-write —
    // the crash-in-the-middle a restart produces
    val bomb = org.apache.spark.sql.functions.udf((s: String) => {
      if (s != null) throw new RuntimeException("kaboom"); s
    })
    val crashing = corpus.where($"doc_id" >= 2)
      .select($"doc_id", bomb($"text").as("text"))
    intercept[Exception](Retrieval.ingestTextBatch(crashing, "doc_id", "text",
      idx, queryTag = "qcrash", batchId = 0L))
    assert(rows(Retrieval.bm25AgainstIndex(spark, idx, q, 10)) === committed,
      "a crashed replay must leave the previously committed batch visible")

    // the healing replay republishes bit-equivalent results and clears
    // the stage
    Retrieval.ingestTextBatch(corpus.where($"doc_id" >= 2), "doc_id", "text",
      idx, queryTag = "qcrash", batchId = 0L)
    assert(rows(Retrieval.bm25AgainstIndex(spark, idx, q, 10)) === committed)
    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(
      spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      IndexLifecycle.ingestBatchDir(idx, "qcrash", 0L) +
        IndexLifecycle.TmpSuffix)),
      "the healing replay must clear the crashed stage")
  }

  /** The one live queryTag under the index's _ingest dir (this spec runs
    * a single streaming query per index).
    */
  private def streamQueryTag(idx: String): String = {
    val root = new org.apache.hadoop.fs.Path(idx, "_ingest")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val tags = fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName)
    assert(tags.length === 1, tags.toSeq)
    tags.head
  }

  test("batch probe equals per-query single probes; loud on bad batches") {
    val idx = freshDir("retr_batch")
    Retrieval.writeTextIndex(corpus, "doc_id", "text", idx, nBuckets = 4)
    val batch = Seq((1L, "a"), (1L, "b"), (1L, "b"), (2L, "c"), (2L, "nosuch"))
      .toDF("query_id", "term")
    val got = Retrieval.bm25BatchAgainstIndex(spark, idx, batch,
        "query_id", "term", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getInt(3))).toMap
    for ((qid, terms) <- Seq(1L -> Seq("a", "b"), 2L -> Seq("c", "nosuch"))) {
      val single = rows(Retrieval.bm25AgainstIndex(spark, idx, terms, 10))
      assert(single.nonEmpty)
      single.foreach { case (doc, sc, rk) =>
        assert(got((qid, doc)) == (sc, rk), s"query $qid doc $doc")
      }
      assert(got.keys.count(_._1 == qid) == single.size, s"query $qid size")
    }
    intercept[IllegalArgumentException](Retrieval.bm25BatchAgainstIndex(
      spark, idx, Seq((1L, "")).toDF("query_id", "term"),
      "query_id", "term", 10))
    intercept[IllegalArgumentException](Retrieval.bm25BatchAgainstIndex(
      spark, idx,
      Seq((Option.empty[Long], "a")).toDF("query_id", "term"),
      "query_id", "term", 10))
  }

  test("rrf fusion: exact contributions, missing docs contribute nothing, ties on id") {
    // k = 60: rank 1 -> 10^9/61 = 16393442, rank 2 -> 16129032, rank 3 -> 15873015
    val a = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("doc_id", "rank")
    val b = Seq((11L, 1), (12L, 2)).toDF("doc_id", "rank") // 10 missing here
    val got = rows(Retrieval.rrfFuse(Seq(a, b), n = 10))
    val exp = Seq(
      (11L, 16129032L + 16393442L, 1), // rank2 + rank1
      (12L, 15873015L + 16129032L, 2), // rank3 + rank2
      (10L, 16393442L, 3))             // only list a
    assert(got === exp)
    // a perfect score tie breaks on doc_id
    val t1 = Seq((5L, 1), (7L, 2)).toDF("doc_id", "rank")
    val t2 = Seq((7L, 1), (5L, 2)).toDF("doc_id", "rank")
    assert(rows(Retrieval.rrfFuse(Seq(t1, t2), 10)).map(r => (r._1, r._3)) ===
      Seq((5L, 1), (7L, 2)))
    intercept[IllegalArgumentException](Retrieval.rrfFuse(Seq(a), 10))
    intercept[IllegalArgumentException](Retrieval.rrfFuse(
      Seq(a, b.withColumnRenamed("rank", "r")), 10))
  }

  test("batch rrf equals per-query rrfFuse; contract guards fire") {
    import org.apache.spark.sql.functions.{col, lit}
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 11L, 1), (2L, 12L, 2))
      .toDF("query_id", "doc_id", "rank")
    val ann = Seq((1L, 11L, 1), (1L, 12L, 2), (2L, 12L, 1))
      .toDF("query_id", "doc_id", "rank")
    val batch = Retrieval.rrfFuseBatch(Seq(lex, ann), n = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    val single = Seq(1L, 2L).flatMap { q =>
      Retrieval.rrfFuse(
        Seq(lex.where(col("query_id") === q).drop("query_id"),
          ann.where(col("query_id") === q).drop("query_id")), n = 10)
        .collect().map(r => (q, r.getLong(0), r.getLong(1), r.getInt(2)))
    }.toSet
    assert(batch === single)

    val e = intercept[IllegalArgumentException](
      Retrieval.rrfFuseBatch(Seq(lex.drop("query_id"), ann), 10))
    assert(e.getMessage.contains("query_id"))
    val e2 = intercept[IllegalArgumentException](
      Retrieval.rrfFuseBatch(Seq(lex), 10))
    assert(e2.getMessage.contains("at least two"))
  }

  test("query terms absent from the index rank nothing but break nothing") {
    val idx = freshDir("retr_absent")
    Retrieval.writeTextIndex(corpus, "doc_id", "text", idx, nBuckets = 4)
    val got = rows(Retrieval.bm25AgainstIndex(spark, idx,
      Seq("nosuchterm", "b"), 10))
    val direct = rows(Retrieval.bm25Rank(corpus, "doc_id", "text",
      Seq("nosuchterm", "b"), 10))
    assert(got === direct && got.nonEmpty)
  }
}
