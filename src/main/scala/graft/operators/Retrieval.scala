package graft.operators

import graft.functions.Md5Prefix32

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BM25 retrieval (Robertson et al., TREC-3; the Lucene
  * `ln(1 + (N - df + 0.5)/(df + 0.5))` idf form, positive for every df):
  * one-shot corpus ranking plus a PERSISTED inverted index with the same
  * write / append / probe / compact lifecycle as the MinHash signature,
  * SemDeDup, line-frequency, and image-hash indexes — so a retrieval
  * corpus is tokenized ONCE and every query afterwards reads only the
  * term-bucket partitions it probes.
  *
  * Engine-exactness contract (shared by both paths): each (doc, term)
  * partial score is quantized to integer MICRO-UNITS (`floor(score·1e6)`)
  * BEFORE the per-doc sum — float sums are order-dependent and Spark's
  * aggregation order is not DuckDB's, but integer sums commute. The score
  * expression itself is written in the exact same IEEE operation order on
  * both engines; the one libm call (`ln`) agrees in practice and any
  * last-ulp wobble only matters on an exact micro-unit boundary.
  *
  * Reference anchor: the reference ships no retrieval operator — this is
  * part of the training-data-pipeline charter (similarity search over
  * text, the sparse complement of the ANN family in Similarity.scala).
  */
object Retrieval {

  /** The shared Okapi scorer: micro-unit quantized partial for one
    * (doc, term) — `tf`/`df`/`dl` integral columns, `n` the corpus doc
    * count (long), `avgdl` double. Both the one-shot and the index path
    * emit EXACTLY this expression so their results are bit-identical.
    */
  private def scoreQ(tf: Column, df: Column, dl: Column, n: Column,
      avgdl: Column, k1: Double, b: Double): Column =
    floor(
      log(lit(1.0) + (n - df + lit(0.5)) / (df + lit(0.5))) *
        (tf * lit(k1 + 1)) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * dl / avgdl)) *
        lit(1000000)).cast("long")

  /** Tokens of `textCol` under `tok` (default: the house single-space
    * rule — byte-identical to every pre-tokenizer oracle entry). Typed
    * API, not an `expr` string — a column name with dots/backticks must
    * resolve, not parse.
    */
  private def tokens(textCol: String, tok: Tokenizer): Column =
    tok.column(col(textCol))

  private def topN(scored: DataFrame, n: Int): DataFrame = {
    // global top-n plans as TakeOrderedAndProject — no single-partition
    // sort of the full ranking; the rank window then runs over n rows
    val top = scored
      .groupBy(col("doc_id"))
      .agg(sum(col("__sq")).as("bm25_q"))
      .orderBy(col("bm25_q").desc, col("doc_id").asc)
      .limit(n)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("bm25_q").desc, col("doc_id").asc)))
  }

  /** Query contract: a bag of DISTINCT terms — repeats are a set test
    * here, not a double weight (state a repeated term once; classic BM25
    * query-side tf weighting is out of scope for both paths equally).
    */
  private def requireQuery(queryTerms: Seq[String], n: Int, op: String): Unit = {
    require(queryTerms.nonEmpty, s"$op: query must name at least one term")
    require(queryTerms.forall(t => t != null && t.nonEmpty),
      s"$op: query terms must be non-null and non-empty (the tokenizer " +
        "never emits either, so they cannot match)")
    require(n > 0, s"$op: n must be positive")
  }

  private def requireLongId(df: DataFrame, idCol: String, op: String): Unit =
    require(df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }, s"$op: id column '$idCol' must be integral (got " +
      s"${df.schema(idCol).dataType.simpleString}) — the index stores ids " +
      "as int64")

  /** One-shot BM25: rank `docs` against a bag-of-terms query, returning
    * the top `n` as (doc_id, bm25_q, rank) by (score desc, id asc).
    * Documents containing no query term never appear (inner semantics).
    *
    * Scale shape: the term filter lands right after the explode (map
    * side), so the tf aggregate shuffles only matching (doc, term) pairs;
    * df aggregates to ≤ |query| rows and broadcasts back; corpus stats
    * (N, avgdl) are ONE broadcast row; the doc-length join keys on the
    * id (AQE broadcasts at small SF, co-keyed shuffle at corpus scale).
    */
  def bm25Rank(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], n: Int,
      k1: Double = 1.2, b: Double = 0.75,
      tokenizer: Tokenizer = Tokenizer.House): DataFrame = {
    requireQuery(queryTerms, n, "bm25Rank")
    requireLongId(docs, idCol, "bm25Rank")
    val words = docs.select(col(idCol).cast("long").as("doc_id"),
      tokens(textCol, tokenizer).as("__w"))
    val dl = words.select(col("doc_id"), size(col("__w")).cast("long").as("__dl"))
    val stats = dl.agg(count(lit(1)).as("__n"),
      // the zero-doc guard never fires alongside a posting (no docs → no
      // postings), so the non-empty value path is the bare division
      when(count(lit(1)) === 0, lit(null).cast("double"))
        .otherwise(sum(col("__dl")).cast("double") / count(lit(1)))
        .as("__avgdl"))
    val tf = words
      .select(col("doc_id"), explode(col("__w")).as("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("__df"))
    topN(tf
      .join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("__sq", scoreQ(col("__tf"), col("__df"), col("__dl"),
        col("__n"), col("__avgdl"), k1, b)), n)
  }

  // ---- the persisted inverted index ----

  /** The index's fixed on-disk schema, supplied explicitly on every read
    * (an empty index reads as an empty frame; partition-value inference
    * never runs). Two row kinds share it:
    *  - POSTING rows: (term, doc_id, tf, dl) in partition
    *    `__tb = "b" + (md5_prefix32(term) mod nBuckets)`;
    *  - STATS rows: (term NULL, doc_id NULL, tf = batch doc count,
    *    dl = batch token total) in partition `__tb = "stats"` — ONE row
    *    per write/append, summed at probe time, so corpus N and avgdl
    *    ride the same atomic parquet write as the postings they describe
    *    (no separate mutable meta to drift).
    */
  private val indexSchema = StructType(Seq(
    StructField("term", StringType),
    StructField("doc_id", LongType),
    StructField("tf", LongType),
    StructField("dl", LongType),
    StructField("__tb", StringType)))

  private val StatsToken = "stats"

  /** Document-ordered posting blocks for WAND pruning: block =
    * floorDiv(doc_id, blockSize) — the SAME ranges for every term, which
    * is what makes a per-block upper bound a bound on a whole doc's score
    * (a doc's postings for all query terms live in its one block). 1024
    * docs per block keeps the stats sidecar ~1000× smaller than postings.
    */
  private[operators] val DefaultBlockSize = 1024L

  private val BlockStatsDirName = "_block_stats"

  /** Per-(term, block) bound ingredients. The score is increasing in tf
    * and decreasing in dl, so (max tf, min dl) UPPER-bounds every posting
    * in the block and (min tf, max dl) LOWER-bounds it; n_docs sums to
    * the term's EXACT df (one posting per (doc, term) across the index
    * lifetime — the append contract).
    *
    * `min_tf`/`max_dl` are the round-16 additions powering the batch
    * probe's ONE-PASS pruning (a θ lower bound derived from the sidecar
    * alone — no seed-scoring job). Sidecars written before them read as
    * NULL under this explicit schema; the probe then simply derives no
    * lower bound from those rows (upper-bound pruning semantics are
    * unchanged), so old indexes stay exact, just unpruned on the batch
    * path until a compact regenerates the sidecar.
    */
  private val blockStatsSchema = StructType(Seq(
    StructField("term", StringType),
    StructField("block", LongType),
    StructField("max_tf", LongType),
    StructField("min_dl", LongType),
    StructField("n_docs", LongType),
    StructField("min_tf", LongType),
    StructField("max_dl", LongType),
    StructField("__tb", StringType)))

  /** floorDiv(doc_id, size) in pure long arithmetic: subtract the
    * non-negative pmod, then exact integral division (`div` truncation ==
    * floor when the division is exact) — no double roundtrip, so ids
    * anywhere in the long range block correctly.
    */
  private def blockOf(docId: Column, size: Long): Column =
    call_function("div", docId - pmod(docId, lit(size)), lit(size))

  private def blockStatsOf(postings: DataFrame, blockSize: Long): DataFrame =
    postings
      .groupBy(col("term"), blockOf(col("doc_id"), blockSize).as("block"),
        col("__tb"))
      .agg(max(col("tf")).as("max_tf"), min(col("dl")).as("min_dl"),
        count(lit(1)).as("n_docs"),
        min(col("tf")).as("min_tf"), max(col("dl")).as("max_dl"))
      .select("term", "block", "max_tf", "min_dl", "n_docs",
        "min_tf", "max_dl", "__tb")

  private def bucketToken(term: Column, nBuckets: Int): Column =
    concat(lit("b"), pmod(Md5Prefix32.md5Prefix32(term), lit(nBuckets.toLong)))

  /** Driver-side twin of [[bucketToken]] — must produce identical tokens. */
  private def bucketTokenOf(term: String, nBuckets: Int): String =
    "b" + java.lang.Math.floorMod(
      Md5Prefix32.hash(term.getBytes("UTF-8")), nBuckets.toLong)

  private val MetaFileName = "_graft_text_index_meta.json"

  private def writeMeta(spark: SparkSession, path: String, nBuckets: Int,
      blockSize: Long = DefaultBlockSize,
      tokenizer: Tokenizer = Tokenizer.House): Unit =
    IndexLifecycle.writeMeta(spark, path, MetaFileName,
      s"""{"nBuckets": $nBuckets, "blockSize": $blockSize, """ +
        s""""tok": "${tokenizer.tag}", "version": 2}""")

  /** The tokenizer the index was BUILT with — appends and ingests must
    * match it or postings drift ("house" when the meta predates the
    * field).
    */
  private def readTokenizer(spark: SparkSession, path: String,
      op: String): Tokenizer =
    IndexLifecycle.strField(
      IndexLifecycle.requireMeta(spark, path, MetaFileName, op,
        "writeTextIndex"), "tok")
      .map(Tokenizer.fromTag(_, op)).getOrElse(Tokenizer.House)

  private def readMeta(spark: SparkSession, path: String, op: String): Int = {
    val txt = IndexLifecycle.requireMeta(spark, path, MetaFileName, op,
      "writeTextIndex")
    IndexLifecycle.longField(txt, "nBuckets").map(_.toInt).getOrElse(
      throw new IllegalArgumentException(
        s"$op: malformed text index meta at $path: $txt"))
  }

  /** The block width recorded at build time; None for a pre-block-stats
    * (version 1) index — the WAND probe refuses those loudly.
    */
  private def readBlockSize(spark: SparkSession, path: String,
      op: String): Option[Long] =
    IndexLifecycle.longField(
      IndexLifecycle.requireMeta(spark, path, MetaFileName, op,
        "writeTextIndex"),
      "blockSize")

  /** The batch's per-document token counts in ONE fused pass
    * ([[graft.functions.TokenTf]]): `__t = struct(dl, tfs)` — a doc's
    * (term, tf) multiset depends only on its own text, so computing it
    * row-local removes both the token-occurrence explode AND the
    * `groupBy(doc_id, dl, term)` count Exchange the r1–r18 build paid
    * (guide §2.4: that shuffle carried every distinct (doc, term) pair
    * of the corpus purely to count occurrences that were already
    * co-located in the document row). Value-exactness of the counts is
    * locked by `TokenTfSpec` against the explode/groupBy form on the
    * real corpus under every tokenizer tag; the oracle entries gate the
    * end-to-end postings. Callers persist THIS frame (compact: one row
    * per doc) so postings, the stats row, and the block-stats sidecar
    * all derive from a single tokenize pass.
    */
  private def tokenBase(docs: DataFrame, idCol: String, textCol: String,
      tokenizer: Tokenizer): DataFrame = {
    Md5Prefix32.register(docs.sparkSession) // idempotent; bare sessions lack it
    docs.select(col(idCol).cast("long").as("doc_id"),
      graft.functions.TokenTf.tokenTf(col(textCol), tokenizer.tag).as("__t"))
  }

  /** Postings rows off [[tokenBase]] — a pure map-side projection:
    * explode the per-doc (term, tf) entries (≤ distinct terms per doc,
    * never per-occurrence rows) and attach the bucket token. NULL-text
    * docs drop out here (explode of the NULL struct's field), exactly
    * like the old explode-of-NULL-array.
    */
  private def postingsOf(base: DataFrame, nBuckets: Int): DataFrame =
    base
      .select(col("doc_id"), col("__t.dl").as("dl"),
        explode(col("__t.tfs")).as("__p"))
      .select(col("__p.term").as("term"), col("doc_id"),
        col("__p.tf").as("tf"), col("dl"),
        bucketToken(col("__p.term"), nBuckets).as("__tb"))

  /** The batch's ONE stats row (doc count + token total) off
    * [[tokenBase]] — same aggregate the old union's second corpus pass
    * computed, now over the persisted per-doc frame.
    */
  private def statsRowOf(base: DataFrame): DataFrame =
    base
      .agg(count(lit(1)).as("tf"), sum(col("__t.dl")).as("dl"))
      .select(lit(null).cast(StringType).as("term"),
        lit(null).cast(LongType).as("doc_id"),
        col("tf"), coalesce(col("dl"), lit(0L)).as("dl"),
        lit(StatsToken).as("__tb"))

  /** Build the index: postings partitioned by term bucket (probes prune
    * statically to their query terms' buckets), salt-clustered and
    * term-sorted within each partition so row groups carry tight min/max
    * for the residual term filter.
    */
  def writeTextIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int = 64,
      blockSize: Long = DefaultBlockSize,
      tokenizer: Tokenizer = Tokenizer.House): Unit = {
    require(nBuckets > 0, s"writeTextIndex: nBuckets must be positive, got $nBuckets")
    require(blockSize > 0, s"writeTextIndex: blockSize must be positive, got $blockSize")
    requireLongId(docs, idCol, "writeTextIndex")
    // the per-doc token counts persist (ONE tokenize pass, r19); the
    // postings/stats/sidecar branches are map-side projections off it
    val base = tokenBase(docs, idCol, textCol, tokenizer)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val postings = postingsOf(base, nBuckets)
      IndexLifecycle.clusterForPartitionedWrite(
          postings.unionByName(statsRowOf(base)), "__tb",
          sortCols = Seq("term"))
        .write.mode("overwrite").partitionBy("__tb").parquet(path)
      // one aggregation over the SAME materialized tokenization — the
      // corpus is never tokenized twice for the stats sidecar
      blockStatsOf(postings, blockSize)
        .write.mode("overwrite").partitionBy("__tb")
        .parquet(s"$path/$BlockStatsDirName")
    } finally base.unpersist()
    writeMeta(docs.sparkSession, path, nBuckets, blockSize, tokenizer)
  }

  /** APPEND a new batch of documents. CONTRACT: each document is appended
    * at most once across the index's lifetime (the natural ingest-loop
    * shape) — re-appending duplicates postings, inflating that term's df
    * and the doc's score contributions. One parquet write carries both
    * the postings and the batch's stats row.
    */
  def appendToTextIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    requireLongId(docs, idCol, "appendToTextIndex")
    val nBuckets = readMeta(docs.sparkSession, path, "appendToTextIndex")
    val blockSize = readBlockSize(docs.sparkSession, path, "appendToTextIndex")
    val base = tokenBase(docs, idCol, textCol,
      readTokenizer(docs.sparkSession, path, "appendToTextIndex"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val postings = postingsOf(base, nBuckets)
      // sidecar FIRST: a crash between the two writes then leaves an
      // OVER-complete sidecar (rows for postings that never landed) —
      // harmless to the WAND probe (phantom blocks bound rows that don't
      // exist; scoring df comes from the postings). The reverse order
      // would leave postings whose blocks the bounds never see —
      // unconditionally pruned, silently wrong. A batch's (term, block)
      // rows append alongside earlier ones; the probe re-aggregates
      // (max, min, sum) across writes.
      blockSize.foreach { bs =>
        blockStatsOf(postings, bs)
          .write.mode("append").partitionBy("__tb")
          .parquet(s"$path/$BlockStatsDirName")
      }
      postings.unionByName(statsRowOf(base))
        .write.mode("append").partitionBy("__tb").parquet(path)
    } finally base.unpersist()
  }

  // ---- streaming ingest: idempotent per-batch subtrees under _ingest ----
  // (layout, listing, and query tags are [[IndexLifecycle]]'s; a replayed
  // batch OVERWRITES its own subtree instead of appending duplicate
  // postings — the crash-replay hole the plain [[appendToTextIndex]]
  // contract leaves open is closed on this path)

  private def ingestBatchDir(path: String, queryTag: String,
      batchId: Long): String =
    IndexLifecycle.ingestBatchDir(path, queryTag, batchId)

  /** One streaming microbatch — exposed for direct spec-level replay
    * testing; [[streamingTextIngest]] wires it into `foreachBatch`.
    * Overwrites the batch's own subtree with its postings + stats row,
    * so a replay after a crash leaves the index bit-identical.
    */
  private[operators] def ingestTextBatch(batch: DataFrame, idCol: String,
      textCol: String, indexPath: String, queryTag: String,
      batchId: Long): Unit = {
    requireLongId(batch, idCol, "ingestTextBatch")
    val nBuckets = readMeta(batch.sparkSession, indexPath, "ingestTextBatch")
    val blockSize = readBlockSize(batch.sparkSession, indexPath, "ingestTextBatch")
    IndexLifecycle.requireBatchIdFresh(batch.sparkSession, indexPath,
      queryTag, batchId, "ingestTextBatch")
    val dir = ingestBatchDir(indexPath, queryTag, batchId)
    val base = tokenBase(batch, idCol, textCol,
      readTokenizer(batch.sparkSession, indexPath, "ingestTextBatch"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val postings = postingsOf(base, nBuckets)
      // replay idempotence + the sidecar-FIRST invariant (the
      // appendToTextIndex rule: every observable state is sidecar ≥
      // postings, where over-complete is harmless — phantom blocks bound
      // rows that don't exist; scoring df comes from the postings). Both
      // writes STAGE into the subtree's `.tmp` sibling (invisible to
      // probes — listIngestDirs skips the suffix) and publish by
      // delete+rename ([[IndexLifecycle.writeViaTmp]]): a replay after a
      // crash overwrites its own stage and republished bit-identical;
      // probes never see a half-written subtree, and the only window
      // where a previously-committed batch is absent is the two metadata
      // ops, not the full recompute+rewrite. On a store with NON-atomic
      // rename (object stores), a torn publish exposes a partial subtree;
      // the probes stay fail-safe in EVERY partial state (TornPublishSpec
      // walks all tear points in both copy orders): committed batches are
      // never under-read, and the WAND probe is exact while the partial
      // sidecar is visible (phantom rows only weaken bounds) and refuses
      // LOUDLY via the _block_stats guard when postings landed
      // sidecar-less — never silently wrong; the batch's replay repairs
      // the subtree bit-identically.
      IndexLifecycle.writeViaTmp(batch.sparkSession, dir) { tmp =>
        blockSize.foreach { bs =>
          blockStatsOf(postings, bs)
            .write.mode("overwrite").partitionBy("__tb")
            .parquet(s"$tmp/$BlockStatsDirName")
        }
        postings.unionByName(statsRowOf(base))
          .write.mode("append").partitionBy("__tb").parquet(tmp)
      }
    } finally base.unpersist()
  }

  /** Live-ingest loop for the inverted index — the retrieval member of
    * the streaming-index family (`Dedup.streamingIngest`,
    * `Similarity.streamingSemIngest`, `Boilerplate.streamingLineIngest`):
    * each trigger's documents land as one idempotent subtree that every
    * later probe unions in. Build the base first with [[writeTextIndex]]
    * (an empty build is legal); [[compactTextIndex]] folds accumulated
    * subtrees back into one base layout. The query tag derives from the
    * QUALIFIED checkpoint path so a restarted query lands replayed
    * batches on the same subtrees.
    */
  def streamingTextIngest(stream: DataFrame, idCol: String, textCol: String,
      indexPath: String, checkpointDir: String,
      maxLiveSubtrees: Int = 0): org.apache.spark.sql.streaming.StreamingQuery = {
    val queryTag = IndexLifecycle.queryTagOf(stream.sparkSession, checkpointDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        maybeCompactTextIngest(batch.sparkSession, indexPath, queryTag,
          batchId, maxLiveSubtrees)
        ingestTextBatch(batch.toDF(), idCol, textCol, indexPath, queryTag,
          batchId)
      }
      .start()
  }

  /** The loop's `maxLiveSubtrees` trigger ([[IndexLifecycle
    * .compactOwnSubtrees]] mechanics, probe-equality guaranteed by
    * row-identical union): the query's accumulated subtrees fold into one
    * — postings under the base clustered layout, the `_block_stats`
    * sidecar staged FIRST inside the same subtree (the appendToTextIndex
    * invariant: every observable state is sidecar ≥ postings). 0 disables.
    */
  private[operators] def maybeCompactTextIngest(spark: SparkSession,
      indexPath: String, queryTag: String, batchId: Long,
      maxLiveSubtrees: Int): Boolean =
    maxLiveSubtrees > 0 &&
      IndexLifecycle.compactOwnSubtrees(spark, indexPath, queryTag, batchId,
          maxLiveSubtrees) { (sources, tmp) =>
        // meta read only when a fold actually runs — not one meta-file
        // read per trigger (the loop's own once-per-query rule)
        val sidecars = readBlockSize(spark, indexPath,
          "streamingTextIngest").isDefined
        val conf = spark.sessionState.newHadoopConf()
        if (sidecars) {
          val withSide = sources.filter { s =>
            val p = new org.apache.hadoop.fs.Path(s, BlockStatsDirName)
            p.getFileSystem(conf).exists(p)
          }
          val side =
            if (withSide.isEmpty)
              spark.createDataFrame(
                spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                blockStatsSchema)
            else withSide.map(s => spark.read.schema(blockStatsSchema)
              .parquet(s"$s/$BlockStatsDirName")).reduce(_ unionByName _)
          IndexLifecycle.clusterForPartitionedWrite(side, "__tb",
              sortCols = Seq("term"))
            .write.mode("overwrite").partitionBy("__tb")
            .parquet(s"$tmp/$BlockStatsDirName")
        }
        val posts = sources.map(s => spark.read.schema(indexSchema)
          .parquet(s)).reduce(_ unionByName _)
        // append, not overwrite: the sidecar already lives under tmp
        IndexLifecycle.clusterForPartitionedWrite(posts, "__tb",
            sortCols = Seq("term"))
          .write.mode("append").partitionBy("__tb").parquet(tmp)
      }

  /** Query the PERSISTED index: reads ONLY the query terms' bucket
    * partitions plus the stats partition — across the base layout AND
    * every streaming-ingest subtree — the corpus is never scanned.
    * Returns exactly what [[bm25Rank]] over the indexed corpus returns
    * (same scorer, same quantization, same tie rule).
    */
  def bm25AgainstIndex(spark: SparkSession, path: String,
      queryTerms: Seq[String], n: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    requireQuery(queryTerms, n, "bm25AgainstIndex")
    val nBuckets = readMeta(spark, path, "bm25AgainstIndex")
    val tks = (queryTerms.map(bucketTokenOf(_, nBuckets)).distinct :+ StatsToken)
    val rows = IndexLifecycle.liveRoots(spark, path)
      .map(r => spark.read.schema(indexSchema).parquet(r))
      .reduce(_ unionByName _)
      .filter(col("__tb").isInCollection(tks))
    val stats = rows.where(col("term").isNull)
      .agg(sum(col("tf")).as("__n"),
        // an index built/appended only from empty batches has N = 0 (and
        // no postings); guard the 0/0 — the non-empty path is the bare
        // division, identical to bm25Rank's
        when(coalesce(sum(col("tf")), lit(0L)) === 0, lit(null).cast("double"))
          .otherwise(sum(col("dl")).cast("double") / sum(col("tf")))
          .as("__avgdl"))
    val posts = rows
      .where(col("term").isNotNull && col("term").isin(queryTerms: _*))
      .select(col("term"), col("doc_id"), col("tf").as("__tf"),
        col("dl").as("__dl"))
    val dfreq = posts.groupBy("term").agg(count(lit(1)).as("__df"))
    topN(posts
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__sq", scoreQ(col("__tf"), col("__df"), col("__dl"),
        col("__n"), col("__avgdl"), k1, b)), n)
  }

  /** Block-max WAND probe (Broder et al. CIKM'03; Ding & Suel SIGIR'11,
    * re-expressed as a stats pre-filter): identical output to
    * [[bm25AgainstIndex]] — same scorer, quantization, tie rule — but the
    * posting scan is PRUNED to doc-id block ranges whose score upper
    * bound can still reach the top-n.
    *
    * How: the index sidecar (`_block_stats`, written with the postings)
    * stores (max tf, min dl, doc count) per (term, doc-block). The score
    * is increasing in tf and decreasing in dl and df, so
    * `scoreQ(max_tf, df, min_dl)` bounds every posting in the block, and
    * because blocks are the SAME doc-id ranges for every term, the
    * per-block sum of term bounds bounds ANY document's total score in
    * that range. The probe then:
    *   1. computes per-block upper bounds from the stats ONLY (the
    *      sidecar is ~blockSize× smaller than postings, bucket-pruned to
    *      the query terms);
    *   2. exact-scores a SEED prefix — the highest-bound blocks holding
    *      at least n docs — giving θ, a lower bound on the true n-th
    *      best score (every doc's true score ≥ its seed-subset score);
    *   3. keeps only blocks with bound ≥ θ (≥, not >: a pruned doc must
    *      be STRICTLY below the n-th score or it could win a doc-id
    *      tie) and exact-scores their postings.
    * Every document in a pruned block scores < θ ≤ the n-th best, so the
    * result is EXACTLY the unpruned ranking. df comes from the UNPRUNED
    * postings (a 1-column bucket-pruned count — the plain probe's own
    * number), never from the pruned postings and never from the sidecar:
    * postings-df keeps scoring parity even when a crash between an
    * append's two writes leaves the sidecar over-complete, where the
    * phantom rows only weaken bounds, never correctness.
    *
    * Degradation is graceful and loud-free: if more than `maxSurvivors`
    * blocks survive (low-discrimination corpora — e.g. uniform
    * duplicates — or tiny θ), the prune filter is skipped and the probe
    * IS [[bm25AgainstIndex]] plus one tiny stats job. Indexes built
    * before block stats existed (version-1 meta) are refused loudly —
    * rebuild or [[compactTextIndex]] to upgrade.
    *
    * Scale shape: stats jobs touch the sidecar only; the driver collects
    * seed ids (≤ ~n rows), θ (n rows), and survivor ids (≤ maxSurvivors)
    * — never postings. The posting scan carries a doc-block `isin` filter
    * on top of the same bucket pruning as the plain probe; postings
    * within a partition are (term, doc_id)-sorted at write time, so row
    * groups carry tight min/max for BOTH the term and the derived-range
    * skipping.
    */
  def bm25WandAgainstIndex(spark: SparkSession, path: String,
      queryTerms: Seq[String], n: Int,
      k1: Double = 1.2, b: Double = 0.75,
      maxSurvivors: Int = 65536, seedBoost: Int = 32): DataFrame =
    bm25WandWithPlan(spark, path, queryTerms, n, k1, b, maxSurvivors,
      seedBoost)._1

  /** What the pruner decided — surfaced for measurement and ops
    * observability (SCALE.md's scanned-postings rows come from here).
    * `survivors = None` means the prune was skipped (degraded to the
    * plain probe's scan).
    */
  private[graft] final case class WandPlan(blockSize: Long,
      totalBlocks: Long, seedBlocks: Long, theta: Option[Long],
      survivors: Option[Seq[Long]],
      // two-tier observability: rows the tier-one (seed-prefix) collect
      // brought to the driver (≤ seedBoost·n by construction) and whether
      // the bounded survivor-extension job had to run (θ at or below the
      // prefix's minimum bound — uniform-bounds corpora)
      planeRows: Long = 0L, extended: Boolean = false)

  /** ONE bucket-pruned postings pass collecting df-per-term and the
    * corpus (N, avgdl) stats row (the null-term group IS the stats row),
    * re-injected as LOCAL relations so no later action in a multi-job
    * probe recomputes them — the r15 WAND-plane fusion's shared core.
    * Arithmetic matches the plain probe's aggregates exactly: df =
    * posting-row count per term, __n = Σtf of the stats rows, __avgdl =
    * Σdl / Σtf (double division), NULL when the index holds no documents.
    */
  private def collectScoringPlane(spark: SparkSession, rows: DataFrame,
      terms: Seq[String]): (DataFrame, DataFrame) = {
    val aggRows = rows
      .where(col("term").isNull || col("term").isin(terms: _*))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("__c"), sum(col("tf")).as("__stf"),
        sum(col("dl")).as("__sdl"))
      .collect()
    val statsRow = aggRows.find(_.isNullAt(0)) // fields: term, __c, __stf, __sdl
    // a NULL Σtf stays NULL (sum over all-NULL tf) — arithmetic-identical
    // to the aggregate this plane replaced, which propagated NULL scores
    // rather than computing idf against N=0
    val nOpt: Option[Long] = statsRow.flatMap(r =>
      if (r.isNullAt(2)) None else Some(r.getLong(2)))
    val avgOpt: Option[Double] = statsRow.collect {
      case r if !r.isNullAt(2) && r.getLong(2) != 0L && !r.isNullAt(3) =>
        r.getLong(3).toDouble / r.getLong(2)
    }
    val stats = spark.createDataFrame(
      java.util.Collections.singletonList(org.apache.spark.sql.Row(
        nOpt.map(java.lang.Long.valueOf).orNull,
        avgOpt.map(java.lang.Double.valueOf).orNull)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__n",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("__avgdl",
          org.apache.spark.sql.types.DoubleType))))
    val dfreq = {
      import spark.implicits._
      aggRows.filter(!_.isNullAt(0))
        .map(r => (r.getString(0), r.getLong(1))).toSeq
        .toDF("term", "__df")
    }
    (dfreq, stats)
  }

  private[graft] def bm25WandWithPlan(spark: SparkSession, path: String,
      queryTerms: Seq[String], n: Int,
      k1: Double = 1.2, b: Double = 0.75,
      maxSurvivors: Int = 65536, seedBoost: Int = 32,
      collectStats: Boolean = false): (DataFrame, WandPlan) = {
    require(seedBoost >= 1, s"bm25WandAgainstIndex: seedBoost must be >= 1, got $seedBoost")
    requireQuery(queryTerms, n, "bm25WandAgainstIndex")
    val nBuckets = readMeta(spark, path, "bm25WandAgainstIndex")
    val blockSize = readBlockSize(spark, path, "bm25WandAgainstIndex")
      .getOrElse(throw new IllegalArgumentException(
        s"bm25WandAgainstIndex: index at $path predates block stats " +
          "(version-1 meta) — rebuild with writeTextIndex or upgrade via " +
          "compactTextIndex"))
    val roots = IndexLifecycle.liveRoots(spark, path)
    val tks = queryTerms.map(bucketTokenOf(_, nBuckets)).distinct
    locally { // every root must carry the sidecar, or bounds under-count
      val conf = spark.sessionState.newHadoopConf()
      roots.foreach { r =>
        val p = new org.apache.hadoop.fs.Path(r, BlockStatsDirName)
        require(p.getFileSystem(conf).exists(p),
          s"bm25WandAgainstIndex: $r has no $BlockStatsDirName sidecar " +
            "(written before block stats existed?) — compactTextIndex " +
            "the index to regenerate it")
      }
    }

    // ---- stats-only plane: bounds, seeds, θ, survivors ----
    // The plane costs TWO fixed jobs total (was four before the r15
    // fusion, each recomputing the df/stats aggregation): (1) one
    // bucket-pruned postings aggregation collecting df-per-term and the
    // corpus (N, avgdl) — |terms|+1 driver rows, re-injected as LOCAL
    // relations so no later action recomputes them; (2) one sidecar
    // TakeOrdered collecting the top seedBoost·n blocks by upper bound,
    // which serves BOTH the seed-prefix selection and (post-θ, whenever
    // the prefix provably covers every clearing block — the typical
    // probe) the survivor filter. A third bounded sidecar job runs ONLY
    // when θ falls at or below the prefix's minimum bound, and then
    // collects only the clearing blocks (≤ maxSurvivors+1).
    val bstats = roots
      .map(r => spark.read.schema(blockStatsSchema)
        .parquet(s"$r/$BlockStatsDirName"))
      .reduce(_ unionByName _)
      .filter(col("__tb").isInCollection(tks) &&
        col("term").isin(queryTerms: _*))
      .groupBy(col("term"), col("block")) // merge rows from appends/ingests
      .agg(max(col("max_tf")).as("max_tf"), min(col("min_dl")).as("min_dl"),
        sum(col("n_docs")).as("n_docs"))
    val rows = roots
      .map(r => spark.read.schema(indexSchema).parquet(r))
      .reduce(_ unionByName _)
      .filter(col("__tb").isInCollection(tks :+ StatsToken))
    // df per term from the POSTINGS — the exact number the plain probe
    // uses, so scoring parity holds even if the sidecar has drifted (a
    // crash between an append's two writes); the sidecar's Σ n_docs
    // equals it only when the sidecar is complete. Fused with the corpus
    // stats row into ONE grouped pass (the null-term group IS the stats
    // row), collected once, never recomputed.
    val (dfreq, stats) = collectScoringPlane(spark, rows, queryTerms)

    val bounds = bstats
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__bound", scoreQ(col("max_tf"), col("__df"), col("min_dl"),
        col("__n"), col("__avgdl"), k1, b))
      .groupBy(col("block"))
      .agg(sum(col("__bound")).as("__ub"),
        // ≥ this many distinct docs live in the range (max over terms)
        max(col("n_docs")).as("__docs_lb"))
    // seed prefix: blocks until the cumulative doc lower bound reaches
    // seedBoost·n, not n — θ from a bare-n seed is the n-th best of ONE
    // block, which sits far below the true n-th best whenever the
    // selective (high-idf) docs are a small fraction of each block, and
    // then prunes nothing. docsLB ≥ 1 bounds the prefix at seedBoost·n
    // blocks, so a TakeOrderedAndProject top-seedBoost·n + a driver
    // prefix scan replaces what was a single-partition global window.
    // The collect is TWO-TIER: this first tier fetches ONLY the seed
    // prefix (≤ seedBoost·n rows — never maxSurvivors+1, which at the
    // default would be a guaranteed ~1M-row driver collect per probe and
    // a ~1M-entry per-partition TakeOrdered heap on every executor even
    // when a handful of blocks clear θ); the survivor set below reuses it
    // whenever the prefix provably covers every clearing block, and pays
    // ONE extra bounded job only when θ lands at or above the prefix's
    // minimum bound.
    val seedTarget = seedBoost.toLong * n
    val tierLimit = (seedTarget min Int.MaxValue.toLong).toInt
    val plane = bounds
      .orderBy(col("__ub").desc, col("block").asc)
      .limit(tierLimit)
      .select("block", "__docs_lb", "__ub").collect()
    val seeds = {
      var cum = 0L
      plane.takeWhile { r =>
        val keep = cum < seedTarget; cum += r.getLong(1); keep
      }.map(_.getLong(0)).toSeq
    }

    def scoreRanges(blocks: Option[Seq[Long]]): DataFrame = {
      val posts = rows
        .where(col("term").isNotNull && col("term").isin(queryTerms: _*))
      val pruned = blocks match {
        case Some(ids) =>
          posts.where(blockOf(col("doc_id"), blockSize).isInCollection(ids))
        case None => posts
      }
      topN(pruned
        .select(col("term"), col("doc_id"), col("tf").as("__tf"),
          col("dl").as("__dl"))
        .join(broadcast(dfreq), "term")
        .crossJoin(broadcast(stats))
        .withColumn("__sq", scoreQ(col("__tf"), col("__df"), col("__dl"),
          col("__n"), col("__avgdl"), k1, b)), n)
    }

    // plan stats cost a Spark job; the serving path (collectStats=false)
    // never pays it
    def totalBlocks: Long = if (collectStats) bounds.count() else -1L
    def skipped(reason: WandPlan => WandPlan): (DataFrame, WandPlan) =
      (scoreRanges(None), reason(WandPlan(blockSize, totalBlocks, 0L, None,
        None, planeRows = plane.length.toLong)))
    if (seeds.isEmpty) return skipped(identity) // empty index/terms
    val seedTop = scoreRanges(Some(seeds)).select("bm25_q").collect()
    if (seedTop.length < n) // corpus smaller than n: nothing to prune
      return skipped(_.copy(seedBlocks = seeds.length.toLong))
    val theta = seedTop.map(_.getLong(0)).min

    // survivors, tier two. The collected prefix provably holds EVERY
    // block with bound ≥ θ in two cases: (a) it is the whole plane
    // (fewer blocks exist than the tier limit, or a NULL bound was
    // collected — desc ordering sorts NULLs last, so a collected NULL
    // means every non-NULL block is already here); (b) its minimum
    // collected bound is < θ — anything uncollected bounds at or below
    // that minimum, hence strictly below θ. In both (the typical probe:
    // θ exceeds the tail of a few-hundred-row prefix) the survivor set
    // comes off the tier-one array with NO extra job. Only when θ ≤ the
    // prefix minimum — survivors may extend past the prefix — does one
    // extra bounded job run, and it collects ONLY clearing blocks
    // (bound ≥ θ pushed into the scan), capped at maxSurvivors+1 so an
    // overflow degrades to the documented unpruned fallback instead of
    // a corpus-sized collect.
    val planeComplete = plane.length < tierLimit || plane.exists(_.isNullAt(2))
    val prefixMin: Option[Long] =
      plane.reverseIterator.find(!_.isNullAt(2)).map(_.getLong(2))
    val mustExtend = !(planeComplete || prefixMin.exists(_ < theta))
    val survivors: Seq[Long] =
      if (!mustExtend)
        plane.filter(r => !r.isNullAt(2) && r.getLong(2) >= theta)
          .map(_.getLong(0)).toSeq
      else {
        val extLimit = ((maxSurvivors.toLong + 1) min Int.MaxValue.toLong).toInt
        bounds.where(col("__ub") >= theta)
          .orderBy(col("__ub").desc, col("block").asc)
          .limit(extLimit)
          .select("block").collect().map(_.getLong(0)).toSeq
      }
    val plan = WandPlan(blockSize, totalBlocks, seeds.length.toLong,
      Some(theta),
      if (survivors.length > maxSurvivors) None else Some(survivors),
      planeRows = plane.length.toLong, extended = mustExtend)
    (scoreRanges(plan.survivors), plan)
  }

  /** BATCH probe: score MANY queries against the index in ONE plan — the
    * retrieval twin of the ANN family's `q_ann_topk_batch` form.
    * `queries` is a (queryIdCol: long, termCol: string) frame, one row per
    * (query, term); the distinct term set is collected driver-side to
    * compute the bucket pruning (bounded by the batch's vocabulary — the
    * serving-batch contract, same as the ANN batch path). Output:
    * (query_id, doc_id, bm25_q, rank ≤ nPerQuery) with the single-probe
    * scorer, quantization, and (score desc, doc_id) tie rule per query.
    * NULL/empty terms and NULL query ids are rejected loudly.
    */
  def bm25BatchAgainstIndex(spark: SparkSession, path: String,
      queries: DataFrame, queryIdCol: String, termCol: String,
      nPerQuery: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(nPerQuery > 0, s"bm25BatchAgainstIndex: nPerQuery must be positive")
    val nBuckets = readMeta(spark, path, "bm25BatchAgainstIndex")
    val q = queries.select(col(queryIdCol).cast("long").as("query_id"),
      col(termCol).as("term"))
    val terms = q.select("term").distinct().collect().map { r =>
      require(!r.isNullAt(0) && r.getString(0).nonEmpty,
        "bm25BatchAgainstIndex: query terms must be non-null and non-empty")
      r.getString(0)
    }.toSeq // bounded by the query batch's vocabulary
    require(terms.nonEmpty, "bm25BatchAgainstIndex: empty query batch")
    require(q.where(col("query_id").isNull).isEmpty,
      "bm25BatchAgainstIndex: NULL query ids are not addressable")

    val tks = terms.map(bucketTokenOf(_, nBuckets)).distinct :+ StatsToken
    val rows = IndexLifecycle.liveRoots(spark, path)
      .map(r => spark.read.schema(indexSchema).parquet(r))
      .reduce(_ unionByName _)
      .filter(col("__tb").isInCollection(tks))
    val stats = rows.where(col("term").isNull)
      .agg(sum(col("tf")).as("__n"),
        when(coalesce(sum(col("tf")), lit(0L)) === 0, lit(null).cast("double"))
          .otherwise(sum(col("dl")).cast("double") / sum(col("tf")))
          .as("__avgdl"))
    val posts = rows
      .where(col("term").isNotNull && col("term").isin(terms: _*))
      .select(col("term"), col("doc_id"), col("tf").as("__tf"),
        col("dl").as("__dl"))
    val dfreq = posts.groupBy("term").agg(count(lit(1)).as("__df"))
    val scored = posts
      .join(broadcast(dfreq), "term")
      .join(broadcast(q.distinct()), "term") // repeats in a query = a set
      .crossJoin(broadcast(stats))
      .withColumn("__sq", scoreQ(col("__tf"), col("__df"), col("__dl"),
        col("__n"), col("__avgdl"), k1, b))
    scored
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__sq")).as("bm25_q"))
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("bm25_q").desc, col("doc_id").asc)))
      .where(col("rank") <= nPerQuery)
  }

  /** Block-max WAND for the BATCH probe: identical output to
    * [[bm25BatchAgainstIndex]], with each query's posting scan pruned to
    * the doc-id blocks whose per-QUERY score upper bound can still reach
    * that query's top-n — in ONE postings pass (round 16; the previous
    * shape paid a seed-scoring pass to learn θ before the survivor pass,
    * roughly doubling the probe's fixed cost).
    *
    * The one-pass trick: the v2 sidecar stores per-(term, block) LOWER
    * bound ingredients (`min_tf`, `max_dl`) besides the upper ones. For a
    * query, any block's lower bound `lb(b) = max over its terms t of
    * scoreQ(min_tf, df, max_dl)` is a score at least `n_docs(t*, b)`
    * distinct docs in that block reach (each contains t* with tf ≥
    * min_tf and dl ≤ max_dl, and other-term partials are ≥ 0). Blocks
    * are disjoint doc ranges, so walking blocks in lb-descending order
    * until the doc count reaches n yields `θ_lb = min lb over that
    * prefix` with ≥ n docs guaranteed to score ≥ θ_lb — a VALID lower
    * bound on the true n-th best score, derived from the sidecar alone.
    * Blocks with upper bound < θ_lb ≤ θ_true hold only docs that score
    * strictly below the n-th best and are pruned; the single scoring
    * pass over the surviving (query, block) pairs is exact.
    *
    * Crash safety: the append contract allows an OVER-complete sidecar
    * (phantom rows whose postings never landed). Phantoms only weaken
    * upper bounds but could inflate θ_lb (claiming docs that don't
    * exist), so the lower bound is GATED per term: it participates only
    * where the sidecar's Σ n_docs equals the term's postings df (the
    * exact number the scorer uses anyway) — any phantom breaks the
    * equality and silently disables lb-pruning for that term, never
    * exactness. Sidecars written before v2 read their lb columns as
    * NULL and behave the same way; `compactTextIndex` regenerates v2.
    *
    * Scale shape (revised round 17 after the crossover measurement —
    * SCALE.md "batch-WAND crossover"): the r16 shape joined the survivor
    * pairs IN-PLAN, and Spark planned that join as a SHUFFLE of the full
    * postings×queries fan-out — the probe shuffled exactly the rows it
    * was pruning (measured 1.7× the plain probe's shuffle records at
    * Q=128, walls 2× plain, growing with Q: the crossover could never
    * arrive). Now the probe mirrors the single-query probe's proven
    * plane: (1) ONE fused postings aggregation collects df/stats as
    * local relations; (2) ONE sidecar-bounded job computes θ per query
    * (the two-window formulation) and collects the surviving (query,
    * block) pairs, capped at `maxSurvivorPairs` — overflow degrades to
    * the exact unpruned scan, never a driver OOM; (3) ONE scoring pass
    * over the postings, survivor-filtered MAP-SIDE via a broadcast of
    * the collected pairs (plus a scan-level block filter when the
    * surviving block union is small enough for a pushed set probe), so
    * the only shuffle left is the per-(query, doc) aggregate over
    * ALREADY-PRUNED rows. Driver traffic is |query,term| pairs (bounded
    * by `maxBatchPairs`) + survivor pairs (bounded by
    * `maxSurvivorPairs`).
    */
  def bm25WandBatchAgainstIndex(spark: SparkSession, path: String,
      queries: DataFrame, queryIdCol: String, termCol: String,
      nPerQuery: Int, k1: Double = 1.2, b: Double = 0.75,
      maxBatchPairs: Int = 1 << 20,
      maxSurvivorPairs: Int = 1 << 20): DataFrame = {
    require(nPerQuery > 0, "bm25WandBatchAgainstIndex: nPerQuery must be positive")
    require(maxSurvivorPairs > 0 && maxSurvivorPairs < Int.MaxValue,
      s"bm25WandBatchAgainstIndex: maxSurvivorPairs must be in (0, " +
        s"Int.MaxValue), got $maxSurvivorPairs — 0 would silently disable " +
        "pruning and Int.MaxValue overflows the survivor collect's +1")
    val nBuckets = readMeta(spark, path, "bm25WandBatchAgainstIndex")
    val blockSize = readBlockSize(spark, path, "bm25WandBatchAgainstIndex")
      .getOrElse(throw new IllegalArgumentException(
        s"bm25WandBatchAgainstIndex: index at $path predates block stats " +
          "(version-1 meta) — rebuild with writeTextIndex or upgrade via " +
          "compactTextIndex"))
    // collect the (query, term) pairs ONCE (bounded by the serving-batch
    // contract, like the plain batch probe's term collect) and re-inject
    // them as a local relation: the joins against `q` then never
    // recompute the input frame, and the null checks ride the same job
    val qRows = queries.select(col(queryIdCol).cast("long").as("query_id"),
      col(termCol).as("term")).distinct() // repeats in a query = a set
      .take(maxBatchPairs + 1)
    // bounded-batch contract CHECKED (the ivfPqJoinTopK/dedupAgainstIndex
    // convention): a corpus-sized frame passed as the query batch fails
    // in seconds with an actionable message, not as a driver OOM
    require(qRows.length <= maxBatchPairs,
      s"bm25WandBatchAgainstIndex collects the batch's (query, term) pairs " +
        s"to the driver, and they exceed maxBatchPairs=$maxBatchPairs — " +
        "this probe serves BOUNDED query batches; split the batch or raise " +
        "the cap explicitly")
    qRows.foreach { r =>
      require(!r.isNullAt(1) && r.getString(1).nonEmpty,
        "bm25WandBatchAgainstIndex: query terms must be non-null and non-empty")
      require(!r.isNullAt(0),
        "bm25WandBatchAgainstIndex: NULL query ids are not addressable")
    }
    val terms = qRows.map(_.getString(1)).distinct.toSeq
    require(terms.nonEmpty, "bm25WandBatchAgainstIndex: empty query batch")
    import spark.implicits._
    val q = qRows.map(r => (r.getLong(0), r.getString(1))).toSeq
      .toDF("query_id", "term")

    val roots = IndexLifecycle.liveRoots(spark, path)
    val tks = terms.map(bucketTokenOf(_, nBuckets)).distinct
    locally {
      val conf = spark.sessionState.newHadoopConf()
      roots.foreach { r =>
        val p = new org.apache.hadoop.fs.Path(r, BlockStatsDirName)
        require(p.getFileSystem(conf).exists(p),
          s"bm25WandBatchAgainstIndex: $r has no $BlockStatsDirName " +
            "sidecar — compactTextIndex the index to regenerate it")
      }
    }

    val rows = roots
      .map(r => spark.read.schema(indexSchema).parquet(r))
      .reduce(_ unionByName _)
      .filter(col("__tb").isInCollection(tks :+ StatsToken))
    // df from the POSTINGS (the plain batch probe's exact number; the
    // sidecar Σ n_docs only equals it when the sidecar is complete),
    // COLLECTED once as local relations — the single probe's plane. The
    // r16 in-plan formulation saved this job but forced the survivor
    // join below into the main plan, where Spark shuffled the full
    // postings fan-out to meet it; one ~fixed-cost aggregation job is
    // the right trade against a shuffle that grows with |batch|×df.
    // The collected df doubles as the phantom gate for the sidecar
    // lower bounds, exactly as before.
    val (dfreq, stats) = collectScoringPlane(spark, rows, terms)

    // per-(term, block) merged sidecar rows with BOTH bound directions.
    // The lb ingredients survive the merge only if every contributing
    // row carries them (a NULL from a pre-v2 file must poison min/max,
    // not be skipped by the aggregate — hence the validity conjunct).
    val bstats = roots
      .map(r => spark.read.schema(blockStatsSchema)
        .parquet(s"$r/$BlockStatsDirName"))
      .reduce(_ unionByName _)
      .filter(col("__tb").isInCollection(tks) &&
        col("term").isin(terms: _*))
      .groupBy(col("term"), col("block"))
      .agg(max(col("max_tf")).as("max_tf"), min(col("min_dl")).as("min_dl"),
        sum(col("n_docs")).as("n_docs"),
        min(col("min_tf")).as("min_tf"), max(col("max_dl")).as("max_dl"),
        (count(lit(1)) === count(col("min_tf")) &&
          count(lit(1)) === count(col("max_dl"))).as("__v2"),
        sum(sum(col("n_docs"))).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("term")))
          .as("__tdocs"))

    // per-(query, block): upper bound Σ over the query's terms; lower
    // bound = the best single-term witness, VALID only where the term is
    // v2-complete AND phantom-free (sidecar doc total == postings df)
    val perTerm = bstats
      .join(broadcast(dfreq), "term")
      .join(broadcast(q), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__bound", scoreQ(col("max_tf"), col("__df"), col("min_dl"),
        col("__n"), col("__avgdl"), k1, b))
      .withColumn("__tlb",
        when(col("__v2") && col("__tdocs") === col("__df"),
          scoreQ(col("min_tf"), col("__df"), col("max_dl"),
            col("__n"), col("__avgdl"), k1, b))
          .otherwise(lit(null).cast("long")))
    val qb = perTerm
      .groupBy(col("query_id"), col("block"))
      .agg(sum(col("__bound")).as("__ub"),
        max(col("__tlb")).as("__lb"),
        max_by(col("n_docs"), col("__tlb")).as("__lb_docs"))

    // θ_lb per query IN-PLAN, as two windows over qb's ONE shuffle:
    // blocks in lb-desc order until the witness doc count reaches n
    // (valid only when it does reach n — otherwise no pruning for that
    // query; the unpruned scan is still exact). Expressing θ as windows
    // instead of a groupBy + join-back keeps the whole sidecar plane
    // (bstats → perTerm → qb) a SINGLE subtree in the final plan — the
    // join-back formulation executed it twice (once under θ, once under
    // the survivor filter), measured +60% probe wall at 50× corpus
    // (SCALE.md round 16, batch-WAND-at-scale).
    val lbOrd = Window.partitionBy(col("query_id"))
      .orderBy(col("__lb").desc, col("block").asc) // desc = NULLS LAST
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col("query_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val surviving = qb
      .withColumn("__cum", sum(coalesce(col("__lb_docs"), lit(0L))).over(lbOrd))
      .withColumn("__prefix",
        col("__lb").isNotNull && col("__cum") - col("__lb_docs") < nPerQuery)
      .withColumn("__cand", min(when(col("__prefix"), col("__lb"))).over(whole))
      .withColumn("__covered",
        max(when(col("__prefix"), col("__cum"))).over(whole))
      .withColumn("__theta",
        when(col("__covered") >= nPerQuery, col("__cand")))
      .where(col("__theta").isNull || col("__ub") >= col("__theta"))
      .select(col("query_id"), col("block"))

    // collect the survivor pairs in ONE sidecar-bounded job (the plane
    // subtree reads only `_block_stats` + the local df/q relations — it
    // never touches postings). Overflowing the cap degrades to the
    // exact unpruned scan: correctness never depends on pruning.
    val survivorPairs = surviving.take(maxSurvivorPairs + 1)
    val prune = survivorPairs.length <= maxSurvivorPairs

    // the single postings pass: survivor-filtered MAP-SIDE (broadcast
    // of the collected pairs), so the one remaining shuffle is the
    // per-(query, doc) aggregate over pruned rows
    val scored = rows
      .where(col("term").isNotNull && col("term").isin(terms: _*))
      .select(col("term"), col("doc_id"), col("tf").as("__tf"),
        col("dl").as("__dl"))
      .join(broadcast(dfreq), "term")
      .join(broadcast(q), "term")
      .withColumn("block", blockOf(col("doc_id"), blockSize))
    val gated = if (!prune) scored else {
      // when pruning collapsed the survivors to FEW distinct blocks, a
      // scan-level set probe on doc_id's block drops pruned postings
      // before the joins even see them; a large union (weak pruning)
      // would make the per-row probe pure overhead, so it is gated
      val unionBlocks = survivorPairs.map(_.getLong(1)).distinct.toSeq
      val scanned = if (unionBlocks.nonEmpty && unionBlocks.length <= 4096)
        scored.where(col("block").isInCollection(unionBlocks))
      else scored
      val surv = survivorPairs.map(r => (r.getLong(0), r.getLong(1))).toSeq
        .toDF("query_id", "block")
      scanned.join(broadcast(surv), Seq("query_id", "block"))
    }
    gated
      .crossJoin(broadcast(stats))
      .withColumn("__sq", scoreQ(col("__tf"), col("__df"), col("__dl"),
        col("__n"), col("__avgdl"), k1, b))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__sq")).as("bm25_q"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("bm25_q").desc, col("doc_id").asc)))
      .where(col("rank") <= nPerQuery)
  }

  /** Reciprocal Rank Fusion (Cormack et al., SIGIR'09): fuse N ranked
    * lists — e.g. this module's BM25 lexical ranking with an ANN cosine
    * ranking — into one hybrid top-n. Each list contributes
    * `⌊10⁹ / (k + rank)⌋` per document (the classic 1/(k+rank), scaled to
    * an exact integer so the cross-system sum commutes and both engines
    * agree bit-for-bit); fused ties break on doc_id. Inputs are
    * (doc_id, rank) frames — rank 1-based, exactly what [[bm25Rank]] /
    * [[bm25AgainstIndex]] and the ANN top-k queries emit. A document
    * missing from a list simply contributes nothing (the standard RRF
    * rule). Plan: map-side contribution per list → union → one hash
    * aggregate on doc_id → TakeOrderedAndProject top-n.
    */
  def rrfFuse(rankings: Seq[DataFrame], n: Int, kRrf: Int = 60): DataFrame = {
    require(rankings.size >= 2,
      s"rrfFuse: fusion needs at least two rankings, got ${rankings.size}")
    require(n > 0, "rrfFuse: n must be positive")
    require(kRrf >= 0, s"rrfFuse: k must be non-negative, got $kRrf")
    rankings.zipWithIndex.foreach { case (r, i) =>
      require(r.columns.contains("doc_id") && r.columns.contains("rank"),
        s"rrfFuse: ranking #$i must carry doc_id and rank columns " +
          s"(got ${r.columns.mkString(", ")})")
    }
    val contribs = rankings.map(_.select(col("doc_id"),
      expr(s"1000000000 DIV ($kRrf + rank)").as("__c")))
    val top = contribs.reduce(_ unionByName _)
      .groupBy(col("doc_id"))
      .agg(sum(col("__c")).as("rrf_q"))
      .orderBy(col("rrf_q").desc, col("doc_id").asc)
      .limit(n)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("rrf_q").desc, col("doc_id").asc)))
  }

  /** Per-query batch RRF: fuse N ranked lists for a whole QUERY BATCH in
    * one plan — the fusion twin of [[bm25BatchAgainstIndex]] and the ANN
    * batch paths. Inputs are (query_id, doc_id, rank) frames (rank
    * 1-based within its query); contributions, quantization
    * (`⌊10⁹/(k + rank)⌋`), missing-doc rule, and the (rrf_q desc, doc_id)
    * tie break are exactly [[rrfFuse]]'s, applied per query_id. Output:
    * (query_id, doc_id, rrf_q, rank ≤ n per query).
    *
    * Plan: map-side contribution per list → union → ONE hash aggregate on
    * (query_id, doc_id) → per-query rank window over ≤ Σ list sizes rows
    * per query. No per-query driver loop, no join — serving a thousand
    * queries costs one aggregate over their combined (small) top lists.
    */
  def rrfFuseBatch(rankings: Seq[DataFrame], n: Int,
      kRrf: Int = 60): DataFrame = {
    require(rankings.size >= 2,
      s"rrfFuseBatch: fusion needs at least two rankings, got ${rankings.size}")
    require(n > 0, "rrfFuseBatch: n must be positive")
    require(kRrf >= 0, s"rrfFuseBatch: k must be non-negative, got $kRrf")
    rankings.zipWithIndex.foreach { case (r, i) =>
      require(Seq("query_id", "doc_id", "rank").forall(r.columns.contains),
        s"rrfFuseBatch: ranking #$i must carry query_id, doc_id and rank " +
          s"columns (got ${r.columns.mkString(", ")})")
    }
    val contribs = rankings.map(_.select(col("query_id"), col("doc_id"),
      expr(s"1000000000 DIV ($kRrf + rank)").as("__c")))
    contribs.reduce(_ unionByName _)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__c")).as("rrf_q"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf_q").desc, col("doc_id").asc)))
      .where(col("rank") <= n)
  }

  /** Dense locality-bearing doc ids for index builds — the document
    * reordering step production block-max deployments run before writing
    * the index (Ding & Suel SIGIR'11 §6; the BP line of work): WAND
    * pruning works exactly when similar-quality/similar-content docs
    * share doc-id blocks, and crawl ids are usually interleaved. Sorts by
    * `orderCols` (+ the old id as the total-order tiebreak) and appends
    * `doc_id_new` = the dense 0-based rank. Build the index over the new
    * ids; keep the returned mapping to translate results back.
    *
    * NULL rule: bare columns sort with Spark's ascending default —
    * NULLS FIRST — so docs with a NULL order key take the LOWEST new ids
    * (pass `asc_nulls_last`/`desc` columns to override). SQL mirrors of
    * this operator must say NULLS FIRST explicitly (DuckDB/Postgres
    * default ASC to NULLS LAST).
    *
    * Plan shape: ONE range-partitioned sort (the classic total-order
    * shuffle) + a per-partition-count pass to make ranks dense without a
    * single-partition window (`zipWithIndex` — per-partition imperative
    * indexing is the documented RDD exception). A build-time cost, paid
    * once per index build, never at probe time.
    */
  def reorderDocs(docs: DataFrame, idCol: String,
      orderCols: Seq[Column]): DataFrame = {
    require(orderCols.nonEmpty, "reorderDocs: at least one order column required")
    require(!docs.columns.contains("doc_id_new"),
      "reorderDocs: input already has a doc_id_new column")
    requireLongId(docs, idCol, "reorderDocs")
    val spark = docs.sparkSession
    val sorted = docs.orderBy(orderCols :+ col(idCol): _*)
    val schema = sorted.schema.add("doc_id_new",
      org.apache.spark.sql.types.LongType, nullable = false)
    val rows = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i)
    }
    spark.createDataFrame(rows, schema)
  }

  /** Compact an appended index into `targetPath` (must be disjoint from
    * the live index): postings — base layout AND accumulated streaming
    * subtrees — re-cluster into the bounded-file layout and the
    * per-append stats rows fold into ONE. Pure layout work — probe
    * results are identical before and after.
    */
  def compactTextIndex(spark: SparkSession, path: String,
      targetPath: String, blockSize: Long = DefaultBlockSize): Unit = {
    val nBuckets = readMeta(spark, path, "compactTextIndex")
    IndexLifecycle.requireDistinctPaths(spark, path, targetPath, "compactTextIndex")
    val rows = IndexLifecycle.liveRoots(spark, path)
      .map(r => spark.read.schema(indexSchema).parquet(r))
      .reduce(_ unionByName _)
    val stats = rows.where(col("term").isNull)
      .agg(sum(col("tf")).as("tf"), sum(col("dl")).as("dl"))
      .select(lit(null).cast(StringType).as("term"),
        lit(null).cast(LongType).as("doc_id"),
        coalesce(col("tf"), lit(0L)).as("tf"),
        coalesce(col("dl"), lit(0L)).as("dl"),
        lit(StatsToken).as("__tb"))
    IndexLifecycle.clusterForPartitionedWrite(
        rows.where(col("term").isNotNull).unionByName(stats),
        "__tb", sortCols = Seq("term"))
      .write.mode("overwrite").partitionBy("__tb").parquet(targetPath)
    // regenerate the WAND sidecar from the compacted postings — this is
    // also the upgrade path for a version-1 (pre-block-stats) index
    blockStatsOf(
        spark.read.schema(indexSchema).parquet(targetPath)
          .where(col("term").isNotNull), blockSize)
      .write.mode("overwrite").partitionBy("__tb")
      .parquet(s"$targetPath/$BlockStatsDirName")
    writeMeta(spark, targetPath, nBuckets, blockSize,
      readTokenizer(spark, path, "compactTextIndex"))
  }
}
