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

  /** House tokenizer (the tfidf/dedup rule): split on single spaces,
    * drop empties. Typed API, not an `expr` string — a column name with
    * dots/backticks must resolve, not parse.
    */
  private def tokens(textCol: String): Column =
    filter(split(col(textCol), " "), x => x =!= "")

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
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    requireQuery(queryTerms, n, "bm25Rank")
    requireLongId(docs, idCol, "bm25Rank")
    val words = docs.select(col(idCol).cast("long").as("doc_id"),
      tokens(textCol).as("__w"))
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

  private def bucketToken(term: Column, nBuckets: Int): Column =
    concat(lit("b"), pmod(Md5Prefix32.md5Prefix32(term), lit(nBuckets.toLong)))

  /** Driver-side twin of [[bucketToken]] — must produce identical tokens. */
  private def bucketTokenOf(term: String, nBuckets: Int): String =
    "b" + java.lang.Math.floorMod(
      Md5Prefix32.hash(term.getBytes("UTF-8")), nBuckets.toLong)

  private def metaPath(path: String) = s"$path/_graft_text_index_meta.json"

  private def writeMeta(spark: SparkSession, path: String, nBuckets: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(metaPath(path))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(s"""{"nBuckets": $nBuckets, "version": 1}"""
      .getBytes("UTF-8"))
    finally out.close()
  }

  private def readMeta(spark: SparkSession, path: String, op: String): Int = {
    val p = new org.apache.hadoop.fs.Path(metaPath(path))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p), s"$op: no text index at $path (missing " +
      s"${p.getName}) — build one with writeTextIndex first")
    val in = fs.open(p)
    val txt = try {
      val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(buf); new String(buf, "UTF-8")
    } finally in.close()
    val m = """"nBuckets"\s*:\s*(\d+)""".r.findFirstMatchIn(txt)
    require(m.isDefined, s"$op: malformed text index meta at $path: $txt")
    m.get.group(1).toInt
  }

  private def batchRows(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int): DataFrame = {
    Md5Prefix32.register(docs.sparkSession) // idempotent; bare sessions lack it
    val words = docs.select(col(idCol).cast("long").as("doc_id"),
      tokens(textCol).as("__w"))
    val postings = words
      .select(col("doc_id"), size(col("__w")).cast("long").as("dl"),
        explode(col("__w")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"),
        bucketToken(col("term"), nBuckets).as("__tb"))
    val stats = words
      .agg(count(lit(1)).as("tf"), sum(size(col("__w")).cast("long")).as("dl"))
      .select(lit(null).cast(StringType).as("term"),
        lit(null).cast(LongType).as("doc_id"),
        col("tf"), coalesce(col("dl"), lit(0L)).as("dl"),
        lit(StatsToken).as("__tb"))
    postings.unionByName(stats)
  }

  /** Build the index: postings partitioned by term bucket (probes prune
    * statically to their query terms' buckets), salt-clustered and
    * term-sorted within each partition so row groups carry tight min/max
    * for the residual term filter.
    */
  def writeTextIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, s"writeTextIndex: nBuckets must be positive, got $nBuckets")
    requireLongId(docs, idCol, "writeTextIndex")
    Dedup.clusterForPartitionedWrite(
        batchRows(docs, idCol, textCol, nBuckets),
        "__tb", sortCols = Seq("term"))
      .write.mode("overwrite").partitionBy("__tb").parquet(path)
    writeMeta(docs.sparkSession, path, nBuckets)
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
    batchRows(docs, idCol, textCol, nBuckets)
      .write.mode("append").partitionBy("__tb").parquet(path)
  }

  // ---- streaming ingest: idempotent per-batch subtrees under _ingest ----

  private val IngestDirName = "_ingest"

  /** Streaming appends live in `path/_ingest/<queryTag>/b_<batchId>` —
    * underscore-prefixed so Spark's default file index HIDES the subtree
    * from plain `parquet(path)` reads, while [[bm25AgainstIndex]] and
    * [[compactTextIndex]] list and union the subtrees explicitly. One dir
    * per (query, batch) makes the streaming append IDEMPOTENT: a replayed
    * batch OVERWRITES its own subtree instead of appending duplicate
    * postings — the crash-replay hole the plain [[appendToTextIndex]]
    * contract leaves open is closed on this path.
    */
  private def ingestBatchDir(path: String, queryTag: String,
      batchId: Long): String =
    s"$path/$IngestDirName/$queryTag/b_$batchId"

  private def listIngestDirs(spark: SparkSession, path: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path, IngestDirName)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) Seq.empty
    else for {
      q <- fs.listStatus(root).toSeq if q.isDirectory
      b <- fs.listStatus(q.getPath).toSeq if b.isDirectory
    } yield fs.makeQualified(b.getPath).toString
  }

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
    batchRows(batch, idCol, textCol, nBuckets)
      .write.mode("overwrite").partitionBy("__tb")
      .parquet(ingestBatchDir(indexPath, queryTag, batchId))
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
      indexPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val qualified = {
      val p = new org.apache.hadoop.fs.Path(checkpointDir)
      p.getFileSystem(stream.sparkSession.sessionState.newHadoopConf())
        .makeQualified(p).toString
    }
    val queryTag = "q" + java.security.MessageDigest.getInstance("MD5")
      .digest(qualified.getBytes("UTF-8"))
      .take(6).map(b => f"${b & 0xff}%02x").mkString
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        ingestTextBatch(batch.toDF(), idCol, textCol, indexPath, queryTag,
          batchId)
      }
      .start()
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
    val rows = (path +: listIngestDirs(spark, path))
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
    val rows = (path +: listIngestDirs(spark, path))
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

  /** Compact an appended index into `targetPath` (must be disjoint from
    * the live index): postings — base layout AND accumulated streaming
    * subtrees — re-cluster into the bounded-file layout and the
    * per-append stats rows fold into ONE. Pure layout work — probe
    * results are identical before and after.
    */
  def compactTextIndex(spark: SparkSession, path: String,
      targetPath: String): Unit = {
    val nBuckets = readMeta(spark, path, "compactTextIndex")
    Dedup.requireDistinctPaths(spark, path, targetPath, "compactTextIndex")
    val rows = (path +: listIngestDirs(spark, path))
      .map(r => spark.read.schema(indexSchema).parquet(r))
      .reduce(_ unionByName _)
    val stats = rows.where(col("term").isNull)
      .agg(sum(col("tf")).as("tf"), sum(col("dl")).as("dl"))
      .select(lit(null).cast(StringType).as("term"),
        lit(null).cast(LongType).as("doc_id"),
        coalesce(col("tf"), lit(0L)).as("tf"),
        coalesce(col("dl"), lit(0L)).as("dl"),
        lit(StatsToken).as("__tb"))
    Dedup.clusterForPartitionedWrite(
        rows.where(col("term").isNotNull).unionByName(stats),
        "__tb", sortCols = Seq("term"))
      .write.mode("overwrite").partitionBy("__tb").parquet(targetPath)
    writeMeta(spark, targetPath, nBuckets)
  }
}
