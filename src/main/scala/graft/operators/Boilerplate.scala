package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** Boilerplate-prefix detection and removal — the "strip the site header"
  * step of web-corpus curation: a leading token run shared by many
  * documents of the same group (domain/source) is boilerplate, not
  * content, and inflates n-gram counts and dedup signatures.
  *
  * Works on the NORMALIZED token stream ([[TextQueries.tokensCol]]), so
  * detection is case/punctuation-invariant and the stripped output is the
  * normalized text (document it downstream — raw-byte offsets are a
  * different, span-level problem: [[SpanDedup]]).
  *
  * Distributed shape: one aggregate on (group, prefix) — the prefix table
  * is at most |docs|/minDf rows, usually tiny — joined back on the same
  * keys. No corpus self-join, no window.
  */
object Boilerplate {

  private def prefixCol(toks: Column, k: Int): Column =
    when(size(toks) >= k, array_join(slice(toks, 1, k), " "))

  /** Leading `k`-token prefixes occurring in at least `minDf` documents of
    * a group: `(groupCol, prefix, df_count)`. Documents shorter than `k`
    * tokens contribute nothing.
    */
  def frequentPrefixes(df: DataFrame, textCol: String, groupCol: String,
      k: Int, minDf: Long): DataFrame = {
    require(k >= 1, s"prefix length must be >= 1, got $k")
    require(minDf >= 2, s"minDf must be >= 2 (df 1 = every document), got $minDf")
    df.select(col(groupCol),
        prefixCol(TextQueries.tokensCol(col(textCol)), k).as("prefix"))
      .filter(col("prefix").isNotNull)
      .groupBy(groupCol, "prefix")
      .agg(count(lit(1)).as("df_count"))
      .filter(col("df_count") >= minDf)
  }

  /** Cross-document frequent-LINE removal (the CCNet/RefinedWeb
    * line-dedup step, Wenzek et al. 2020 §3.1): a raw line occurring in
    * at least `minDf` DISTINCT documents of its group (navigation bars,
    * cookie banners, footers) is boilerplate and is removed from every
    * document; remaining lines keep their original order and bytes.
    * Returns the input columns plus `text_kept` (surviving lines
    * re-joined with newlines; '' for NULL text) and `lines_removed`.
    *
    * Distributed shape: one (group, line, doc) DISTINCT aggregate builds
    * the frequent-line table (bounded by distinct frequent lines — tiny
    * next to the corpus), joined back to the exploded lines without a
    * broadcast hint (tiny → AQE broadcasts), then one per-document
    * re-aggregate reassembles order via sort_array on (pos, line) — no
    * global sort, no self-join of documents.
    */
  def stripFrequentLines(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, minDf: Long): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2 (df 1 = every line), got $minDf")
    QualityFilters.requireFreshColumns(df, "stripFrequentLines",
      Seq("text_kept", "lines_removed", "__pos", "__ln", "__lf"))
    val freq = lineDocCounts(df, idCol, textCol, groupCol)
      .filter(col("df_count") >= minDf)
      .select(col(groupCol), col("__ln"), lit(1).as("__lf"))
    stripLinesAgainst(df, idCol, textCol, groupCol, freq)
  }

  /** Per-(group, line) DISTINCT-document counts — the table both the
    * one-shot [[stripFrequentLines]] and the persisted index build from.
    * Blank/whitespace-only lines and null groups are excluded (never
    * boilerplate candidates, never probe-able).
    */
  private def lineDocCounts(df: DataFrame, idCol: String, textCol: String,
      groupCol: String): DataFrame =
    df.select(col(groupCol), col(idCol),
        explode(split(col(textCol), "\n")).as("__ln"))
      // ^\s*$, not trim() != '': Spark trim strips SPACES only, so a
      // tab- or \r-only line (every blank line of a CRLF corpus) would
      // otherwise count as frequent content
      .filter(col(groupCol).isNotNull &&
        col("__ln").isNotNull && !col("__ln").rlike("^\\s*$"))
      .distinct()
      .groupBy(col(groupCol), col("__ln"))
      .agg(count(lit(1)).as("df_count"))

  /** The shared strip/reassembly: remove every line of `df` present in
    * `freq` (columns: groupCol, `__ln`, `__lf`), preserving order and
    * bytes of the survivors; NULL text → ''.
    */
  private def stripLinesAgainst(df: DataFrame, idCol: String,
      textCol: String, groupCol: String, freq: DataFrame): DataFrame = {
    // posexplode_outer keeps NULL-text docs as one null-line row, so they
    // survive the regroup with text_kept = '' instead of vanishing
    val ex = df.select(col(idCol), col(groupCol),
      posexplode_outer(split(col(textCol), "\n")).as(Seq("__pos", "__ln")))
    val re = ex.join(freq, Seq(groupCol, "__ln"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          sort_array(collect_list(when(col("__lf").isNull && col("__ln").isNotNull,
            struct(col("__pos"), col("__ln"))))),
          s => s.getField("__ln")), "\n").as("text_kept"),
        sum(when(col("__lf").isNotNull, 1L).otherwise(0L)).as("lines_removed"))
    df.join(re, Seq(idCol), "left")
      .withColumn("text_kept", coalesce(col("text_kept"), lit("")))
      .withColumn("lines_removed", coalesce(col("lines_removed"), lit(0L)))
  }

  // ---- persisted line-frequency index (the incremental-ingest path) ----

  private val LineMetaFileName = "_graft_linefreq_meta.json"

  private def writeLineMeta(df: DataFrame, path: String,
      groupCol: String): Unit =
    IndexLifecycle.writeMeta(df.sparkSession, path, LineMetaFileName,
      s"""{"op":"lineFreqIndex","group":"$groupCol"}""")

  /** Read the index meta, failing loud on a non-artifact directory or
    * malformed content. Returns (raw meta text, persisted groupCol name) —
    * the ONE parse both the validators and compaction share.
    */
  private def readLineMeta(spark: org.apache.spark.sql.SparkSession,
      path: String, op: String): (String, String) = {
    val txt = IndexLifecycle.requireMeta(spark, path, LineMetaFileName, op,
      "writeLineFreqIndex")
    val g = IndexLifecycle.strField(txt, "group")
      .getOrElse(throw new IllegalArgumentException(
        s"$op: malformed $LineMetaFileName at $path: $txt"))
    (txt, g)
  }

  private def validateLineMeta(df: DataFrame, path: String,
      groupCol: String, op: String): Unit = {
    val g = readLineMeta(df.sparkSession, path, op)._2
    require(g == groupCol,
      s"$op: index at $path was built with groupCol='$g' but the call " +
        s"passed '$groupCol' — the partition layout would not line up; " +
        "pass the index's own group column or rebuild it")
  }

  /** The index keys its counts by STRING groups (domains/sources); other
    * types would round-trip through partition-directory parsing with
    * type-inference surprises — fail loud instead.
    */
  private def requireStringGroup(df: DataFrame, groupCol: String,
      op: String): Unit = {
    require(df.schema(groupCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"$op: groupCol '$groupCol' must be a string column (got " +
        s"${df.schema(groupCol).dataType.simpleString}); cast or derive a " +
        "string domain key first")
    // the meta file stores the name as raw JSON and reads it back with a
    // quote-bounded regex — a name containing '"' or '\' would write
    // malformed meta that bricks later appends/probes, so fail loud here
    require(!groupCol.exists(c => c == '"' || c == '\\'),
      s"$op: groupCol name must not contain '\"' or '\\' (got '$groupCol') " +
        "— alias the column to a plain name first")
  }

  /** Hive partition directories cannot carry arbitrary strings faithfully
    * ('' becomes __HIVE_DEFAULT_PARTITION__ → NULL on read; '1' and '01'
    * type-infer to the same int), so the partition column is an ENCODED
    * token — 'g' + uppercase hex of the UTF-8 group bytes — and the REAL
    * group value rides as a data column the probes join on. The driver-
    * side twin must produce identical tokens to Spark's hex().
    */
  private def grpToken(c: Column): Column =
    concat(lit("g"), hex(encode(c, "UTF-8")))

  private def grpTokenOf(value: String): String =
    "g" + value.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString

  /** The index's fixed on-disk schema — supplied explicitly on every read
    * so (a) an EMPTY index (a legal first batch with no countable lines
    * writes only _SUCCESS) reads as an empty frame instead of dying on
    * schema inference, and (b) partition-value type inference never runs.
    */
  private def lineIndexSchema(groupCol: String) = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField(groupCol, StringType),
      StructField("__ln", StringType),
      StructField("df_count", LongType),
      StructField("__grp", StringType)))
  }

  /** Build a persisted LINE-FREQUENCY index from a corpus: per-(group,
    * line) distinct-document counts, partitioned by group (probes prune
    * to their groups statically) and salt-clustered so each group writes
    * a bounded number of files. The one-shot [[stripFrequentLines]]
    * recomputes this table per run; at corpus scale the counts are built
    * ONCE here and every ingest batch probes + appends against them —
    * the same append-only loop as the MinHash signature index.
    */
  def writeLineFreqIndex(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, path: String): Unit = {
    QualityFilters.requireFreshColumns(df, "writeLineFreqIndex",
      Seq("__ln", "df_count", "__grp"))
    requireStringGroup(df, groupCol, "writeLineFreqIndex")
    IndexLifecycle.clusterForPartitionedWrite(
        lineDocCounts(df, idCol, textCol, groupCol)
          .withColumn("__grp", grpToken(col(groupCol))),
        "__grp", sortCols = Seq("__ln"))
      .write.mode("overwrite").partitionBy("__grp").parquet(path)
    writeLineMeta(df, path, groupCol)
  }

  /** APPEND a new batch's per-(group, line) doc counts to an existing
    * index — partial counts per file; probes SUM them at read time, so an
    * append costs one pass over the BATCH and never rewrites the corpus
    * counts. CONTRACT: each document is appended at most once across the
    * index's lifetime (the natural shape of an ingest loop) — re-appending
    * the same documents double-counts their lines, which can only OVER-
    * remove (conservative for curation, but don't rely on it).
    */
  def appendToLineFreqIndex(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, path: String): Unit = {
    QualityFilters.requireFreshColumns(df, "appendToLineFreqIndex",
      Seq("__ln", "df_count", "__grp"))
    requireStringGroup(df, groupCol, "appendToLineFreqIndex")
    validateLineMeta(df, path, groupCol, "appendToLineFreqIndex")
    lineDocCounts(df, idCol, textCol, groupCol)
      .withColumn("__grp", grpToken(col(groupCol)))
      .write.mode("append").partitionBy("__grp").parquet(path)
  }

  /** Strip a batch against the PERSISTED index: frequent = summed
    * df_count ≥ minDf over the index's (possibly appended) partials. The
    * index scan prunes statically to the batch's own group values (one
    * bounded distinct-collect — the per-domain contract, like mixture
    * totals); the batch itself shuffles only for the line join and the
    * per-doc reassembly.
    *
    * `includeBatchCounts` (the streaming-ingest form) adds the BATCH's
    * own per-(group, line) distinct-doc counts to the index partials
    * before the threshold: a line whose df is split across the batch
    * boundary (minDf−1 in the index, 1 in the batch) is then caught,
    * as is one frequent within the batch alone — the index only ever
    * knows about PREVIOUS batches. One extra aggregate over the batch;
    * the index-side cost is unchanged.
    */
  def stripAgainstLineIndex(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, path: String, minDf: Long,
      includeBatchCounts: Boolean = false): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2 (df 1 = every line), got $minDf")
    QualityFilters.requireFreshColumns(df, "stripAgainstLineIndex",
      Seq("text_kept", "lines_removed", "__pos", "__ln", "__lf"))
    requireStringGroup(df, groupCol, "stripAgainstLineIndex")
    validateLineMeta(df, path, groupCol, "stripAgainstLineIndex")
    val counts =
      if (includeBatchCounts) Some(lineDocCounts(df, idCol, textCol, groupCol))
      else None
    stripWithPartials(df, idCol, textCol, groupCol, path, minDf,
      batchCounts = counts, excludeIngestDir = None)
  }

  /** The shared threshold + strip over (base index partials ∪ visible
    * ingest subtrees ∪ optional batch counts). `excludeIngestDir` is the
    * streaming loop's replay guard: a batch's OWN (possibly pre-crash)
    * subtree is excluded from its probe, so replay reads exactly the
    * pre-batch index state and re-derives identical output.
    */
  private def stripWithPartials(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, path: String, minDf: Long,
      batchCounts: Option[DataFrame],
      excludeIngestDir: Option[String]): DataFrame = {
    val spark = df.sparkSession
    val groups = df.select(col(groupCol)).filter(col(groupCol).isNotNull)
      .distinct().collect().map(_.getString(0)) // bounded by #domains
    val tokens = groups.map(grpTokenOf).toSeq
    val roots = IndexLifecycle.liveRoots(spark, path, excludeIngestDir)
    val idxPartials = roots
      .map(r => spark.read.schema(lineIndexSchema(groupCol)).parquet(r)
        // prune on the encoded PARTITION token; join on the real value
        .filter(col("__grp").isInCollection(tokens))
        .select(col(groupCol), col("__ln"), col("df_count")))
      .reduce(_ unionByName _)
    val partials = batchCounts match {
      case Some(c) => idxPartials.unionByName(
        c.select(col(groupCol), col("__ln"), col("df_count")))
      case None => idxPartials
    }
    val freq = partials
      .groupBy(col(groupCol), col("__ln"))
      .agg(sum(col("df_count")).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col(groupCol), col("__ln"), lit(1).as("__lf"))
    stripLinesAgainst(df, idCol, textCol, groupCol, freq)
  }

  // ---- streaming ingest: idempotent per-batch subtrees under _ingest ----
  // (layout, listing, and query tags are [[IndexLifecycle]]'s; a replayed
  // batch overwrites its own subtree instead of double-counting)

  private def ingestBatchDir(path: String, queryTag: String,
      batchId: Long): String =
    IndexLifecycle.ingestBatchDir(path, queryTag, batchId)

  /** One streaming microbatch of the line-curation ingest loop — exposed
    * for direct spec-level replay testing; [[streamingLineIngest]] wires
    * it into `foreachBatch`. Steps: (1) strip lines whose COMBINED df
    * (base index + OTHER batches' ingest subtrees + this batch's own
    * fresh counts) reaches `minDf`; (2) hand the stripped batch to
    * `sink`; (3) overwrite this batch's ingest subtree with its counts
    * so later batches threshold against them too.
    *
    * REPLAY-IDEMPOTENT: the probe excludes the batch's own subtree, so
    * a replay after a crash anywhere (including after the subtree write
    * committed) sees exactly the pre-batch index state, re-derives an
    * identical stripped result for the idempotent `sink`, and the
    * overwrite leaves the index bit-identical — no double counts, no
    * self-over-strip.
    */
  private[operators] def ingestLineBatch(batch: DataFrame, idCol: String,
      textCol: String, groupCol: String, indexPath: String,
      queryTag: String, batchId: Long, minDf: Long,
      sink: (DataFrame, Long) => Unit): Unit = {
    require(minDf >= 2, s"minDf must be >= 2 (df 1 = every line), got $minDf")
    QualityFilters.requireFreshColumns(batch, "ingestLineBatch",
      Seq("text_kept", "lines_removed", "__pos", "__ln", "__lf", "df_count", "__grp"))
    requireStringGroup(batch, groupCol, "ingestLineBatch")
    validateLineMeta(batch, indexPath, groupCol, "ingestLineBatch")
    IndexLifecycle.requireBatchIdFresh(batch.sparkSession, indexPath,
      queryTag, batchId, "ingestLineBatch")
    val own = ingestBatchDir(indexPath, queryTag, batchId)
    // counts computed ONCE per trigger: the threshold union and the
    // subtree write both read this frame (review finding r12)
    val counts = lineDocCounts(batch, idCol, textCol, groupCol).persist()
    try {
      val stripped = stripWithPartials(batch, idCol, textCol, groupCol,
        indexPath, minDf, batchCounts = Some(counts),
        excludeIngestDir = Some(own)).persist()
      try sink(stripped, batchId)
      finally { stripped.unpersist(); () }
      // stage-then-rename ([[IndexLifecycle.writeViaTmp]]): a concurrent
      // probe (or a crash mid-write) never sees a partially-written
      // subtree — the previous replay's counts stay visible until the
      // publish rename, exactly like the retrieval and PQ ingest loops
      IndexLifecycle.writeViaTmp(batch.sparkSession, own) { tmp =>
        counts.withColumn("__grp", grpToken(col(groupCol)))
          .write.mode("overwrite").partitionBy("__grp").parquet(tmp)
      }
    } finally { counts.unpersist(); () }
  }

  /** The full line-curation ingest loop as ONE Structured Streaming
    * query — the line-frequency index's counterpart of
    * [[Dedup.streamingIngest]] / `Similarity.streamingSemIngest`; see
    * [[ingestLineBatch]] for the per-trigger steps and the
    * replay-idempotence contract (`sink` must be idempotent, the
    * standard `foreachBatch` rule — everything index-side is
    * exactly-once by construction). Build the index first with
    * [[writeLineFreqIndex]] (an empty build from zero countable lines
    * is legal); [[compactLineFreqIndex]] folds accumulated batch
    * subtrees back into one base layout. The query tag is derived from
    * the checkpoint dir, which is what makes a RESTARTED query land its
    * replayed batches on the same subtrees.
    */
  def streamingLineIngest(stream: DataFrame, idCol: String, textCol: String,
      groupCol: String, indexPath: String, checkpointDir: String,
      sink: (DataFrame, Long) => Unit,
      minDf: Long,
      maxLiveSubtrees: Int = 0): org.apache.spark.sql.streaming.StreamingQuery = {
    val queryTag = IndexLifecycle.queryTagOf(stream.sparkSession, checkpointDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        maybeCompactLineIngest(batch.sparkSession, indexPath, queryTag,
          batchId, maxLiveSubtrees, groupCol)
        val b = batch.persist()
        try ingestLineBatch(b.toDF(), idCol, textCol, groupCol, indexPath,
          queryTag, batchId, minDf, sink)
        finally { b.unpersist(); () }
      }
      .start()
  }

  /** The loop's `maxLiveSubtrees` trigger ([[IndexLifecycle
    * .compactOwnSubtrees]] mechanics): the query's accumulated partial-
    * count subtrees fold into one. Unlike the signature/posting families
    * this merge SUMS the partials per (group, line) — the probe's own
    * aggregation ([[stripWithPartials]] sums `df_count` across roots), so
    * every later probe is value-identical while a line that appears in
    * every batch collapses from one row per batch to one row total. 0
    * disables.
    */
  private[operators] def maybeCompactLineIngest(
      spark: org.apache.spark.sql.SparkSession, indexPath: String,
      queryTag: String, batchId: Long, maxLiveSubtrees: Int,
      groupCol: String): Boolean =
    maxLiveSubtrees > 0 &&
      IndexLifecycle.compactOwnSubtrees(spark, indexPath, queryTag, batchId,
          maxLiveSubtrees) { (sources, tmp) =>
        val all = sources
          .map(s => spark.read.schema(lineIndexSchema(groupCol)).parquet(s))
          .reduce(_ unionByName _)
          .groupBy(col(groupCol), col("__ln"), col("__grp"))
          .agg(sum(col("df_count")).as("df_count"))
        IndexLifecycle.clusterForPartitionedWrite(all, "__grp",
            sortCols = Seq("__ln"))
          .write.mode("overwrite").partitionBy("__grp").parquet(tmp)
      }

  /** Compact an appended index into `targetPath`: merge the per-append
    * partial counts — base-root appends AND accumulated streaming-batch
    * subtrees (`_ingest/…`) — into one row per (group, line) in the base
    * layout, bounding files per group; long ingest loops otherwise
    * accrete one file (and one subtree) per batch whose open/footer cost
    * eventually dominates probes. Writes to a NEW disjoint path (same
    * contract as compactSignatureIndex: an in-place rewrite would race
    * live probes — and here would also race a live streaming loop's next
    * subtree write, so compact into a fresh path and repoint).
    *
    * CONTRACT with the streaming loop: compact only after the ingest
    * query has STOPPED CLEANLY (every written batch committed to its
    * checkpoint). Compaction folds ALL subtrees into the base layout;
    * if a crashed query left an uncommitted batch's subtree behind,
    * resuming that checkpoint against the compacted path would replay
    * the batch on top of its already-folded counts — the exclusion that
    * makes replay idempotent matches only `_ingest` subtrees, never
    * base-folded rows. Resume against the ORIGINAL path first (the
    * replay overwrites its own subtree, committing the batch), then
    * compact.
    */
  def compactLineFreqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, targetPath: String, filesPerGroup: Int = 1): Unit = {
    require(filesPerGroup >= 1, s"filesPerGroup must be >= 1, got $filesPerGroup")
    IndexLifecycle.requireDistinctPaths(spark, path, targetPath, "compactLineFreqIndex")
    val (txt, groupCol) = readLineMeta(spark, path, "compactLineFreqIndex")
    val roots = IndexLifecycle.liveRoots(spark, path)
    val merged = roots
      .map(r => spark.read.schema(lineIndexSchema(groupCol)).parquet(r))
      .reduce(_ unionByName _)
      .groupBy(col(groupCol), col("__ln"))
      .agg(sum(col("df_count")).as("df_count"))
      .withColumn("__grp", grpToken(col(groupCol)))
    IndexLifecycle.clusterForPartitionedWrite(merged, "__grp",
        filesPerPartition = filesPerGroup, sortCols = Seq("__ln"))
      .write.mode("overwrite").partitionBy("__grp").parquet(targetPath)
    IndexLifecycle.writeMeta(spark, targetPath, LineMetaFileName, txt)
  }

  /** Flag and strip: every document whose leading `k` normalized tokens
    * form a [[frequentPrefixes]] prefix of its group gets
    * `is_boilerplate = true` and `text_clean` = the normalized text with
    * those tokens removed; everything else passes through with its full
    * normalized text. The prefix table is corpus-derived, so the join
    * back carries no broadcast hint (tiny → AQE broadcasts; pathological
    * → shuffle join instead of an executor OOM).
    */
  def stripFrequentPrefixes(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, k: Int, minDf: Long): DataFrame = {
    QualityFilters.requireFreshColumns(df, "stripFrequentPrefixes",
      Seq("prefix", "is_boilerplate", "text_clean", "df_count", "__bp", "__toks"))
    val prefixes = frequentPrefixes(df, textCol, groupCol, k, minDf)
      .withColumn("__bp", lit(1))
    // tokenize ONCE per row: anchored in its own column — referenced bare,
    // the regex tokenization re-evaluates under each CaseWhen branch below
    // (prefix slice, strip branch, keep branch), since codegen
    // subexpression elimination does not reach into CaseWhen branches
    // (the r18 Pq.train/NLL-fusion lesson)
    val toks = col("__toks")
    df.withColumn("__toks", TextQueries.tokensCol(col(textCol)))
      .withColumn("prefix", prefixCol(toks, k))
      .join(prefixes, Seq(groupCol, "prefix"), "left")
      .withColumn("is_boilerplate", col("__bp").isNotNull)
      // coalesce: NULL text tokenizes to NULL, but the contract (and the
      // DuckDB mirror) is a non-null text_clean — a NULL document strips
      // to the empty string
      .withColumn("text_clean", coalesce(
        when(col("is_boilerplate"),
          array_join(slice(toks, lit(k + 1), greatest(size(toks) - k, lit(0))), " "))
          .otherwise(array_join(toks, " ")),
        lit("")))
      .drop("prefix", "df_count", "__bp", "__toks")
  }
}
