package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ONE implementation of the persisted-index lifecycle plumbing that
  * the five index families share — MinHash signatures ([[Dedup]]),
  * semantic vectors ([[Similarity]]), line frequencies ([[Boilerplate]]),
  * BM25 postings ([[Retrieval]]), perceptual hashes ([[ImageDedup]]).
  * Each family keeps its own schema, probe, and validation MESSAGES;
  * what lives here is the mechanics every one of them was hand-rolling:
  *
  *  - the `_…_meta.json` artifact (atomic single-file write beside the
  *    parquet, underscore-prefixed so partition discovery ignores it)
  *    and its regex field extraction;
  *  - the `_ingest/<queryTag>/b_<batchId>` subtree convention that makes
  *    streaming appends replay-idempotent, with the qualified-checkpoint
  *    query tag that lands a RESTARTED query's replays on the same
  *    subtrees;
  *  - the salt-clustered partitioned write (bounded files per partition
  *    value, optional in-partition sort for row-group pruning);
  *  - the qualified-path disjointness guard behind every compact-to-a-
  *    new-path contract.
  */
private[graft] object IndexLifecycle {

  // ---------------------------------------------------------------------
  // Meta artifact
  // ---------------------------------------------------------------------

  private def metaPath(path: String, fileName: String) =
    new org.apache.hadoop.fs.Path(path, fileName)

  /** Overwrite `path/fileName` with one small JSON document. */
  def writeMeta(spark: SparkSession, path: String, fileName: String,
      json: String): Unit = {
    val p = metaPath(path, fileName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** Meta text, or None when the artifact is absent (caller phrases the
    * loud not-an-index message).
    */
  def readMeta(spark: SparkSession, path: String,
      fileName: String): Option[String] = {
    val p = metaPath(path, fileName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  /** Like [[readMeta]] but the absence message is standardized. */
  def requireMeta(spark: SparkSession, path: String, fileName: String,
      op: String, buildHint: String): String =
    readMeta(spark, path, fileName).getOrElse(
      throw new IllegalArgumentException(
        s"$op: no $fileName at $path — not a $buildHint artifact; build " +
          s"the index with $buildHint first"))

  def longField(txt: String, name: String): Option[Long] =
    (s""""$name"\\s*:\\s*(\\d+)""").r.findFirstMatchIn(txt)
      .map(_.group(1).toLong)

  def strField(txt: String, name: String): Option[String] =
    (s""""$name"\\s*:\\s*"([^"]*)"""").r.findFirstMatchIn(txt)
      .map(_.group(1))

  // ---------------------------------------------------------------------
  // Streaming-ingest subtrees
  // ---------------------------------------------------------------------

  val IngestDirName = "_ingest"

  /** `path/_ingest/<queryTag>/b_<batchId>` — underscore-prefixed so
    * Spark's default file index hides the subtree from plain
    * `parquet(path)` reads; one dir per (query, batch) is what makes a
    * streaming append IDEMPOTENT (a replayed batch overwrites its own
    * subtree instead of appending duplicates).
    */
  def ingestBatchDir(path: String, queryTag: String, batchId: Long): String =
    s"$path/$IngestDirName/$queryTag/b_$batchId"

  /** Reserved suffix for in-flight batch subtrees: [[writeViaTmp]]
    * stages a batch's files in `<dir>.tmp` and renames into place, and
    * [[listIngestDirs]] never lists a `.tmp` dir — so probes see a batch
    * subtree either complete or not at all, never half-written.
    */
  val TmpSuffix = ".tmp"

  /** Every (query, batch) subtree under `path/_ingest`, qualified;
    * `exclude` drops one subtree (the replay-idempotence trick: a batch
    * probing the index must not see its OWN previous write). In-flight
    * `.tmp` stages are invisible.
    */
  def listIngestDirs(spark: SparkSession, path: String,
      exclude: Option[String] = None): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path, IngestDirName)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) Seq.empty
    else {
      val excluded = exclude.map(e =>
        fs.makeQualified(new org.apache.hadoop.fs.Path(e)).toString).toSet
      val all = for {
        q <- fs.listStatus(root).toSeq if q.isDirectory
        b <- fs.listStatus(q.getPath).toSeq
        if b.isDirectory && !b.getPath.getName.endsWith(TmpSuffix)
        // an UNMARKED compact is a publish still in flight (or its
        // crash debris): invisible, like a `.tmp` stage — and it must
        // not count toward the cutoff, or a half-copied compact on a
        // non-atomic-rename store would hide COMPLETE sources and
        // silently under-read committed rows
        if !q.getPath.getName.endsWith(CompactTagSuffix) ||
          isMarkedCompact(fs, b.getPath)
      } yield (q.getPath.getName, b.getPath.getName,
        fs.makeQualified(b.getPath).toString)
      // COMPACT-CUTOFF RULE: a (marked) compact `<tag>-c/b_N` folded, by
      // construction, EVERYTHING its query published before batch N (its
      // live `b_<i>` dirs, i < N, and any older compact). So given the
      // newest compact per tag, any older sibling is a superseded
      // leftover — either the torn window between a fold's publish and
      // its (deferred) source deletes, or a crash inside it. Excluding
      // them HERE makes every probe race-free against in-loop
      // compaction: a listing that catches sources + their compacted
      // copy deterministically reads each row once. Foreign-named dirs
      // (no `b_<n>` id) are always live — and never merge sources, so
      // they are read exactly once too.
      // multi-tag twin of [[compactCutoff]] over the ONE listing this
      // function already holds — any change to the rule must land in
      // BOTH (CompactCutoffRuleSpec-style pinning lives in
      // IngestCompactionSpec's fold/replay tests, which exercise the
      // single- and multi-tag paths against each other)
      val cutoff = all.iterator
        .filter(_._1.endsWith(CompactTagSuffix))
        .flatMap { case (ns, b, _) =>
          batchIdOf(b).map(ns.stripSuffix(CompactTagSuffix) -> _)
        }
        .toSeq.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).max }
      all.collect {
        case (ns, b, d) if !excluded.contains(d) &&
            cutoff.get(ns.stripSuffix(CompactTagSuffix))
              .forall(n => batchIdOf(b).forall(_ >= n)) =>
          d
      }
    }
  }

  /** A persisted index's LIVE roots: base tree ∪ published, non-superseded
    * ingest subtrees — the ONE definition of what a probe reads (every
    * index family's readers route through here; `exclude` is a replaying
    * batch's own subtree, which the replay must not probe).
    */
  def liveRoots(spark: SparkSession, path: String,
      exclude: Option[String] = None): Seq[String] =
    path +: listIngestDirs(spark, path, exclude)

  /** Batch id of a `b_<n>` subtree dir name (None for foreign names —
    * treated as live, never garbage-collected).
    */
  private def batchIdOf(name: String): Option[Long] =
    if (name.startsWith("b_")) name.drop(2).toLongOption else None

  /** Stage-then-publish for one batch subtree: run `write` against
    * `<dir>.tmp` (cleared first, so a crashed previous stage can't
    * pollute it), then delete any previous `<dir>` and rename the stage
    * into place. Probes never observe a partially-written subtree — the
    * only visibility gap is the delete+rename pair (two metadata ops, vs
    * the full recompute+write a plain delete-then-overwrite exposes); on
    * a store with non-atomic rename that residual gap remains, and a
    * crash inside it leaves the batch absent-but-staged, which the
    * batch's REPLAY repairs (same subtree, same content).
    */
  def writeViaTmp(spark: SparkSession, dir: String)
      (write: String => Unit): Unit = {
    val tmp = dir + TmpSuffix
    val dirP = new org.apache.hadoop.fs.Path(dir)
    val tmpP = new org.apache.hadoop.fs.Path(tmp)
    val fs = dirP.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(tmpP, true)
    write(tmp)
    require(fs.exists(tmpP),
      s"writeViaTmp: the staged write left nothing at $tmp")
    fs.delete(dirP, true)
    require(fs.rename(tmpP, dirP),
      s"writeViaTmp: rename $tmp -> $dir failed; the batch is staged but " +
        "unpublished — replay the batch to repair")
  }

  /** Suffix distinguishing a query's COMPACTED subtree namespace from its
    * live per-batch namespace. `queryTagOf` emits `q` + 12 hex chars and
    * the manual tag is `append`, so no real tag collides with a `-c`
    * suffixed one.
    */
  private val CompactTagSuffix = "-c"

  /** Completion marker written INSIDE a compact subtree after its rename
    * finishes — single-file create, atomic on every store. The cutoff
    * rule honors only MARKED compacts, because a compact's visibility has
    * a side effect no per-batch subtree has (it HIDES its sources): on a
    * store with non-atomic rename, a half-copied compact dir that counted
    * toward the cutoff would make probes silently UNDER-read committed
    * rows — the one failure mode the publish contract forbids. Per-batch
    * subtrees need no marker: their partial states only under-read the
    * uncommitted batch itself, which its replay repairs.
    */
  private val CompactCompleteMarker = "_GRAFT_COMPACT_COMPLETE"

  private def isMarkedCompact(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(dir, CompactCompleteMarker))

  /** The cutoff RULE as a pure function of already-listed rows
    * `(tag, dirName, marked)`: newest MARKED compact's batch id under
    * `queryTag`'s compacted namespace, if any. ONE definition shared by
    * [[compactCutoff]] (which lists and delegates) and [[listOwnDirs]]
    * (which applies it to the SAME listing it partitions — deriving the
    * cutoff from a second, later listing would let a compact published
    * between the two listings yield a cutoff inconsistent with the rows
    * being partitioned).
    */
  private def cutoffFrom(rows: Seq[(String, String, Boolean)],
      queryTag: String): Option[Long] =
    rows.flatMap { case (t, name, marked) =>
      if (t == queryTag + CompactTagSuffix && marked) batchIdOf(name)
      else None
    }.maxOption

  /** Newest MARKED compact's batch id for `queryTag`, if any — the
    * compact-cutoff the listing rule hides older siblings behind.
    */
  private def compactCutoff(spark: SparkSession, path: String,
      queryTag: String): Option[Long] = {
    val root = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(path, IngestDirName),
      queryTag + CompactTagSuffix)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val rows =
      if (!fs.exists(root)) Seq.empty[(String, String, Boolean)]
      else fs.listStatus(root).toSeq.collect {
        case s if s.isDirectory && !s.getPath.getName.endsWith(TmpSuffix) =>
          (queryTag + CompactTagSuffix, s.getPath.getName,
            isMarkedCompact(fs, s.getPath))
      }
    cutoffFrom(rows, queryTag)
  }

  /** LOUD guard against batch-id REGRESSION below the compact cutoff:
    * `queryTagOf` hashes only the checkpoint PATH, so wiping a
    * checkpoint's contents while reusing its path restarts batch ids at
    * 0 under the SAME tag — and every append below the newest marked
    * compact's id would be invisible to probes (the cutoff rule
    * classifies it as a superseded leftover) and then garbage-collected:
    * permanent silent data loss. Every ingest writer and the in-loop
    * compactor call this before touching the subtree namespace.
    */
  def requireBatchIdFresh(spark: SparkSession, path: String,
      queryTag: String, batchId: Long, op: String): Unit =
    compactCutoff(spark, path, queryTag).foreach { n =>
      require(batchId >= n,
        s"$op: batch id $batchId regressed below this query's newest " +
          s"compacted batch $n (index $path, tag $queryTag). This happens " +
          "when a checkpoint directory was wiped or replaced while " +
          "REUSING the same checkpoint path — the query tag hashes the " +
          "path, so the restarted query's batch ids collide with the " +
          "compacted history and its appends would be hidden by the " +
          "compact-cutoff rule and then garbage-collected. Restart the " +
          "ingest with a FRESH checkpoint path (new tag), or compact the " +
          "index into a new base and start over.")
    }

  /** The published subtrees belonging to ONE ingest query (its own tag
    * plus its compacted namespace), qualified, split (live, stale) by the
    * compact-cutoff rule ([[listIngestDirs]]): stale dirs are superseded
    * leftovers of a previous fold, awaiting garbage collection. Other
    * queries' subtrees are never touched: they may still replay their
    * last batch, and folding a subtree a replay later overwrites would
    * double its rows.
    */
  private def listOwnDirs(spark: SparkSession, path: String,
      queryTag: String): (Seq[String], Seq[String]) = {
    val conf = spark.sessionState.newHadoopConf()
    val all = Seq(queryTag, queryTag + CompactTagSuffix).flatMap { t =>
      val root = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(path, IngestDirName), t)
      val fs = root.getFileSystem(conf)
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq.collect {
        case s if s.isDirectory && !s.getPath.getName.endsWith(TmpSuffix) =>
          val marked = t == queryTag || isMarkedCompact(fs, s.getPath)
          (t, s.getPath.getName, fs.makeQualified(s.getPath).toString, marked)
      }
    }
    // cutoff from MARKED compacts only (an unmarked compact is an
    // in-flight or crashed publish — it supersedes nothing). The rule is
    // [[cutoffFrom]] — ONE pure definition shared with [[compactCutoff]]
    // (regression guard, append-id allocator) — applied to THIS listing's
    // own rows, not a second FS listing a concurrent compact publish
    // could desynchronize from the rows being partitioned.
    val cutoff = cutoffFrom(all.map { case (t, b, _, m) => (t, b, m) },
      queryTag)
    val (live, stale) = all.partition { case (t, b, _, marked) =>
      // an unmarked compact is trash (its sources are intact — deleting
      // it loses nothing); foreign-named dirs (no b_<n> id) are live
      marked && cutoff.forall(n => batchIdOf(b).forall(_ >= n))
    }
    (live.map(_._3), stale.map(_._3))
  }

  /** In-loop auto-compaction for a streaming-ingest query's OWN subtrees —
    * the `maxLiveSubtrees` knob every ingest loop shares. Call at BATCH
    * START (before the batch's probe): when the query's live subtree
    * count has reached `maxLiveSubtrees`, every live subtree it owns —
    * its `b_<id>` dirs and the previous compact — folds into ONE new
    * subtree `_ingest/<tag>-c/b_<batchId>` (staged via [[writeViaTmp]],
    * published complete-or-nothing). Content is row-identical
    * (`mergeInto` unions the source rows into the family's clustered
    * layout), so every later probe is bit-identical to the uncompacted
    * index — only the file/subtree count collapses.
    *
    * DEFERRED source deletion: the folded sources are NOT deleted at
    * publish time — the compact-cutoff rule ([[listIngestDirs]]) already
    * hides anything older than the newest compact from every reader, so
    * the sources sit invisible on disk until the NEXT trigger call
    * garbage-collects them. Concurrent probes in other sessions
    * therefore never double-read a folded row (the rule is applied at
    * listing time) and never lose a file mid-scan to this fold (a scan
    * would have to straddle a full trigger-to-trigger cycle to race the
    * deferred delete).
    *
    * Crash/replay safety (the foreachBatch rules: only batch `batchId`
    * itself can replay; earlier batches are committed):
    *  - crash while staging → the `.tmp` stage is invisible; the replay
    *    redoes the merge from the unchanged sources;
    *  - crash after publish → the sources are superseded leftovers, which
    *    is the NORMAL post-fold state; the replay's trigger call (and
    *    every later one) garbage-collects them;
    *  - the batch's own `b_<batchId>` subtree (present when replaying a
    *    batch that already appended) is NEVER a merge source — the replay
    *    overwrites it later, and folding it first would double its rows.
    *
    * Cost, honestly: each fold rewrites EVERYTHING the query has ingested
    * since its start (the previous compact is a merge source), so a loop
    * of B batches at threshold k performs ~B/k folds of growing size —
    * O(B²/k) cumulative write amplification, NOT a constant window. That
    * totality is load-bearing: it is what makes the newest compact
    * supersede every older sibling and the cutoff rule race-free. For
    * loops whose ingested volume grows large, run the offline
    * [[requireDistinctPaths]]-guarded family compaction (fold into a NEW
    * base) periodically and restart the loop's accretion from zero.
    * Returns true when a fold (or its replay repair) ran.
    */
  def compactOwnSubtrees(spark: SparkSession, path: String, queryTag: String,
      batchId: Long, maxLiveSubtrees: Int)
      (mergeInto: (Seq[String], String) => Unit): Boolean = {
    require(maxLiveSubtrees >= 1,
      s"maxLiveSubtrees must be >= 1 when compaction is enabled, got $maxLiveSubtrees")
    requireBatchIdFresh(spark, path, queryTag, batchId, "compactOwnSubtrees")
    val conf = spark.sessionState.newHadoopConf()
    def qualified(d: String) = {
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(conf).makeQualified(p).toString
    }
    val own = qualified(ingestBatchDir(path, queryTag, batchId))
    val target = ingestBatchDir(path, queryTag + CompactTagSuffix, batchId)
    val targetQ = qualified(target)
    val (liveDirs, staleDirs) = listOwnDirs(spark, path, queryTag)
    val targetP = new org.apache.hadoop.fs.Path(target)
    val fs = targetP.getFileSystem(conf)
    // garbage-collect the PREVIOUS cycle's superseded sources plus any
    // unmarked (crashed-publish) compact debris — readers exclude both
    // via the cutoff rule, so this is invisible to probes; deleting an
    // unmarked target here is also the crashed-fold repair (its sources
    // are intact, the re-merge below rebuilds it)
    staleDirs.foreach(s => fs.delete(new org.apache.hadoop.fs.Path(s), true))
    if (fs.exists(targetP)) return true // replay after a completed fold
    // foreign-named dirs (no b_<n> id) are never merge sources: the
    // cutoff rule can't supersede them, so folding them would leave both
    // copies live — probes would double-read their rows forever
    val sources = liveDirs.filterNot(d => d == own || d == targetQ)
      .filter(d => batchIdOf(d.split('/').last).isDefined)
    if (sources.size < maxLiveSubtrees || sources.isEmpty) return false
    writeViaTmp(spark, target)(tmp => mergeInto(sources, tmp))
    // completion marker LAST (atomic single-file create): only now does
    // the compact exist for readers and supersede its sources
    val out = fs.create(
      new org.apache.hadoop.fs.Path(targetP, CompactCompleteMarker), true)
    out.close()
    true
  }

  /** Next free batch id under `path/_ingest/<queryTag>` — the manual
    * (non-streaming) append's id allocator: max existing `b_<n>` + 1, 0
    * on a fresh index. Single-writer by contract (the same contract the
    * ingest loops already carry); a streaming append never calls this —
    * it uses its OWN foreachBatch id so a replay overwrites its subtree.
    */
  def nextAppendBatchId(spark: SparkSession, path: String,
      queryTag: String): Long = {
    val root = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(path, IngestDirName), queryTag)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val plainNext = if (!fs.exists(root)) 0L
    else {
      val ids = fs.listStatus(root).toSeq.collect {
        case s if s.isDirectory && s.getPath.getName.startsWith("b_") &&
            !s.getPath.getName.endsWith(TmpSuffix) =>
          s.getPath.getName.stripPrefix("b_").toLong
      }
      if (ids.isEmpty) 0L else ids.max + 1L
    }
    // the allocator must clear the compact cutoff too: after a fold GC'd
    // every plain b_* dir, allocating from the plain namespace alone
    // restarts at 0 — and [[requireBatchIdFresh]] would then refuse the
    // append FOREVER (0 < cutoff on every retry), a dead end where
    // resuming ABOVE the cutoff is perfectly safe and is what a
    // still-running streaming query would do naturally
    plainNext max compactCutoff(spark, path, queryTag).getOrElse(0L)
  }

  /** Stable per-query tag from the QUALIFIED checkpoint path — a restart
    * spelling the same dir differently ("/ckpt/" vs "/ckpt", relative vs
    * absolute) resumes the same Spark checkpoint, and its replayed
    * batches must land on the SAME subtrees or they double-count.
    */
  def queryTagOf(spark: SparkSession, checkpointDir: String): String = {
    val p = new org.apache.hadoop.fs.Path(checkpointDir)
    val qualified = p.getFileSystem(spark.sessionState.newHadoopConf())
      .makeQualified(p).toString
    "q" + java.security.MessageDigest.getInstance("MD5")
      .digest(qualified.getBytes("UTF-8"))
      .take(6).map(b => f"${b & 0xff}%02x").mkString
  }

  // ---------------------------------------------------------------------
  // Write layout / compaction clustering
  // ---------------------------------------------------------------------

  /** The salt-clustered partitioned-write layout all index writers share:
    * hash-cluster rows on (partition column, salt) so `partitionBy` emits
    * at most `filesPerPartition` files per partition value (default: the
    * cluster's parallelism) instead of one per (input task × value) — the
    * ~25k-file shape the sem-index probe measurement caught (13×
    * file-bound; SCALE.md). The salt hashes ALL non-partition columns, so
    * no column-order convention can silently make it constant and
    * serialize the write; optional `sortCols` sort within each output
    * task (after the partition column) so row groups carry tight min/max
    * for pushdown pruning.
    */
  def clusterForPartitionedWrite(df: DataFrame, partCol: String,
      filesPerPartition: Int = 0, sortCols: Seq[String] = Nil): DataFrame = {
    val width =
      if (filesPerPartition > 0) filesPerPartition
      else df.sparkSession.sparkContext.defaultParallelism
    val saltSrc = df.columns.filterNot(_ == partCol).map(col).toIndexedSeq
    require(saltSrc.nonEmpty, s"no non-$partCol columns to salt on")
    val salt = pmod(xxhash64(saltSrc: _*), lit(width.toLong))
    val re = df.repartition(col(partCol), salt)
    if (sortCols.isEmpty) re
    else re.sortWithinPartitions((partCol +: sortCols).map(col): _*)
  }

  /** Qualified-path disjointness for the NEW-path compaction contract: a
    * raw string compare would wave through trailing slashes, `./`
    * prefixes, or double slashes that Spark later resolves to the same
    * live directory — and equality alone would wave through a target
    * NESTED inside the live index (`path + "/compacted"`), whose files
    * would then pollute the source's recursive partition discovery for
    * every later probe.
    */
  def requireDistinctPaths(spark: SparkSession, path: String,
      targetPath: String, op: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    def qualified(p: String) = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(conf).makeQualified(hp)
    }
    val src = qualified(path)
    val dst = qualified(targetPath)
    def contains(outer: org.apache.hadoop.fs.Path,
        inner: org.apache.hadoop.fs.Path): Boolean = {
      var p: org.apache.hadoop.fs.Path = inner
      while (p != null) {
        if (p == outer) return true
        p = p.getParent
      }
      false
    }
    require(!contains(src, dst) && !contains(dst, src),
      s"$op writes a NEW index; a target equal to or nested with the live " +
        s"index ($src vs $dst) would race concurrent probes or corrupt its " +
        "partition discovery — compact to a disjoint path and swap it into " +
        "service")
  }
}
