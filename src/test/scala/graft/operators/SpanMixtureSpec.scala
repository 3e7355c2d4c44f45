package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Substring-level (duplicated token span) dedup, domain-mixture sampling,
  * and the one-call streaming ingest loop.
  */
class SpanMixtureSpec extends SparkSpec {
  import spark.implicits._

  // d1/d2 share the 7-token run "alpha..eta"; d3 repeats a 5-gram WITHIN
  // itself only; d4 is unrelated
  private lazy val spanDocs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta solo1 solo2 solo3"),
    (2L, "pre1 alpha beta gamma delta epsilon zeta eta post1"),
    (3L, "u1 u2 u3 u4 u5 x y z u1 u2 u3 u4 u5"),
    (4L, "completely different tokens about engines and planners here")
  ).toDF("doc_id", "text")

  test("duplicateTokenSpans finds cross-doc spans and merges overlaps") {
    val spans = SpanDedup.duplicateTokenSpans(spanDocs, "doc_id", "text",
        n = 5, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // d1: windows at 0,1,2 (alpha..eta = positions 0..6) merge to [0,7)
    // d2: same run at positions 1..7 -> windows 1,2,3 merge to [1,8)
    assert(spans === Set((1L, 0L, 7L), (2L, 1L, 8L)),
      s"expected the shared 7-token run only, got $spans")
  }

  test("within-document repetition does not count toward minDocs") {
    val spans = SpanDedup.duplicateTokenSpans(spanDocs, "doc_id", "text",
        n = 5, minDocs = 2)
      .filter(col("doc_id") === 3L).count()
    assert(spans === 0L, "doc 3's self-repeat must not be a duplicated span")
  }

  test("removeDuplicateSpans cuts exactly the merged spans") {
    val out = SpanDedup.removeDuplicateSpans(spanDocs, "doc_id", "text",
        n = 5, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) === (("solo1 solo2 solo3", 7L)))
    assert(out(2L) === (("pre1 post1", 7L)))
    assert(out(3L)._2 === 0L) // untouched: spans only cut cross-doc duplicates
    assert(out(4L)._2 === 0L)
    // normalization-faithful: untouched docs rebuild to their token join
    assert(out(4L)._1 === "completely different tokens about engines and planners here")
  }

  test("exact-copy multiplicity counts toward minDocs under the collapse") {
    // 1 and 2 are byte-identical; no OTHER doc shares their grams. The
    // collapse computes grams once for the pair but must still count df=2.
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally unrelated tokens about query planners")
    ).toDF("doc_id", "text")
    val spans = SpanDedup.duplicateTokenSpans(df, "doc_id", "text", n = 5, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans === Set((1L, 0L, 6L), (2L, 0L, 6L)),
      s"both copies must carry the full-doc span, got $spans")
  }

  test("collapsed and naive span paths agree on a duplicated corpus") {
    // spanDocs plus exact twins of every doc under new ids — the crawl shape
    val twins = spanDocs.select((col("doc_id") + 100L).as("doc_id"), col("text"))
    val corpus = spanDocs.union(twins)
    def run(collapse: Boolean) =
      SpanDedup.duplicateTokenSpans(corpus, "doc_id", "text",
          n = 5, minDocs = 2, collapseExact = collapse)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val (c, naive) = (run(true), run(false))
    assert(c === naive, s"collapse changed semantics: ${c.diff(naive)} / ${naive.diff(c)}")
    // and the twins make previously-unique docs fully duplicated now
    assert(c.contains((4L, 0L, 8L)) && c.contains((104L, 0L, 8L)),
      s"doc 4 + twin must be a full-doc span now: $c")
  }

  test("keep-first removal leaves each span's first-occurrence doc intact") {
    // shared run "alpha..eta": first occurrence is doc 1 -> doc 1 keeps it,
    // doc 2 loses it; unrelated docs untouched
    val out = SpanDedup.removeDuplicateSpansKeepFirst(spanDocs, "doc_id", "text",
        n = 5, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) === (("alpha beta gamma delta epsilon zeta eta solo1 solo2 solo3", 0L)),
      s"doc 1 is the keeper and must stay whole: ${out(1L)}")
    assert(out(2L) === (("pre1 post1", 7L)))
    assert(out(3L)._2 === 0L && out(4L)._2 === 0L)
  }

  test("keep-first removal keeps exactly one copy of an exact-duplicate clique") {
    val text = "alpha beta gamma delta epsilon zeta eta"
    val df = Seq((5L, text), (6L, text), (7L, text),
        (9L, "unrelated words about catalyst plans here"))
      .toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicateSpansKeepFirst(df, "doc_id", "text",
        n = 5, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(5L) === ((text, 0L)), s"lowest id keeps the content: ${out(5L)}")
    assert(out(6L) === (("", 7L)) && out(7L) === (("", 7L)))
    assert(out(9L)._2 === 0L)
  }

  test("mixture sampling follows the integer epoch+remainder rule per row") {
    val rows = (0 until 50).map(i => (i.toLong, if (i < 30) "a" else "b", 10L))
    val df = rows.toDF("id", "dom", "n_tokens")
    // totals: a=300, b=200. budget 1000: a@500000ppm -> target 500 ->
    // copies 1 + rem 200/300; b@100000ppm -> target 100 -> copies 0 + 1/2
    val out = Sampling.mixtureByTokenBudget(df, col("dom"), col("id"),
        col("n_tokens"), Seq("a" -> 500000L, "b" -> 100000L), 1000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toList
    assert(out.nonEmpty)
    // recompute the rule independently per row
    val expected = rows.flatMap { case (id, dom, _) =>
      val (copies, remPpm) =
        if (dom == "a") (500L / 300L, 500L % 300L * 1000000L / 300L)
        else (100L / 200L, 100L % 200L * 1000000L / 200L)
      val bucket = {
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
        val hex = h.take(4).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex, 16) % 1000000L
      }
      val c = copies + (if (bucket < remPpm) 1L else 0L)
      if (c > 0) Some((id, dom, c)) else None
    }.toList
    assert(out.sortBy(_._1) === expected.sortBy(_._1))
    // a-domain rows never drop below one full epoch
    assert(out.filter(_._2 == "a").forall(_._3 >= 1L))
  }

  test("mixture sampling drops unweighted domains and rejects empty weights") {
    val df = Seq((1L, "a", 5L), (2L, "zzz", 5L)).toDF("id", "dom", "n")
    val kept = Sampling.mixtureByTokenBudget(df, col("dom"), col("id"),
        col("n"), Seq("a" -> 900000L), 100L)
      .select("dom").distinct().collect().map(_.getString(0)).toSet
    assert(kept === Set("a"))
    intercept[IllegalArgumentException] {
      Sampling.mixtureByTokenBudget(df, col("dom"), col("id"), col("n"),
        Seq("nope" -> 500000L), 100L)
    }
  }

  test("in-plan mixture equals the collect form row-for-row (static and temperature weights)") {
    // varied shape: dominant domain, small domain, zero-token domain (must
    // drop from rules), unweighted domain (static path drops it), null
    // domain (never sampled), and ids spread over the ppm bucket space
    val rows = (0 until 80).map { i =>
      val dom = i % 5 match {
        case 0 => "a"; case 1 => "a"; case 2 => "b"; case 3 => "zz"; case 4 => null
      }
      (i.toLong * 7919L, dom, if (dom == "b" && i < 10) 0L else (i % 13 + 1).toLong)
    }
    val df = rows.toDF("id", "dom", "n_tokens")
    val weights = Seq("a" -> 700000L, "b" -> 250000L, "ghost" -> 50000L)
    val budget = 12345L
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))
    val coll = Sampling.mixtureByTokenBudget(df, col("dom"), col("id"),
      col("n_tokens"), weights, budget).collect().map(key).sorted
    val inPlan = Sampling.mixtureByTokenBudgetInPlan(df, col("dom"), col("id"),
      col("n_tokens"), weights, budget).collect().map(key).sorted
    assert(inPlan === coll, "static-weight in-plan mixture must be row-identical")
    // temperature path: derive-weights → sample, both forms
    val totals = Sampling.domainTokenTotals(df, col("dom"), col("n_tokens"))
    val collT = Sampling.mixtureByTokenBudget(df, col("dom"), col("id"),
        col("n_tokens"), Sampling.sqrtTemperatureWeightsPpm(totals), budget,
        precomputedTotals = Some(totals.toMap))
      .collect().map(key).sorted
    val inPlanT = Sampling.sqrtTemperatureMixtureInPlan(df, col("dom"),
      col("id"), col("n_tokens"), budget).collect().map(key).sorted
    assert(inPlanT === collT, "temperature in-plan mixture must be row-identical")
    assert(inPlanT.nonEmpty && inPlan.nonEmpty)
  }

  test("in-plan sqrt-temperature weights equal the driver derivation on perfect squares and ties") {
    // totals chosen to exercise the isqrt boundary corrections (perfect
    // squares, off-by-one) and the largest-remainder tie order
    val tot = Seq(("a", 49L), ("b", 50L), ("c", 48L), ("d", 1L), ("e", 1000000L))
      .toDF("__dom", "__total")
    val inPlan = Sampling.sqrtTemperatureWeightsDf(tot)
      .select("__dom", "__ppm").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val driver = Sampling.sqrtTemperatureWeightsPpm(
      Seq("a" -> 49L, "b" -> 50L, "c" -> 48L, "d" -> 1L, "e" -> 1000000L)).toMap
    assert(inPlan === driver)
    assert(inPlan.values.sum === 1000000L, "ppm apportionment must sum to 1e6")
  }

  test("explodeCopies materializes one row per epoch and drops non-positive rows") {
    val df = Seq((1L, 3L), (2L, 1L), (3L, 0L)).toDF("id", "copies")
    val out = Sampling.explodeCopies(df, col("copies"))
      .select("id", "epoch").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L)),
      s"3 epochs for id 1, one for id 2, none for id 3: $out")
  }

  test("packCounts packs epoch-major copy ids contiguously per group") {
    // two docs of 600 tokens, 2 copies each -> epoch-major copy order packs
    // (e0d1,e0d2),(e1d1,e1d2) into 1024-token sequences: seq ids 0,0,1,1 ...
    val rows = Seq((1L, "g", 600L, 2L), (2L, "g", 600L, 2L))
      .toDF("doc_id", "source", "n_tokens", "copies")
    val k = Sampling.explodeCopies(rows, col("copies"))
      .select((col("epoch") * 1000L + col("doc_id")).as("copy_id"),
        col("source"), col("n_tokens"))
    val packed = Packing.packCounts(k, "copy_id", "source", "n_tokens", 1024L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // first-token positions: 0,600,1200,1800 -> div 1024 = 0,0,1,1
    assert(packed === Map(1L -> 0L, 2L -> 0L, 1001L -> 1L, 1002L -> 1L),
      s"running-fill must assign by first-token position: $packed")
  }

  test("streamingIngest: probe -> within-batch dedup -> sink -> append, per microbatch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val idx = tempDir("graft_sigidx_si") + "/idx"
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
      .toDF("doc_id", "text")
    Dedup.writeSignatureIndex(corpus, "doc_id", "text", idx)

    val in = MemoryStream[(Long, String)]
    val perBatch = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val q = Dedup.streamingIngest(in.toDF().toDF("doc_id", "text"),
      "doc_id", "text", idx, tempDir("graft_si_ckpt"),
      sink = (clean, batchId) => {
        perBatch(batchId) = clean.select("doc_id").collect().map(_.getLong(0)).toSet
        ()
      },
      minAgreeFraction = 0.3)
    try {
      // batch 0: an indexed near-dup (drops), a new doc, and a WITHIN-batch
      // near-dup pair of that new doc (one survivor of the two)
      in.addData(
        (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
        (11L, "one two three four five six seven eight nine ten eleven twelve"),
        (12L, "one two three four five six seven eight nine ten eleven thirteen"))
      q.processAllAvailable()
      assert(perBatch(0L) === Set(11L),
        s"batch 0 must keep only the within-batch survivor: ${perBatch.toMap}")
      // batch 1: near-dup of the doc APPENDED in batch 0 -> caught via the
      // index append; plus one genuinely new doc
      in.addData(
        (20L, "one two three four five six seven eight nine ten eleven fourteen"),
        (21L, "entirely unrelated words about spark parquet shuffles and caching"))
      q.processAllAvailable()
      assert(perBatch(1L) === Set(21L),
        s"batch 1 must drop the near-dup of the appended doc: ${perBatch.toMap}")
    } finally q.stop()
  }

  test("streamingLineIngest: combined-count strip -> sink -> append, per microbatch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val idx = tempDir("graft_lineidx_si") + "/idx"
    // pre-built index: HEADER df 2 (frequent), SPLIT LINE df 1 (under minDf)
    Boilerplate.writeLineFreqIndex(Seq(
        (1L, "d", "HEADER\nbody one"),
        (2L, "d", "HEADER\nbody two"),
        (3L, "d", "SPLIT LINE\nbody three"))
      .toDF("doc_id", "source", "text"),
      "doc_id", "text", "source", idx)

    val in = MemoryStream[(Long, String, String)]
    val perBatch =
      scala.collection.mutable.Map.empty[Long, Map[Long, (String, Long)]]
    val q = Boilerplate.streamingLineIngest(
      in.toDF().toDF("doc_id", "source", "text"),
      "doc_id", "text", "source", idx, tempDir("graft_li_ckpt"),
      sink = (stripped, batchId) => {
        perBatch(batchId) = stripped.select("doc_id", "text_kept", "lines_removed")
          .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
        ()
      },
      minDf = 2L)
    try {
      // batch 0 exercises all three strip sources: index-frequent
      // (HEADER), split across the boundary (SPLIT LINE: index df 1 +
      // batch df 1), and frequent within the batch alone (BATCH LINE,
      // two batch docs)
      in.addData(
        (10L, "d", "HEADER\nfresh a"),
        (11L, "d", "SPLIT LINE\nfresh b"),
        (12L, "d", "BATCH LINE\nfresh c"),
        (13L, "d", "BATCH LINE\nfresh d"))
      q.processAllAvailable()
      assert(perBatch(0L) === Map(
        10L -> (("fresh a", 1L)), 11L -> (("fresh b", 1L)),
        12L -> (("fresh c", 1L)), 13L -> (("fresh d", 1L))),
        s"batch 0: ${perBatch.toMap}")
      // batch 1: BATCH LINE now lives in the index via the batch-0
      // append; SPLIT LINE's partials (1 pre-index + 1 appended) sum to
      // minDf; a genuinely unique doc passes untouched
      in.addData(
        (20L, "d", "BATCH LINE\nlate"),
        (21L, "d", "SPLIT LINE\nlate two"),
        (22L, "d", "unique forever\nkeep me"))
      q.processAllAvailable()
      assert(perBatch(1L) === Map(
        20L -> (("late", 1L)), 21L -> (("late two", 1L)),
        22L -> (("unique forever\nkeep me", 0L))),
        s"batch 1: ${perBatch.toMap}")
    } finally q.stop()
  }

  test("ingestLineBatch replay is idempotent: identical strip output, no double counts") {
    val idx = tempDir("graft_lineidx_rp") + "/idx"
    Boilerplate.writeLineFreqIndex(
      Seq((1L, "d", "SPLIT LINE\nbody one")).toDF("doc_id", "source", "text"),
      "doc_id", "text", "source", idx)
    val batch0 = Seq(
      (10L, "d", "SPLIT LINE\nfresh a"),
      (11L, "d", "ONCE ONLY\nfresh b")).toDF("doc_id", "source", "text")
    val results = scala.collection.mutable.ArrayBuffer
      .empty[Map[Long, (String, Long)]]
    def runBatch0(): Unit = Boilerplate.ingestLineBatch(batch0, "doc_id",
      "text", "source", idx, "qtest", batchId = 0L, minDf = 2L,
      sink = (s, _) => {
        results += s.select("doc_id", "text_kept", "lines_removed")
          .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
        ()
      })
    runBatch0()
    assert(results.last === Map(
      10L -> (("fresh a", 1L)), 11L -> (("ONCE ONLY\nfresh b", 0L))),
      s"first run: ${results.last}")
    // REPLAY the same (queryTag, batchId) — the crash-after-subtree-write
    // scenario. The probe excludes the batch's own subtree, so the result
    // must be IDENTICAL; the old blind-append design would have summed
    // the pre-crash counts with the recount and stripped ONCE ONLY too.
    runBatch0()
    assert(results(1) === results(0),
      s"replay must re-derive the identical strip: ${results(1)} vs ${results(0)}")
    // and the index state is not doubled: a later doc carrying ONCE ONLY
    // sees df 1 (kept) — doubled counts would read df 2 and strip it
    val later = Boilerplate.stripAgainstLineIndex(
        Seq((20L, "d", "ONCE ONLY\nlater doc")).toDF("doc_id", "source", "text"),
        "doc_id", "text", "source", idx, minDf = 2L)
      .select("text_kept", "lines_removed").collect().head
    assert(later.getString(0) === "ONCE ONLY\nlater doc" && later.getLong(1) === 0L,
      s"replayed batch must count once, got $later")
    // a DIFFERENT batch accumulates on top of the subtree as usual
    val batch1 = Seq((30L, "d", "ONCE ONLY\nnext batch")).toDF("doc_id", "source", "text")
    Boilerplate.ingestLineBatch(batch1, "doc_id", "text", "source", idx,
      "qtest", batchId = 1L, minDf = 2L, sink = (s, _) => {
        val m = s.select("doc_id", "text_kept").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(m === Map(30L -> "next batch"),
          s"batch-0 subtree counts must combine with batch 1's own: $m")
        ()
      })
    // compaction folds the ingest subtrees into a fresh base layout
    val compacted = tempDir("graft_lineidx_rp") + "/compacted"
    Boilerplate.compactLineFreqIndex(spark, idx, compacted)
    val afterCompact = Boilerplate.stripAgainstLineIndex(
        Seq((40L, "d", "ONCE ONLY\nafter compact")).toDF("doc_id", "source", "text"),
        "doc_id", "text", "source", compacted, minDf = 2L)
      .select("lines_removed").collect().head.getLong(0)
    assert(afterCompact === 1L,
      "compacted index must carry the merged subtree counts (ONCE ONLY df 2)")
  }

  test("a crashed line-ingest stage (.tmp subtree) is invisible to probes and healed by replay") {
    val idx = tempDir("graft_lineidx_tmp") + "/idx"
    Boilerplate.writeLineFreqIndex(
      Seq((1L, "d", "SPLIT LINE\nbody one")).toDF("doc_id", "source", "text"),
      "doc_id", "text", "source", idx)
    val batch0 = Seq((10L, "d", "SPLIT LINE\nfresh a")).toDF("doc_id", "source", "text")
    Boilerplate.ingestLineBatch(batch0, "doc_id", "text", "source", idx,
      "qtmp", batchId = 0L, minDf = 2L, sink = (_, _) => ())
    def probe(): Long = Boilerplate.stripAgainstLineIndex(
        Seq((20L, "d", "SPLIT LINE\nprobe")).toDF("doc_id", "source", "text"),
        "doc_id", "text", "source", idx, minDf = 2L)
      .select("lines_removed").collect().head.getLong(0)
    assert(probe() === 1L, "SPLIT LINE reaches df 2 after the committed batch")
    // simulate a crash mid-replay: garbage parquet-less content in the
    // batch's .tmp stage — listIngestDirs must never surface it
    val tmp = new java.io.File(
      IndexLifecycle.ingestBatchDir(idx, "qtmp", 0L) + IndexLifecycle.TmpSuffix)
    assert(tmp.mkdirs())
    java.nio.file.Files.writeString(tmp.toPath.resolve("junk.txt"), "partial")
    assert(probe() === 1L,
      "an in-flight .tmp stage must be invisible — the committed subtree still counts")
    assert(!IndexLifecycle.listIngestDirs(spark, idx)
        .exists(_.endsWith(IndexLifecycle.TmpSuffix)),
      "listIngestDirs must hide .tmp stages")
    // the healing replay clears the stage and republishes
    Boilerplate.ingestLineBatch(batch0, "doc_id", "text", "source", idx,
      "qtmp", batchId = 0L, minDf = 2L, sink = (_, _) => ())
    assert(!tmp.exists(), "the replay must clear the crashed stage")
    assert(probe() === 1L)
  }
}
