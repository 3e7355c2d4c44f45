package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCALE.md measurement for round 18 (VERDICT r17 #5): the FULL curation
  * pipeline COMPOSED — HTML text extraction → URL dedup → PII mask →
  * Gopher/C4 → MinHash near-dedup → decontaminate → classifier gate →
  * BPE-count temperature mixture → sequence packing → shuffle-shard —
  * raw crawl markup in, training shards out, driven as one staged
  * flow at R×10 and R×100 salted volume with per-stage wall, row, and
  * shuffle-record accounting. Stages were all proven ALONE in earlier
  * rounds; this drives them together, where a stage's output shape is
  * the next stage's input contract (exactly how r17 caught the
  * batch-WAND fan-out shuffle).
  *
  * Salting scheme (all planted work is REAL work):
  *  - replica k of each base doc gets a fresh id (`+ k·2³²`);
  *  - replicas k ≡ 0 (mod 5) carry the BASE text verbatim → exact-dup
  *    classes of width ~R/5 for the MinHash stage's pre-collapse;
  *    other replicas interleave a salt word between every token
  *    (disjoint 3-shingles — NOT near-dups, they must all survive);
  *  - replicas k ≡ 0 (mod 3) reuse replica 0's URL → URL-key dup
  *    classes of width ~R/3 (same canonical URL, DIFFERENT salted
  *    content — the "same resource re-crawled" shape URL dedup exists
  *    for); other replicas get distinct URLs;
  *    base docs with doc_id % 97 = 0 get NULL urls (the passthrough
  *    contract rides through the composed flow too);
  *  - a per-doc PII payload is planted so the mask stage transforms
  *    (not just copies) every surviving row;
  *  - the decontamination benchmark is the raw text of base docs with
  *    doc_id % 100 = 0, so their VERBATIM replicas (which survive URL +
  *    MinHash dedup as class survivors) are genuinely contaminated.
  *
  * Each stage MATERIALIZES to parquet (staged-materialization on) and
  * the next stage reads it back: stage walls are isolated, and the
  * shuffle-record delta per stage comes from a SparkListener.
  *
  * `sbt "Test/runMain graft.Round18PipelineRehearsalTimer <sfDir> <R>"`
  */
object Round18PipelineRehearsalTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val r = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators._

    val shufRecs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          shufRecs.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten): Unit
        }
    })

    val scratch = java.nio.file.Files
      .createTempDirectory(s"graft_r18_rehearsal_r$r").toString
    def stage(name: String, df: => DataFrame): DataFrame = {
      val dir = s"$scratch/$name"
      val s0 = shufRecs.get()
      val t0 = System.nanoTime()
      df.write.mode("overwrite").parquet(dir)
      val out = spark.read.parquet(dir)
      val n = out.count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[r18rehearse] R=$r $name%-14s rows=$n%9d " +
        f"wall=$wall%7.1fs shuf_rec=${shufRecs.get() - s0}%12d")
      out
    }

    // ---- salted corpus ----
    val docs0 = Tables.documentsBalanced(spark, sfDir)
      .select(col("doc_id"), col("text"), col("source"))
    val corpus = (0 until r).map { k =>
      val text =
        if (k % 5 == 0) col("text")
        else regexp_replace(col("text"), " ", s" s$k ")
      val url = when(col("doc_id") % 97 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("https://Ex.IO/"), col("source"), lit("/d"),
          col("doc_id"),
          if (k % 3 == 0) lit("") else lit(s"?v=$k")))
      docs0.select(
        (col("doc_id") + lit(k.toLong * (1L << 32))).as("doc_id"),
        concat(text, lit(" mail u"), col("doc_id"), lit("@ex.io at 10.0.")
          , col("doc_id") % 256, lit(".7 now")).as("text"),
        col("source"), url.as("url"))
    }.reduce(_ unionAll _)
    val s0all = shufRecs.get()
    val t0all = System.nanoTime()
    val base = stage("salt", corpus)

    // 0. HTML → text: each salted doc arrives as full-page markup (the
    //    crawl shape) and the pipeline starts by extracting. The page
    //    identity in title/h1 uses the BASE doc id (doc_id mod 2^32) so
    //    verbatim replicas produce byte-identical extracted text — the
    //    dedup planting must survive the extraction stage.
    val s0 = stage("html_extract",
      base.select(col("doc_id"),
        Html.extractText(concat(
          lit("<html><head><title>d"), pmod(col("doc_id"), lit(1L << 32)),
          lit("</title><style>p{x:1}</style><script>if(a<2){b()}</script>"),
          lit("</head><body><h1>d"), pmod(col("doc_id"), lit(1L << 32)),
          lit("</h1><p>"), col("text"),
          lit("</p><!-- c --></body></html>"))).as("text"),
        col("source"), col("url")))

    // 1. URL-key dedup (free pre-content key; null urls pass through)
    val s1 = stage("url_dedup",
      Urls.dedupByUrl(s0, "doc_id", "url").drop("url"))

    // 2. PII mask — the MASKED text flows downstream
    val s2 = stage("pii_mask",
      Pii.maskPii(s1, "text")
        .select(col("doc_id"), col("text_masked").as("text"), col("source")))

    // 3. Gopher rules + C4 line clean (pipeline4's fallback shape: a page
    //    whose every line fails the line rule keeps its stage input)
    val s3 = stage("gopher_c4", {
      val g = QualityFilters.gopherFlags(s2, "text")
        .filter(col("g_word_count") && col("g_mean_word_len") &&
          col("g_symbol_ratio") && col("g_alpha_words"))
        .select("doc_id", "text", "source")
      QualityFilters.c4CleanLines(g, "text")
        .filter(!col("c4_page_drop"))
        .select(col("doc_id"),
          when(col("c4_lines_kept") > 0, col("c4_text"))
            .otherwise(col("text")).as("text"),
          col("source"))
    })

    // 4. MinHash near-dedup (exact pre-collapse eats the planted
    //    verbatim classes; banded LSH + star guard for the rest)
    val s4 = stage("minhash_dedup",
      Dedup.dedupNear(s3, "doc_id", "text", minAgreeFraction = 0.5))

    // 5. decontaminate vs the raw bench slice (verbatim replicas of
    //    bench docs are genuinely contaminated and must drop)
    val bench = docs0.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id"), col("text"))
    val s5 = stage("decontaminate",
      Decontaminate.cleanByOverlap(s4, bench, "doc_id", "text",
        maxOverlapPpm = 200000L, n = 3))

    // 6. learned classifier gate (map-side logit >= 0) — the ONE shared
    // oracle-locked model, not a re-derived copy of its formula
    val clf = graft.queries.TextQueries.ClfModel
    val s6 = stage("clf_gate",
      QualityClassifier.filterByScore(s5, "text", clf, thresholdMicro = 0L)
        .select("doc_id", "text", "source"))

    // 7. BPE model-true counts -> temperature mixture (α = 1/2 weights
    //    derived from the surviving corpus itself; budget = half of the
    //    surviving token mass, so the sampler always has real work)
    val s7 = stage("bpe_mixture", {
      val dt = s6.select(col("doc_id"), col("source"),
        Bpe.tokenCount(col("text"), graft.queries.BpeQueries.FixedModel)
          .as("n_tokens"))
        .filter(col("n_tokens") >= 1)
      val totals = Sampling.domainTokenTotals(dt, col("source"), col("n_tokens"))
      val budget = math.max(1L, totals.map(_._2).sum / 2)
      Sampling.mixtureByTokenBudget(dt, col("source"), col("doc_id"),
        col("n_tokens"), Sampling.sqrtTemperatureWeightsPpm(totals), budget,
        precomputedTotals = Some(totals.toMap))
    })

    // 8. epoch fan-out + sequence packing per source (2048-token budget)
    val s8 = stage("pack", {
      val e = Sampling.explodeCopies(s7, col("copies"))
      val k = e.select(
        (col("epoch") * lit(1L << 40) + col("doc_id")).as("copy_id"),
        col("source"), col("n_tokens"))
      Packing.packCounts(k, "copy_id", "source", "n_tokens", 2048L)
    })

    // 9. deterministic shuffle-shard of the distinct SEQUENCES
    val s9 = stage("shuffle_shard", {
      val seqs = s8.groupBy(col("source"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("seq_tokens"))
        .withColumn("__sid", concat_ws(":", col("source"), col("seq_id")))
      Sampling.shuffleShard(seqs, col("__sid"), nShards = 64, seed = "e1")
        .drop("__sid")
    })
    val _ = s9

    println(f"[r18rehearse] R=$r TOTAL wall=${(System.nanoTime() - t0all) / 1e9}%.1fs " +
      f"shuf_rec=${shufRecs.get() - s0all}")
    // scratch is /tmp-local and PID-unique; leave cleanup to the OS if
    // the JVM dies, otherwise delete (100x legs write ~GBs)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(scratch))
    spark.stop()
  }
}
