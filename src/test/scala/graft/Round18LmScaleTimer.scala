package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 SCALE measurement: the n-gram LM at rehearsal volume —
  * (a) FIT cost and model size as the reference corpus grows (the
  * distributed gram aggregate + capped collect), and (b) SCORE
  * throughput of the fused backoff kernel over the salted 100× corpus,
  * against the kernel-family references (`dsir_score`: 2 md5 hashes per
  * position; `bpe_count`: greedy merge loop per word) and the
  * whitespace split+size floor. The LM kernel does up to 5 HashMap
  * probes per position (two gram orders × gram+context, plus the
  * unigram) over strings it builds per position — the measurement
  * bounds what that costs in practice.
  *
  * `sbt "Test/runMain graft.Round18LmScaleTimer <sfDir> <R>"`
  */
object Round18LmScaleTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val r = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Dsir, NgramLm, Tokenizer}

    val docs0 = Tables.documentsBalanced(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val corpus = (0 until r).map { k =>
      val text =
        if (k % 5 == 0) col("text")
        else regexp_replace(col("text"), " ", s" s$k ")
      docs0.select((col("doc_id") + lit(k.toLong * (1L << 32))).as("doc_id"),
        text.as("text"))
    }.reduce(_ unionAll _).localCheckpoint(true)
    val nDocs = corpus.count()
    val chars = corpus.agg(sum(length(col("text")))).collect()(0).getLong(0)

    // ---- fit: reference corpus = the UNSALTED base (the CCNet shape:
    // clean reference, dirty crawl), then the salted corpus itself to
    // show fit cost scaling with reference size ----
    def fitT(label: String, df: org.apache.spark.sql.DataFrame,
        minCount: Long): NgramLm.Model = {
      val t0 = System.nanoTime()
      val m = NgramLm.fit(df, "text", n = 3, minCount = minCount,
        maxEntries = 1 << 24)
      val s = (System.nanoTime() - t0) / 1e9
      val tag = s"fit($label)"
      println(f"[r18lm] R=$r $tag%-34s ${s}%6.2f s  " +
        f"${m.grams.length}%9d grams  total=${m.totalTokens}")
      m
    }
    val model = fitT("base, minCount=2", docs0, 2L)
    fitT("salted 100x, minCount=2", corpus, 2L)

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val v = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[r18lm] R=$r $label%-28s ${s}%6.2f s  " +
        f"${chars / s / 1e6}%8.1f MB/s  (result $v)")
    }

    // warm the JIT once on a small slice
    corpus.limit(1000).select(NgramLm.logprob(col("text"), model).as("s"))
      .agg(sum("s")).collect()

    t("ws_count (floor)")(corpus
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0))
    t("dsir_score (kernel ref)")(Dsir.score(corpus, "text",
        Dsir.Model(8192, Tokenizer.Ascii.tag, 1.0, Array.fill(8192)(1L)))
      .agg(sum("dsir_weight_q")).collect()(0).getLong(0))
    t("lm_logprob (n=3)")(corpus
      .select(NgramLm.logprob(col("text"), model).as("s"))
      .agg(sum("s")).collect()(0).getLong(0))
    t("lm_logprob+nll (the CCNet leg)")(
      NgramLm.scoreWithNll(corpus, "text", model)
        .agg(sum("lm_nll_per_tok_q")).collect()(0).getLong(0))

    // worst case: salted replicas make most bigrams/trigrams model-MISSES
    // (every backoff bottoms out) — measured above; the complementary
    // worst case is all-HITS at full order, measured on the verbatim base
    // replicated (k%5==0 rows only → model-true text)
    val hits = corpus.where(pmod(floor(col("doc_id") / lit(1L << 32)),
      lit(5)) === 0).localCheckpoint(true)
    val hitChars = hits.agg(sum(length(col("text")))).collect()(0).getLong(0)
    val t0 = System.nanoTime()
    val v = hits.select(NgramLm.logprob(col("text"), model).as("s"))
      .agg(sum("s")).collect()(0).getLong(0)
    val s = (System.nanoTime() - t0) / 1e9
    println(f"[r18lm] R=$r lm_logprob ALL-HIT verbatim     ${s}%6.2f s  " +
      f"${hitChars / s / 1e6}%8.1f MB/s  (result $v)")

    println(s"[r18lm] R=$r docs=$nDocs chars=$chars")
    spark.stop()
  }
}
