package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 SCALE measurement: throughput of the fused BPE encode
  * kernels at rehearsal volume, against the two baselines that bound
  * them — whitespace token counting (the surface BPE replaces; pure
  * split+size) and the DSIR scoring kernel (the existing fused-kernel
  * family member). Also measures the per-task word-memo's effect by
  * running the count once with a memo-defeating unique-word corpus.
  *
  * Corpus: the rehearsal salting at R (verbatim + salt-interleaved
  * replicas — the memo-friendly shape real corpora have), and a
  * worst-case leg where every word carries its doc id (every word
  * unique → every merge loop runs cold).
  *
  * `sbt "Test/runMain graft.Round18BpeThroughputTimer <sfDir> <R>"`
  */
object Round18BpeThroughputTimer {
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
    import graft.operators.{Bpe, Dsir, Tokenizer}

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

    val model = graft.queries.BpeQueries.FixedModel
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val v = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[r18bpe] R=$r $label%-22s ${s}%6.2f s  " +
        f"${chars / s / 1e6}%8.1f MB/s  (result $v)")
    }

    // warm the JIT once on a small slice
    corpus.limit(1000).select(Bpe.tokenCount(col("text"), model))
      .agg(sum("*")).collect()

    t("ws_count (baseline)")(corpus
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0))
    t("bpe_count")(corpus
      .select(Bpe.tokenCount(col("text"), model).as("n"))
      .agg(sum("n")).collect()(0).getLong(0))
    t("bpe_ids (materialized)")(corpus
      .select(size(Bpe.ids(col("text"), model)).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0))
    t("dsir_score (kernel ref)")(Dsir.score(corpus, "text",
        Dsir.Model(8192, Tokenizer.Ascii.tag, 1.0, Array.fill(8192)(1L)))
      .agg(sum("dsir_weight_q")).collect()(0).getLong(0))

    // memo-defeating corpus: EVERY word gets a per-doc suffix, so the
    // distinct-word population per task (~docs/task × words/doc ≈ 10⁶)
    // dwarfs the 2^16 memo and the merge loop runs cold for nearly every
    // word. (The first version of this leg salted ONE word per doc
    // between the untouched originals — the originals stayed memoized
    // and the salt memo-hit after its first occurrence, so the "cold"
    // number was actually warm; review round 18.) The suffix also
    // lengthens every word by ~7 chars, which biases AGAINST the kernel
    // — acceptable for a worst-case bound.
    val cold = corpus.select(col("doc_id"),
      regexp_replace(col("text"), lit("([a-z0-9]+)"),
        concat(lit("$1u"), pmod(col("doc_id"), lit(999983)))).as("text"))
      .localCheckpoint(true)
    cold.count()
    val coldDistinct = cold
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(approx_count_distinct(col("w"))).collect()(0).getLong(0)
    val coldChars = cold.agg(sum(length(col("text")))).collect()(0).getLong(0)
    val t0c = System.nanoTime()
    val vc = cold.select(Bpe.tokenCount(col("text"), model).as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    val sc = (System.nanoTime() - t0c) / 1e9
    println(f"[r18bpe] R=$r bpe_count COLD words     ${sc}%6.2f s  " +
      f"${coldChars / sc / 1e6}%8.1f MB/s  (result $vc; " +
      f"~$coldDistinct distinct words, chars=$coldChars)")
    // the whitespace floor on the SAME grown corpus, for a like-for-like
    // cold ratio
    val t0w = System.nanoTime()
    val vw = cold.select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    val sw = (System.nanoTime() - t0w) / 1e9
    println(f"[r18bpe] R=$r ws_count COLD corpus     ${sw}%6.2f s  " +
      f"${coldChars / sw / 1e6}%8.1f MB/s  (result $vw)")

    println(s"[r18bpe] R=$r docs=$nDocs chars=$chars")
    spark.stop()
  }
}
