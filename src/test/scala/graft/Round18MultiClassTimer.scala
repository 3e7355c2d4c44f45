package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 SCALE measurement: the fused K-class kernel
  * ([[graft.functions.DsirScoreMulti]]) vs K independent single-class
  * passes — the fusion claim behind
  * [[graft.operators.QualityClassifier.classifyMulti]]. Each gram
  * tokenizes and md5-hashes ONCE in the fused kernel and K times in
  * the per-class shape, so the gap should grow toward the
  * tokenize+hash share of the kernel as K rises.
  *
  * `sbt "Test/runMain graft.Round18MultiClassTimer <sfDir> <R>"`
  */
object Round18MultiClassTimer {
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
    import graft.operators.QualityClassifier

    val docs0 = Tables.documentsBalanced(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val corpus = (0 until r).map { k =>
      docs0.select((col("doc_id") + lit(k.toLong * (1L << 32))).as("doc_id"),
        col("text"))
    }.reduce(_ unionAll _).localCheckpoint(true)
    val nDocs = corpus.count()
    val chars = corpus.agg(sum(length(col("text")))).collect()(0).getLong(0)

    def modelsOf(k: Int): Seq[(String, QualityClassifier.Model)] = {
      val base = graft.queries.TextQueries.ClfMultiModels.head._2
      (0 until k).map { c =>
        s"c$c" -> base.copy(biasMicro = c * 1000L,
          wMicro = Array.tabulate(base.buckets)(
            b => ((b + c * 131) % 977 - 488).toLong))
      }
    }

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val v = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[r18mc] R=$r $label%-26s ${s}%6.2f s  " +
        f"${chars / s / 1e6}%8.1f MB/s  (result $v)")
    }
    // warm JIT
    QualityClassifier.classifyMulti(corpus.limit(1000), "text", modelsOf(3))
      .agg(sum("clf_logit_q")).collect()

    for (k <- Seq(3, 16)) {
      val ms = modelsOf(k)
      t(s"fused classifyMulti K=$k")(
        QualityClassifier.classifyMulti(corpus, "text", ms)
          .agg(sum("clf_logit_q")).collect()(0).getLong(0))
      t(s"K=$k separate score passes")(
        ms.map { case (_, m) =>
          QualityClassifier.score(corpus, "text", m)
            .agg(sum("clf_logit_q")).collect()(0).getLong(0)
        }.max)
    }
    println(s"[r18mc] R=$r docs=$nDocs chars=$chars")
    spark.stop()
  }
}
