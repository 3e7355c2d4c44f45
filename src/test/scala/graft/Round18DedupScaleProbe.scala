package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 diagnostic: where do the minhash-dedup stage's shuffle
  * records come from at rehearsal volume? Reports, for the rehearsal's
  * salted corpus at R: distinct-content rows after exact pre-collapse,
  * LSH candidate-pair count, verified near-dup pair count, and the
  * shuffle records of each phase in isolation.
  *
  * `sbt "Test/runMain graft.Round18DedupScaleProbe <sfDir> <R>"`
  */
object Round18DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val r = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup

    val shufRecs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          shufRecs.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten): Unit
        }
    })
    def phase[A](name: String)(f: => A): A = {
      val s0 = shufRecs.get(); val t0 = System.nanoTime()
      val a = f
      println(f"[r18probe] R=$r $name%-18s wall=${(System.nanoTime() - t0) / 1e9}%6.1fs " +
        f"shuf_rec=${shufRecs.get() - s0}%12d")
      a
    }

    val docs0 = Tables.documentsBalanced(spark, sfDir)
      .select(col("doc_id"), col("text"), col("source"))
    val corpus = (0 until r).map { k =>
      val text =
        if (k % 5 == 0) col("text")
        else regexp_replace(col("text"), " ", s" s$k ")
      docs0.select(
        (col("doc_id") + lit(k.toLong * (1L << 32))).as("doc_id"),
        text.as("text"))
    }.reduce(_ unionAll _).localCheckpoint(true)

    val n = phase("count")(corpus.count())
    val distinctContent = phase("exact_distinct")(
      corpus.select(md5(col("text"))).distinct().count())
    val sigs = phase("signatures")(
      Dedup.minhashSignatures(corpus, "doc_id", "text").localCheckpoint(true))
    val nCand = phase("lsh_candidates")(
      Dedup.lshCandidates(sigs, "doc_id").count())
    val nPairs = phase("verified_pairs")(
      Dedup.nearDuplicates(corpus, "doc_id", "text").count())
    val nKept = phase("dedupNear")(
      Dedup.dedupNear(corpus, "doc_id", "text").count())
    println(s"[r18probe] R=$r rows=$n distinct_content=$distinctContent " +
      s"candidates=$nCand verified=$nPairs kept=$nKept")
    spark.stop()
  }
}
