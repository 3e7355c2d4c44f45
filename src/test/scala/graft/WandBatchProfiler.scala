package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-job breakdown of the batch probes (scratch profiler for the
  * round-16 batch-WAND overhead work): runs the plain batch probe and
  * the WAND batch probe against the same index and prints every Spark
  * job's wall time. `sbt "Test/runMain graft.WandBatchProfiler [sfDir]"`.
  */
object WandBatchProfiler {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.Retrieval

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description"))
            .orElse(Option(j.properties.getProperty("callSite.short")))
            .getOrElse("?")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.get(j.jobId)
        if (s != null) lines.add(
          f"  job ${j.jobId}%3d ${(System.nanoTime() - s._1) / 1e6}%8.1f ms  ${s._2.take(90)}")
      }
    })

    // rep > 1 reproduces Round16WandBatchScaleTimer's corpus/batch (the
    // replicated-corpus scaling shape) instead of the flat sf corpus
    val rep = args.lift(1).map(_.toInt).getOrElse(1)
    import org.apache.spark.sql.functions.{col, concat, lit, regexp_replace}
    val docs =
      if (rep == 1) Tables.documentsBalanced(spark, sfDir)
      else (0 until rep)
        .map(r => Tables.documents(spark, sfDir).select("doc_id", "text")
          .withColumn("doc_id", col("doc_id") + lit(r.toLong * (1L << 20)))
          .withColumn("text",
            if (r == 0) col("text")
            else concat(regexp_replace(col("text"), "\\bdup\\b", "dupx"),
              lit(" pad" * (16 * r)))))
        .reduce(_ unionAll _)
    val idx = java.nio.file.Files.createTempDirectory("wbp").toString + "/idx"
    if (rep == 1)
      Retrieval.writeTextIndex(docs, "doc_id", "text", idx, nBuckets = 16,
        blockSize = 64)
    else
      Retrieval.writeTextIndex(docs, "doc_id", "text", idx, blockSize = 128L)
    val batch =
      if (rep == 1) Seq((1L, "hash"), (1L, "join"), (2L, "spark"),
        (2L, "window"), (2L, "scan")).toDF("query_id", "term")
      else Seq(
        (0L, "dup"), (0L, "spark"), (0L, "join"),
        (1L, "dup"), (1L, "hash"), (1L, "window"),
        (2L, "dup"), (2L, "shuffle"),
        (3L, "dup"), (3L, "data"), (3L, "model"),
        (4L, "dup"), (4L, "query"),
        (5L, "dup"), (5L, "stream"), (5L, "batch"),
        (6L, "dup"), (6L, "table"),
        (7L, "dup"), (7L, "index"), (7L, "scan")
      ).toDF("query_id", "term")

    def profile(label: String)(body: => Unit): Unit = {
      lines.clear()
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e6
      Thread.sleep(500)
      println(f"\n== $label: $wall%.0f ms total")
      lines.forEach(l => println(l))
    }

    // warm both paths once (JIT, codegen, file listing)
    Retrieval.bm25BatchAgainstIndex(spark, idx, batch, "query_id", "term", 10).collect()
    Retrieval.bm25WandBatchAgainstIndex(spark, idx, batch, "query_id", "term", 10).collect()

    for (i <- 1 to 3) {
      profile(s"plain batch #$i") {
        Retrieval.bm25BatchAgainstIndex(spark, idx, batch, "query_id", "term", 10).collect()
      }
      profile(s"WAND batch #$i") {
        Retrieval.bm25WandBatchAgainstIndex(spark, idx, batch, "query_id", "term", 10).collect()
      }
    }
    spark.stop()
  }
}
