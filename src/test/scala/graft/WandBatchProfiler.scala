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

    val docs = Tables.documentsBalanced(spark, sfDir)
    val idx = java.nio.file.Files.createTempDirectory("wbp").toString + "/idx"
    Retrieval.writeTextIndex(docs, "doc_id", "text", idx, nBuckets = 16,
      blockSize = 64)
    val batch = Seq((1L, "hash"), (1L, "join"), (2L, "spark"),
      (2L, "window"), (2L, "scan")).toDF("query_id", "term")

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
