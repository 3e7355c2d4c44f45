package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-split A/B driver for the q_bm25_wand entry: times the index
  * BUILD (write + append) and the WAND PROBE separately, with a
  * SparkListener counting jobs/tasks per probe, so a residual in the
  * fused bench entry can be attributed (job-structure delta vs same-
  * structure timing noise). This is the same-window two-binary
  * technique of SCALE.md "Round 17 — Same-window A/B": compile this
  * file into BOTH trees (it is self-contained) and alternate
  * `sbt "runMain graft.AbProbe"` runs in one quiet window.
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("AB_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Retrieval
    val docs = Tables.documentsBalanced(spark, sfDir)
    docs.write.format("noop").mode("overwrite").save() // warm
    def t[A](f: => A): Long = {
      val s = System.nanoTime(); f; (System.nanoTime() - s) / 1000000
    }
    val builds = new scala.collection.mutable.ArrayBuffer[Long]
    val probes = new scala.collection.mutable.ArrayBuffer[Long]
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(): Unit
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet(): Unit
      }
    })
    val jobCounts = new scala.collection.mutable.ArrayBuffer[String]
    val scratch = scala.collection.mutable.ArrayBuffer[String]()
    java.lang.Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scratch.foreach { p =>
        def rm(f: java.io.File): Unit = {
          val kids = f.listFiles()
          if (kids != null) kids.foreach(rm)
          f.delete(): Unit
        }
        rm(new java.io.File(p))
      }))
    (1 to reps).foreach { i =>
      val idx = java.nio.file.Files.createTempDirectory("ab_widx").toString
      scratch += idx
      builds += t {
        Retrieval.writeTextIndex(
          docs.where(col("doc_id") % 2 === 0), "doc_id", "text", idx,
          nBuckets = 16, blockSize = 64)
        Retrieval.appendToTextIndex(
          docs.where(col("doc_id") % 2 === 1), "doc_id", "text", idx)
      }
      Thread.sleep(200) // drain the build's in-flight listener events
      val j0 = jobs.get(); val t0 = tasks.get()
      probes += t {
        Retrieval.bm25WandAgainstIndex(spark, idx,
          Seq("hash", "join", "spark", "window"), 20)
          .write.format("noop").mode("overwrite").save()
      }
      Thread.sleep(200) // listener drain
      jobCounts += s""""${jobs.get() - j0}j/${tasks.get() - t0}t""""
    }
    println(s"""{"builds":[${builds.mkString(",")}],"probes":[${probes.mkString(",")}],"probe_jobs":[${jobCounts.mkString(",")}]}""")
    spark.stop()
  }
}
