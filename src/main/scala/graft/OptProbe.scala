package graft
import org.apache.spark.sql.SparkSession

/** Round-18 optimization probe: run named SparkEntry queries under a
  * SparkListener and report, per rep — wall ms, job count, task count,
  * summed executor RUN time (CPU-queue-robust next to wall), summed
  * shuffle write records/bytes, and whether the final adaptive plan
  * reused exchanges. Wall clock on this host carries 1.5–2.5× hourly
  * drift (SCALE.md), so structural optimization claims are made on the
  * listener counters + executed-plan shape, with wall as corroboration.
  *
  *   SPARK_GRAFT_SF_DIR=... OPT_REPS=3 OPT_CPUS=8 \
  *     sbt "runMain graft.OptProbe q_curation_pipeline3 ..."
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("OPT_REPS", "3").toInt
    val cpus = sys.env.getOrElse("OPT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0)
    val runMs = new java.util.concurrent.atomic.AtomicLong(0)
    val swRec = new java.util.concurrent.atomic.AtomicLong(0)
    val swBytes = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(): Unit
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          runMs.addAndGet(m.executorRunTime)
          swRec.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          swBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten): Unit
        }
      }
    })
    // warm codegen/JIT like Bench does
    locally {
      import org.apache.spark.sql.functions._
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name").agg(count(lit(1)).as("c"), sum("n_nationkey").as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val out = (1 to reps).map { _ =>
        Thread.sleep(300) // drain in-flight listener events
        val j0 = jobs.get(); val t0 = tasks.get(); val r0 = runMs.get()
        val sr0 = swRec.get(); val sb0 = swBytes.get()
        val w0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - w0) / 1000000
        Thread.sleep(300)
        // NOTE: no exchange-reuse count here — `df.queryExecution` is not
        // the execution the noop write ran, so its plan never finalizes;
        // use OPT_DUMP (collect + executedPlan) for reuse evidence
        s"""{"wall":$wall,"jobs":${jobs.get() - j0},"tasks":${tasks.get() - t0},""" +
          s""""run_ms":${runMs.get() - r0},"sw_rec":${swRec.get() - sr0},""" +
          s""""sw_bytes":${swBytes.get() - sb0}}"""
      }
      println(s""""$name": [${out.mkString(", ")}]""")
      if (sys.env.contains("OPT_DUMP")) {
        // collect() (not a separate write) so THIS QueryExecution is the
        // one that ran — its executedPlan is the FINAL adaptive plan with
        // materialized query stages and reuse visible
        val df = fn(spark, sfDir)
        df.collect()
        println(s"==== $name final adaptive plan ====")
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
