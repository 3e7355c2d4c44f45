package graft

import org.apache.spark.sql.SparkSession

/** Instrumentation for the `q_dedup_incremental2` cold-rep question
  * (VERDICT r11 task 8): how much of the ~6.5 s first-rep overhead is
  * (a) Janino whole-stage-codegen compilation on the driver
  * (`CodegenMetrics.METRIC_COMPILATION_TIME`), (b) JVM JIT
  * (`CompilationMXBean.getTotalCompilationTime` — background threads,
  * so an upper bound on overlap, not additive wall), (c) everything
  * else (first-touch parquet footers, broadcast build, scratch-dir
  * writes). `sbt "Test/runMain graft.ColdRepProbe [query] [sfDir]"`.
  */
object ColdRepProbe {
  def main(args: Array[String]): Unit = {
    val query = args.headOption.getOrElse("q_dedup_incremental2")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cg = org.apache.spark.metrics.source.CodegenMetrics
    val jit = java.lang.management.ManagementFactory.getCompilationMXBean
    def cgStat(): (Long, Double) = {
      val h = cg.METRIC_COMPILATION_TIME
      (h.getCount, h.getSnapshot.getMean)
    }
    def once(tag: String): Unit = {
      val (c0, m0) = cgStat()
      val j0 = jit.getTotalCompilationTime
      val t0 = System.nanoTime()
      SparkEntry.queries(query)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e6
      val (c1, m1) = cgStat()
      val j1 = jit.getTotalCompilationTime
      // histogram sum approximated as mean * count (uniform reservoir)
      val cgMs = m1 * c1 - m0 * c0
      println(f"[coldrep] $tag wall=${wall}%.0f ms janino_compiles=${c1 - c0} " +
        f"janino_ms~=${cgMs}%.0f jit_ms=${j1 - j0}")
    }
    once("rep1")
    once("rep2")
    once("rep3")
  }
}
