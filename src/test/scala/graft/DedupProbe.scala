package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the dedupNear exact-collapse path: cold-times the
  * collapsed and uncollapsed forms on one dataset.
  * `sbt "Test/runMain graft.DedupProbe <sfDir>"`
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    locally { // same warmup as Bench/QueryTimer
      import org.apache.spark.sql.functions._
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name").agg(count(lit(1)).as("c"), sum("n_nationkey").as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    val docs = graft.Tables.documentsBalanced(spark, sfDir)
    time("dedupNear uncollapsed FIRST")(
      graft.operators.Dedup.dedupNear(docs, "doc_id", "text",
        minAgreeFraction = 0.5, collapseExact = false)
        .write.format("noop").mode("overwrite").save())
    graft.operators.Dedup.releaseBarriers()
    time("dedupNear collapsed")(
      graft.operators.Dedup.dedupNear(docs, "doc_id", "text",
        minAgreeFraction = 0.5).write.format("noop").mode("overwrite").save())
    graft.operators.Dedup.releaseBarriers()
    time("dedupNear uncollapsed")(
      graft.operators.Dedup.dedupNear(docs, "doc_id", "text",
        minAgreeFraction = 0.5, collapseExact = false)
        .write.format("noop").mode("overwrite").save())
    graft.operators.Dedup.releaseBarriers()
    time("dedupNearBy collapsed")(
      graft.operators.Dedup.dedupNearBy(docs, "doc_id", "text",
        keepBy = org.apache.spark.sql.functions.col("n_chars"),
        minAgreeFraction = 0.5).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
