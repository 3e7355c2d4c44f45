package graft

import org.apache.spark.sql.SparkSession

/** Dev micro-bench: time individual SparkEntry queries without paying for
  * the whole Bench suite. Usage:
  * `sbt "Test/runMain graft.QueryTimer <sfDir> <reps> <name> [name…]"`
  * Prints per-rep wall seconds plus the min — same noop-sink
  * materialization and warmup as [[Bench]], so numbers are comparable.
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    locally { // same warmup as Bench
      import org.apache.spark.sql.functions._
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name").agg(count(lit(1)).as("c"), sum("n_nationkey").as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[timer] $name min=${times.min}%.3f s " +
        times.map(t => f"$t%.3f").mkString("reps=[", ", ", "]"))
    }
    spark.stop()
  }
}
