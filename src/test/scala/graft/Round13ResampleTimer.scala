package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure-first probe for the resample double-sparse-aggregate question
  * (VERDICT r12 #8): `resample` references its sparse aggregate twice
  * (span derivation + the dense left join), so without materialization
  * the per-(key, bucket) aggregation computes twice. Variant A: resample
  * straight over the raw events (the shipped plan). Variant B: the
  * caller pre-aggregates the sparse frame, localCheckpoints it, and
  * resamples THAT (re-aggregation over singleton groups is an identity
  * for max) — an upper bound on what an internal checkpoint could save.
  * Key cardinality is multiplied `K`× (new key ids, same timelines).
  * `sbt "Test/runMain graft.Round13ResampleTimer <sfDir> <K>"`.
  */
object Round13ResampleTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Temporal

    val base = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_millis(col("ts")).as("tsm"),
        floor(col("value") * 100).cast("long").as("v"))
    val df = (0 until mult)
      .map(r => base.withColumn("user_id", col("user_id") * mult + r))
      .reduce(_ unionAll _)

    def time(name: String)(thunk: => Unit): Unit = {
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); thunk; (System.nanoTime() - t0) / 1e9
      }
      println(f"[r13rs] $name K=$mult min=${runs.min}%.2f s " +
        runs.map(r => f"$r%.2f").mkString("reps=[", ", ", "]"))
    }

    val bucket = 3600000L // 1h
    time("resample_raw") {
      Temporal.resample(df, Seq("user_id"), "tsm", bucket,
          Seq(max(col("v")).as("v")), fill = "interp")
        .write.format("noop").mode("overwrite").save()
    }
    time("resample_materialize") {
      Temporal.resample(df, Seq("user_id"), "tsm", bucket,
          Seq(max(col("v")).as("v")), fill = "interp",
          materializeSparse = true)
        .write.format("noop").mode("overwrite").save()
    }
  }
}
