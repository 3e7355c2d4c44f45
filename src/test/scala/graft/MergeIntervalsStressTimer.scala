package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object MergeIntervalsStressTimer {
  def main(args: Array[String]): Unit = {
    val rep = args.headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Temporal
    val miv = (0 until rep)
      .map(_ => Tables.orders(spark, "/root/testdata/sf0.1")
        .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(col("o_orderpriority"), col("o_orderdate").as("ws"),
          expr("CAST(o_orderdate AS TIMESTAMP) + make_dt_interval(0, " +
            "CAST(o_orderkey % 3 AS INT) + 1)").as("we")))
      .reduce(_ unionAll _)
    val runs = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      Temporal.mergeIntervals(miv, Seq("o_orderpriority"), "ws", "we")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[mergestress] R=$rep min=${runs.min}%.2f " +
      runs.map(r => f"$r%.2f").mkString("reps=[", ", ", "]"))
  }
}
