package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object InterpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Temporal
    val ro = Tables.orders(spark, sfDir)
      .select("o_orderpriority", "o_orderdate", "o_totalprice")
    def time(name: String)(thunk: => Unit): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); thunk; (System.nanoTime() - t0) / 1e9
      }
      println(f"[interp] $name min=${runs.min}%.2f reps=" +
        runs.map(r => f"$r%.2f").mkString("[", ", ", "]"))
    }
    for (f <- Seq("none", "ffill", "interp")) time(f) {
      Temporal.resample(ro, Seq("o_orderpriority"), "o_orderdate", 86400000L,
          Seq(count(lit(1)).as("n_orders"),
            sum((col("o_totalprice") * 100).cast("long")).as("rev_c")),
          fill = f)
        .write.format("noop").mode("overwrite").save()
    }
  }
}
