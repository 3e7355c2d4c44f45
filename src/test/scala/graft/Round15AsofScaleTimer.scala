package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALE.md measurement for the streaming as-of enrichment at key scale
  * ([[graft.streaming.AsofEnrichProcessor]]): K keys × B microbatches of
  * dimension updates (one per key per batch) with facts probing the
  * timeline, RocksDB state store, measuring per-batch wall time and the
  * state operator's row count WITH watermark compaction (0 ms delay —
  * every batch's eviction watermark passes the previous batch's entries)
  * vs effectively WITHOUT (1-year delay — the cutoff never reaches the
  * data, so per-key timelines accrete one entry per batch). The r14
  * compaction reorder (enrich THEN compact) holds the full timeline
  * until the END of each handleInputRows call, so this is the
  * measurement that bounds what that order costs at 10⁵ keys.
  * `sbt "Test/runMain graft.Round15AsofScaleTimer <K> <B>"`.
  */
object Round15AsofScaleTimer {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(100000)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.streaming.{AsofEnrich, AsofEvent}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    def run(delay: String, label: String): Unit = {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = MemoryStream[(Long, Long, Option[Long], Option[Long])]
      val events = in.toDS()
        .withColumn("etime", timestamp_millis(col("_2")))
        .withWatermark("etime", delay)
        .as[(Long, Long, Option[Long], Option[Long], java.sql.Timestamp)]
        .map(t => AsofEvent[Long, Long, Long](t._1, t._2, t._3, t._4))
      val out = AsofEnrich.enrich(events)
      val sink = s"asof_scale_${label}_${System.nanoTime()}"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        println(s"\n### $label (watermark delay $delay, K=$k, B=$nBatches)")
        println("| batch | rows in | wall (s) | state rows after | state MB |")
        println("|---|---|---|---|---|")
        for (b <- 0 until nBatches) {
          val base = b.toLong * 1000L
          // one dim update per key per batch + a 10% fact probe
          val dims = (0L until k.toLong).map(key =>
            (key, base + key % 997L, Option.empty[Long], Option(b.toLong)))
          val facts = (0L until k.toLong by 10L).map(key =>
            (key, base + 999L, Option(b.toLong * k + key), Option.empty[Long]))
          val t0 = System.nanoTime()
          in.addData(dims ++ facts)
          q.processAllAvailable()
          val wall = (System.nanoTime() - t0) / 1e9
          val op = Option(q.lastProgress).flatMap(_.stateOperators.headOption)
          val stateRows = op.map(_.numRowsTotal).getOrElse(-1L)
          val stateMb = op.map(_.memoryUsedBytes / 1e6).getOrElse(-1.0)
          println(f"| $b | ${dims.size + facts.size} | $wall%.2f | $stateRows | $stateMb%.1f |")
        }
        val n = spark.table(sink).count()
        val nulls = spark.table(sink).where(col("right").isNull).count()
        println(s"facts enriched: $n (null-enriched: $nulls)")
      } finally q.stop()
    }

    run("0 milliseconds", "compacting")
    run("365 days", "noncompacting")
    spark.stop()
  }
}
