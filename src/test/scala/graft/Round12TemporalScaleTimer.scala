package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCALE.md measurement for the temporal joins and audio dedup on the
  * 10× replication recipe. As-of: events replicate with NEW event ids
  * but the SAME user ids, so each per-key timeline gets 10× rows — the
  * per-key sort (the operator's only super-linear stage) carries the
  * growth. Range join: the POINTS side replicates (intervals fixed), so
  * the match volume and the bucket equi-join both grow 10×. Audio: the
  * adversarial exact-twin direction, absorbed by imageClusters'
  * pre-collapse. `sbt "Test/runMain graft.Round12TemporalScaleTimer
  * <sfDir> <R>"` — run R=1 then R=10 and compare.
  */
object Round12TemporalScaleTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rep = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Audio, ImageDedup, Temporal}

    def replicate(base: DataFrame, idCol: String): DataFrame =
      (0 until rep).map(r => base.withColumn(idCol, col(idCol) * rep + r))
        .reduce(_ unionAll _)

    def time(name: String)(thunk: => Unit): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        thunk
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[r12scale] $name R=$rep min=${runs.min}%.2f s " +
        runs.map(r => f"$r%.2f").mkString("reps=[", ", ", "]"))
    }

    val events = replicate(Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "ts"), "event_id")
    val p = events.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val v = events.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("vts"))
    time("asof_backward") {
      Temporal.asofJoin(p, v, Seq("user_id"), "ts", "vts", Seq("view_id"))
        .write.format("noop").mode("overwrite").save()
    }
    time("asof_nearest") {
      Temporal.asofJoin(p, v, Seq("user_id"), "ts", "vts", Seq("view_id"),
          direction = "nearest")
        .write.format("noop").mode("overwrite").save()
    }

    val iv = Tables.orders(spark, sfDir)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate").as("ws"),
        expr("o_orderdate + make_dt_interval(CAST(o_orderkey % 3 AS INT) + 1)")
          .as("we"))
    val pts = (0 until rep)
      .map(_ => Tables.lineitem(spark, sfDir)
        .select(col("l_quantity"), col("l_shipdate")))
      .reduce(_ unionAll _)
    // raw pair materialization — output-bound by design (~15M pairs at
    // sf0.1 R=1: ~30k urgent intervals × ~500 covered lineitems each)
    time("range_join_pairs") {
      Temporal.rangeJoin(pts, iv, "l_shipdate", "ws", "we",
          bucketMs = 2L * 86400000L)
        .write.format("noop").mode("overwrite").save()
    }
    // the aggregate-pushdown form the q_range_join entry ships: points
    // collapse to one partial per distinct ship date before the join
    time("range_join_agg") {
      val ptsAgg = pts.groupBy("l_shipdate")
        .agg(count(lit(1)).as("__n"), sum(col("l_quantity")).as("__q"))
      Temporal.rangeJoin(ptsAgg, iv, "l_shipdate", "ws", "we",
          bucketMs = 2L * 86400000L)
        .groupBy("o_orderkey")
        .agg(sum(col("__n")).as("n_pts"), sum(col("__q")).as("qty"))
        .write.format("noop").mode("overwrite").save()
    }

    // sessionization: replicated events keep their user ids, so per-user
    // timelines densify 10× — distinct starts (the sweep's real input)
    // grow with R and the per-key window sort carries it
    time("sessionize") {
      Temporal.mergeIntervals(events.select(col("user_id"), col("ts")),
          Seq("user_id"), "ts", "ts", gapToleranceMs = 1800000L)
        .write.format("noop").mode("overwrite").save()
    }
    // interval merge under pure DUPLICATION: replicating orders repeats
    // the same (priority, start, end) rows — the distinct-(keys, start)
    // pre-collapse must absorb all of it map-side, leaving the window
    // input constant (the near-flat expectation)
    val miv = (0 until rep)
      .map(_ => Tables.orders(spark, sfDir)
        .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(col("o_orderpriority"), col("o_orderdate").as("ws"),
          expr("CAST(o_orderdate AS TIMESTAMP) + make_dt_interval(0, " +
            "CAST(o_orderkey % 3 AS INT) + 1)").as("we")))
      .reduce(_ unionAll _)
    time("merge_intervals") {
      Temporal.mergeIntervals(miv, Seq("o_orderpriority"), "ws", "we")
        .write.format("noop").mode("overwrite").save()
    }
    // interp resample under duplication: the sparse agg absorbs repeated
    // rows map-side and the dense spine is span-bound — scan-dominated
    val ro = (0 until rep)
      .map(_ => Tables.orders(spark, sfDir)
        .select("o_orderpriority", "o_orderdate", "o_totalprice"))
      .reduce(_ unionAll _)
    time("resample_interp") {
      Temporal.resample(ro, Seq("o_orderpriority"), "o_orderdate",
          bucketMs = 86400000L,
          aggs = Seq(count(lit(1)).as("n_orders"),
            sum((col("o_totalprice") * 100).cast("long")).as("rev_c")),
          fill = "interp")
        .write.format("noop").mode("overwrite").save()
    }

    val docs = replicate(Tables.documents(spark, sfDir)
      .select("doc_id", "text"), "doc_id")
    time("audio_dedup_clusters") {
      val hashed = docs.select(col("doc_id"),
        Audio.energyHashTextCol(col("text")).as("ahash"))
      ImageDedup.imageClusters(hashed, "doc_id", "ahash")
        .write.format("noop").mode("overwrite").save()
    }
  }
}
