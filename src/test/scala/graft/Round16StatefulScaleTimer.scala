package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

/** SCALE.md measurement for the changelog stateful DSL ops at key scale
  * (the r15 verdict's top item): K keys × B microbatches through
  * [[graft.streaming.StatefulOps.tableTableJoin]] (outer) and
  * [[graft.streaming.StatefulOps.aggregateChanges]] (add/subtract with
  * subtractor-null-deletes), RocksDB state store.
  *
  * Churn model per batch: every LIVE key upserts (the hard case — each
  * emits), one segment of K/B keys DIES (tombstones on both sides /
  * subtract-to-null) and a fresh segment is BORN — live cardinality stays
  * K while keys-ever-seen grows to 2K over the run. The measurement that
  * matters: state rows must track LIVE keys (flat ≈ K), not keys-ever
  * (growing) — i.e. tombstone eviction works; plus per-batch wall flat.
  *
  * `sbt "Test/runMain graft.Round16StatefulScaleTimer <K> <B> [join|agg|both]"`
  */
object Round16StatefulScaleTimer {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(100000)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(24)
    val scenario = args.lift(2).getOrElse("both")
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
    import graft.dsl.{Change, Upsert}
    import graft.streaming.{KeyedChange, StatefulOps}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val seg = k / nBatches
    def ckpt(tag: String): String =
      java.nio.file.Files.createTempDirectory(s"r16_$tag").toString

    def report(q: org.apache.spark.sql.streaming.StreamingQuery, b: Int,
        nIn: Int, t0: Long, live: Long): Unit = {
      val wall = (System.nanoTime() - t0) / 1e9
      val ops = Option(q.lastProgress).map(_.stateOperators)
        .getOrElse(Array.empty)
      val rows = ops.map(_.numRowsTotal).sum
      val mb = ops.map(_.memoryUsedBytes).sum / 1e6
      println(f"| $b | $nIn | $wall%.2f | $rows | $live | $mb%.1f |")
    }

    def header(label: String): Unit = {
      println(s"\n### $label (K=$k, B=$nBatches, seg=$seg, RocksDB)")
      println("| batch | rows in | wall (s) | state rows | live keys | state MB |")
      println("|---|---|---|---|---|---|")
    }

    // churn bookkeeping shared by both scenarios: [lo, hi) is the live range
    def churn(b: Int, lo: Long, hi: Long): (Long, Long, Seq[Long], Seq[Long]) =
      if (b == 0) (lo, hi, Seq.empty, (lo until hi))
      else (lo + seg, hi + seg, (lo until lo + seg), (hi until hi + seg))

    if (scenario == "join" || scenario == "both") {
      val lin = MemoryStream[(Long, Option[Long], Long)]
      val rin = MemoryStream[(Long, Option[Long], Long)]
      val lt = lin.toDS().map { case (key, v, t) =>
        Upsert(key, v, new Timestamp(t)) }
      val rt = rin.toDS().map { case (key, v, t) =>
        Upsert(key, v, new Timestamp(t)) }
      val joined = StatefulOps.tableTableJoin(lt, rt, "outer")(
        (a: Option[Long], b: Option[Long]) =>
          a.getOrElse(-1L) * 1000000L + b.getOrElse(-1L))
      val q = joined.writeStream.format("noop")
        .option("checkpointLocation", ckpt("ttjoin"))
        .outputMode("append").start()
      try {
        header("table-table OUTER join")
        var lo = 0L; var hi = k.toLong
        for (b <- 0 until nBatches) {
          val t = (b + 1).toLong * 1000L
          val (nlo, nhi, deaths, births) = churn(b, lo, hi)
          lo = nlo; hi = nhi
          val lRows = (lo until hi).map(key => (key, Option(t + key % 7), t)) ++
            deaths.map(key => (key, Option.empty[Long], t))
          val rRows = births.map(key => (key, Option(key), t)) ++
            deaths.map(key => (key, Option.empty[Long], t))
          val t0 = System.nanoTime()
          lin.addData(lRows)
          rin.addData(rRows)
          q.processAllAvailable()
          report(q, b, lRows.size + rRows.size, t0, hi - lo)
        }
      } finally q.stop()
    }

    if (scenario == "agg" || scenario == "both") {
      def v(key: Long): Long = key % 997L + 1L // never 0: lives can't null out
      val ain = MemoryStream[(Long, Option[Long], Option[Long], Long)]
      val changes = ain.toDS().map { case (key, o, n, t) =>
        KeyedChange(key, Change(o, n), new Timestamp(t)) }
      val agg = StatefulOps.aggregateChanges(changes)(
        () => "0",
        (_: Long, x: Long, acc: String) => (acc.toLong + x).toString,
        (_: Long, x: Long, acc: String) => {
          val r = acc.toLong - x
          if (r == 0L) null else r.toString // null at zero = store delete
        })
      val q = agg.writeStream.format("noop")
        .option("checkpointLocation", ckpt("agg"))
        .outputMode("append").start()
      try {
        header("add/subtract aggregate (subtractor-null-deletes)")
        var lo = 0L; var hi = k.toLong
        for (b <- 0 until nBatches) {
          val t = (b + 1).toLong * 1000L
          val (nlo, nhi, deaths, births) = churn(b, lo, hi)
          lo = nlo; hi = nhi
          // every live non-newborn key gets a subtract+add update; births
          // add, deaths subtract to exactly zero (-> null -> eviction)
          val bornSet = births.toSet
          val rows =
            (lo until hi).filterNot(bornSet)
              .map(key => (key, Option(v(key)), Option(v(key)), t)) ++
            births.map(key => (key, Option.empty[Long], Option(v(key)), t)) ++
            deaths.map(key => (key, Option(v(key)), Option.empty[Long], t))
          val t0 = System.nanoTime()
          ain.addData(rows)
          q.processAllAvailable()
          report(q, b, rows.size, t0, hi - lo)
        }
      } finally q.stop()
    }

    spark.stop()
  }
}
