package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALE.md measurement for the batch-WAND CROSSOVER (round 17, r16
  * brief #2): the r16 one-pass batch WAND probe's overhead is flat in
  * corpus size, so its advantage over the plain batch probe must arrive
  * when AGGREGATION dominates — i.e. at serving-realistic query counts,
  * not the 8-query batch r16 measured. This timer holds the corpus at
  * R× replication (the r13 skewed-replica scheme) and sweeps the batch
  * Q ∈ {8, 128, 512} queries drawn deterministically from a 14-term
  * vocabulary (every query 2–4 terms, the selective term in every 4th —
  * a realistic serving mix where common terms repeat across queries).
  *
  * Reported per (R, Q): min-of-5 wall for both probes, the EXACT row
  * count entering the plain probe's per-(query, doc) aggregate
  * (Σ_t df(t)·nq(t), recomputed from the corpus + batch from first
  * principles), and each probe's total shuffle records (SparkListener)
  * — the aggregation-fraction profile the crossover claim rides on.
  * Both probes are asserted row-identical at every (R, Q) before any
  * timing is reported.
  *
  * `sbt "Test/runMain graft.Round17WandCrossoverTimer <sfDir> <R> <Qs>"`
  */
object Round17WandCrossoverTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rep = args.lift(1).map(_.toInt).getOrElse(50)
    val qs = args.lift(2).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(8, 128, 512))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.Retrieval

    val shufRecs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          shufRecs.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten): Unit
        }
    })

    val docs = (0 until rep)
      .map(r => Tables.documents(spark, sfDir).select("doc_id", "text")
        .withColumn("doc_id", col("doc_id") + lit(r.toLong * (1L << 20)))
        .withColumn("text",
          if (r == 0) col("text")
          else concat(regexp_replace(col("text"), "\\bdup\\b", "dupx"),
            lit(" pad" * (16 * r)))))
      .reduce(_ unionAll _)

    val idx = s"${System.getProperty("java.io.tmpdir")}/r17xover_idx_$rep" +
      "_" + ProcessHandle.current().pid()
    Retrieval.writeTextIndex(docs, "doc_id", "text", idx, blockSize = 128L)

    val pool = Vector("dup", "spark", "join", "hash", "window", "shuffle",
      "data", "model", "query", "stream", "batch", "table", "index", "scan")
    /** Query i: 2 + (i%3) terms walked off the pool at stride 3; every
      * 4th query swaps its first term for the selective one.
      */
    def batchOf(nQueries: Int) = (0 until nQueries).flatMap { i =>
      val n = 2 + i % 3
      val ts = (0 until n).map(j => pool((i * 3 + j * 5) % pool.length))
      val withSel = if (i % 4 == 0) ("dup" +: ts.tail).distinct else ts.distinct
      withSel.map(t => (i.toLong, t))
    }.toDF("query_id", "term")

    // df(t) over the indexed corpus, from first principles (public API
    // only): distinct (doc, term) per doc over the same tokenizer rule
    val dfByTerm = docs
      .select(explode(array_distinct(filter(
        split(col("text"), " "), x => x =!= ""))).as("term"))
      .where(col("term").isin(pool: _*))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    for (nQ <- qs) {
      val batch = batchOf(nQ).cache()
      val nqByTerm = batch.groupBy("term").agg(count(lit(1)).as("nq"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val aggRows = nqByTerm.map { case (t, nq) =>
        dfByTerm.getOrElse(t, 0L) * nq }.sum

      val plain = Retrieval.bm25BatchAgainstIndex(spark, idx, batch,
        "query_id", "term", nPerQuery = 20)
      val wand = Retrieval.bm25WandBatchAgainstIndex(spark, idx, batch,
        "query_id", "term", nPerQuery = 20)
      val pRows = plain.collect().map(_.toSeq).toSeq.sortBy(_.toString)
      val wRows = wand.collect().map(_.toSeq).toSeq.sortBy(_.toString)
      require(pRows == wRows,
        s"batch WAND != plain batch at R=$rep Q=$nQ (first diff: " +
          pRows.zip(wRows).find { case (a, b) => a != b } + ")")

      def time(name: String)(thunk: => Unit): Unit = {
        val runs = (1 to 5).map { _ =>
          val s0 = shufRecs.get()
          val t0 = System.nanoTime(); thunk
          val w = (System.nanoTime() - t0) / 1e9
          (w, shufRecs.get() - s0)
        }
        val minW = runs.map(_._1).min
        println(f"[r17xover] $name R=$rep Q=$nQ min=$minW%.2f s " +
          f"agg_in=$aggRows shuf_rec=${runs.map(_._2).min} " +
          runs.map(r => f"${r._1}%.2f").mkString("reps=[", ", ", "]"))
      }
      time("plain_batch_probe") {
        Retrieval.bm25BatchAgainstIndex(spark, idx, batch, "query_id", "term", 20)
          .write.format("noop").mode("overwrite").save()
      }
      time("wand_batch_probe") {
        Retrieval.bm25WandBatchAgainstIndex(spark, idx, batch, "query_id", "term", 20)
          .write.format("noop").mode("overwrite").save()
      }
      batch.unpersist(): Unit
    }
    spark.stop()
  }
}
