package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALE.md measurement for the ONE-PASS batch WAND probe (sidecar
  * lower bounds, round 16): plain batch probe vs WAND batch probe at R×
  * corpus replication, 8-query serving batch. Replication scheme is
  * [[Round13WandScaleTimer]]'s (contiguous doc-id ranges, padded +
  * rare-term-dropped replicas — the doc-id-local score skew block bounds
  * exploit; replica 0 byte-identical so answers don't change). Both
  * probes asserted row-identical before any timing is reported.
  * `sbt "Test/runMain graft.Round16WandBatchScaleTimer <sfDir> <R>"`.
  */
object Round16WandBatchScaleTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rep = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.Retrieval

    val docs = (0 until rep)
      .map(r => Tables.documents(spark, sfDir).select("doc_id", "text")
        .withColumn("doc_id", col("doc_id") + lit(r.toLong * (1L << 20)))
        .withColumn("text",
          if (r == 0) col("text")
          else concat(regexp_replace(col("text"), "\\bdup\\b", "dupx"),
            lit(" pad" * (16 * r)))))
      .reduce(_ unionAll _)

    val idx = s"${System.getProperty("java.io.tmpdir")}/r16wandb_idx_$rep" +
      "_" + ProcessHandle.current().pid()
    Retrieval.writeTextIndex(docs, "doc_id", "text", idx, blockSize = 128L)

    // 8 queries over the synthetic vocabulary, each mixing the selective
    // term with common ones — the realistic serving batch
    val batch = Seq(
      (0L, "dup"), (0L, "spark"), (0L, "join"),
      (1L, "dup"), (1L, "hash"), (1L, "window"),
      (2L, "dup"), (2L, "shuffle"),
      (3L, "dup"), (3L, "data"), (3L, "model"),
      (4L, "dup"), (4L, "query"),
      (5L, "dup"), (5L, "stream"), (5L, "batch"),
      (6L, "dup"), (6L, "table"),
      (7L, "dup"), (7L, "index"), (7L, "scan")
    ).toDF("query_id", "term")

    val plain = Retrieval.bm25BatchAgainstIndex(spark, idx, batch,
      "query_id", "term", nPerQuery = 20)
    val wand = Retrieval.bm25WandBatchAgainstIndex(spark, idx, batch,
      "query_id", "term", nPerQuery = 20)
    val pRows = plain.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val wRows = wand.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    require(pRows == wRows,
      s"batch WAND != plain batch at R=$rep (first diff: " +
        pRows.zip(wRows).find { case (a, b) => a != b } + ")")

    def time(name: String)(thunk: => Unit): Unit = {
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); thunk; (System.nanoTime() - t0) / 1e9
      }
      println(f"[r16wandb] $name R=$rep min=${runs.min}%.2f s " +
        runs.map(r => f"$r%.2f").mkString("reps=[", ", ", "]"))
    }

    time("plain_batch_probe") {
      Retrieval.bm25BatchAgainstIndex(spark, idx, batch, "query_id", "term", 20)
        .write.format("noop").mode("overwrite").save()
    }
    time("wand_batch_probe") {
      Retrieval.bm25WandBatchAgainstIndex(spark, idx, batch, "query_id", "term", 20)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
