package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch cost dissection for the batch-WAND scaling gap
  * (Round16WandBatchScaleTimer: wand batch 1.37→3.27 s for R=1→50 while
  * plain grew 0.84→1.41 s): times structural pieces of the probe built
  * from public API + raw index reads, so the growing component can be
  * named before any fix. `sbt "Test/runMain graft.Round16WandBatchDissect <sfDir> <R>"`.
  */
object Round16WandBatchDissect {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rep = args.lift(1).map(_.toInt).getOrElse(50)
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
    val idx = java.nio.file.Files.createTempDirectory(s"wbd$rep").toString + "/idx"
    Retrieval.writeTextIndex(docs, "doc_id", "text", idx, blockSize = 128L)

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
    val terms = batch.select("term").distinct().as[String].collect().toSeq

    def time(name: String)(thunk: => Unit): Unit = {
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); thunk; (System.nanoTime() - t0) / 1e9
      }
      println(f"[dissect] R=$rep $name%-28s min=${runs.min}%.2f reps=" +
        runs.map(r => f"$r%.2f").mkString("[", ",", "]"))
    }

    val posts = spark.read.parquet(idx)
      .where(col("term").isNotNull && col("term").isin(terms: _*))
    val side = spark.read.parquet(s"$idx/_block_stats")
      .where(col("term").isin(terms: _*))
    println(s"[dissect] R=$rep postings_rows=${posts.count()} " +
      s"sidecar_rows=${side.count()}")

    // warm
    Retrieval.bm25BatchAgainstIndex(spark, idx, batch, "query_id", "term", 20).collect()
    Retrieval.bm25WandBatchAgainstIndex(spark, idx, batch, "query_id", "term", 20).collect()

    time("plain_batch_probe") {
      Retrieval.bm25BatchAgainstIndex(spark, idx, batch, "query_id", "term", 20)
        .write.format("noop").mode("overwrite").save()
    }
    time("wand_batch_probe") {
      Retrieval.bm25WandBatchAgainstIndex(spark, idx, batch, "query_id", "term", 20)
        .write.format("noop").mode("overwrite").save()
    }
    // postings-pass proxy: filter + join q + per-(query, doc) aggregate
    time("scan_join_agg_proxy") {
      posts.join(broadcast(batch), "term")
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("tf")).as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    // same + a block-keyed join against an ALL-pairs surviving set (the
    // no-pruning worst case of the wand scan's extra join)
    val allPairs = batch.select("query_id").distinct()
      .crossJoin(posts.select((col("doc_id") - pmod(col("doc_id"), lit(128L)))
        .as("block")).distinct())
    time("scan_all_surviving_join") {
      posts.join(broadcast(batch), "term")
        .withColumn("block", col("doc_id") - pmod(col("doc_id"), lit(128L)))
        .join(allPairs, Seq("query_id", "block"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("tf")).as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    // sidecar plane proxy: groupBy (term, block) + per-term window
    time("sidecar_plane_proxy") {
      side.groupBy(col("term"), col("block"))
        .agg(max(col("max_tf")).as("m"), sum(col("n_docs")).as("nd"),
          sum(sum(col("n_docs"))).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("term")))
            .as("td"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
