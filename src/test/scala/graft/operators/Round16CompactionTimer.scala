package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** SCALE.md measurement for the in-loop `maxLiveSubtrees` auto-compaction
  * ([[graft.operators.IndexLifecycle.compactOwnSubtrees]], r15 verdict
  * item 5): the text-index ingest loop driven for N batches capped vs
  * uncapped — per-batch ingest wall (the trigger batches carry the fold
  * cost), live-subtree count over time, and probe latency at checkpoints;
  * final probes asserted identical across the two runs.
  * `sbt "Test/runMain graft.operators.Round16CompactionTimer <sfDir> <batches> <cap>"`.
  */
object Round16CompactionTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(24)
    val cap = args.lift(2).map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    

    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val base = docs.filter(col("doc_id") % 2 === 0).localCheckpoint()
    val rest = docs.filter(col("doc_id") % 2 === 1).localCheckpoint()
    val q = Seq("the", "model", "data")

    def subtrees(idx: String): Int = {
      val root = new java.io.File(s"$idx/_ingest")
      if (!root.isDirectory) 0
      else root.listFiles().toSeq.filter(_.isDirectory).map { t =>
        t.listFiles().count(f => f.isDirectory && !f.getName.endsWith(".tmp"))
      }.sum
    }
    def probeMin(idx: String): (Double, Seq[String]) = {
      var rows: Seq[String] = Nil
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        rows = Retrieval.bm25WandAgainstIndex(spark, idx, q, 10)
          .collect().map(_.toString).toSeq
        (System.nanoTime() - t0) / 1e9
      }
      (runs.min, rows)
    }

    def run(tag: String, maxLive: Int): Seq[String] = {
      val idx = s"${System.getProperty("java.io.tmpdir")}/r16cmp_" +
        ProcessHandle.current().pid() + s"_$tag/idx"
      Retrieval.writeTextIndex(base, "doc_id", "text", idx, nBuckets = 8)
      println(s"\n### run: cap=$maxLive")
      println("| batch | ingest wall s | compacted? | live subtrees | probe min-of-5 s |")
      println("|---|---|---|---|---|")
      var finalRows: Seq[String] = Nil
      for (b <- 0 until nBatches) {
        val t0 = System.nanoTime()
        val did = Retrieval.maybeCompactTextIngest(spark, idx, "qtimer",
          b.toLong, maxLive)
        Retrieval.ingestTextBatch(rest.filter(col("doc_id") % nBatches === b),
          "doc_id", "text", idx, "qtimer", b.toLong)
        val wall = (System.nanoTime() - t0) / 1e9
        val probe = if (b == nBatches / 2 - 1 || b == nBatches - 1) {
          val (t, rows) = probeMin(idx)
          finalRows = rows
          f"$t%.2f"
        } else ""
        println(f"| $b | $wall%.2f | ${if (did) "YES" else ""} | ${subtrees(idx)} | $probe |")
      }
      finalRows
    }

    val uncapped = run("off", 0)
    val capped = run("cap", cap)
    require(uncapped == capped,
      s"capped run's probe diverged from uncapped: $capped vs $uncapped")
    println("\nfinal probes identical capped vs uncapped")
    spark.stop()
  }
}
