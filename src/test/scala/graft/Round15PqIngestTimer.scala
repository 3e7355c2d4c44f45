package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALE.md measurement for the PQ streaming-ingest loop
  * ([[graft.operators.Pq.ingestPqBatch]] / [[Pq.readIndex]] /
  * [[Pq.compactIndex]]): probe latency as `_ingest` subtrees accrete —
  * each microbatch adds one subtree with ≥1 file per touched cell, and
  * every probe unions all of them — then the compaction payoff.
  * `sbt "Test/runMain graft.Round15PqIngestTimer <sfDir> <batches>"`.
  */
object Round15PqIngestTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(40)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Pq, Similarity}

    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val corpus = emb.filter(col("vec_id") >= 32).localCheckpoint()
    val cents = Similarity.collectCentroids(
      emb.filter(col("vec_id") < 8), "vec_id", "embedding")
    val cb = Pq.train(corpus, "vec_id", "embedding", subspaces = 16,
      codes = 256, iters = 3)
    val query = emb.filter(col("vec_id") === 8).select("embedding")
      .collect().head.getSeq[Float](0).toArray

    val dir = s"${System.getProperty("java.io.tmpdir")}/r15pqing_" +
      ProcessHandle.current().pid() + "/idx"
    Pq.writeIndex(Pq.encode(
        Similarity.ivfAssign(corpus.filter(col("vec_id") % 2 === 0),
          "vec_id", "embedding", cents), "embedding", cb),
      "vec_id", cents, cb, dir)
    val rest = corpus.filter(col("vec_id") % 2 === 1)
      .select("vec_id", "embedding").localCheckpoint()

    def files(root: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isFile && f.getName.endsWith(".parquet")) 1
        else if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
        else 0
      walk(new java.io.File(root))
    }
    def probeMin(path: String): (Double, Seq[Long]) = {
      var ids: Seq[Long] = Nil
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        ids = Pq.ivfPqSearchTopK(Pq.readIndex(spark, path), corpus,
            "vec_id", "embedding", Similarity.ivfReadCentroids(spark, path),
            Pq.readCodebooks(spark, path), query,
            k = 10, rerankK = 64, nprobe = 2)
          .collect().map(_.getLong(0)).toSeq
        (System.nanoTime() - t0) / 1e9
      }
      (runs.min, ids)
    }

    println(s"| ingested batches | parquet files | probe min-of-5 (s) |")
    println(s"|---|---|---|")
    val (t0, ids0) = probeMin(dir)
    println(f"| 0 | ${files(dir)} | $t0%.2f |")
    var reference = ids0
    for (b <- 0 until nBatches) {
      Pq.ingestPqBatch(rest.filter(col("vec_id") % nBatches === b),
        "vec_id", "embedding", dir, "qtimer", b.toLong)
      if (b == nBatches / 4 - 1 || b == nBatches / 2 - 1 || b == nBatches - 1) {
        val (t, ids) = probeMin(dir)
        println(f"| ${b + 1} | ${files(dir)} | $t%.2f |")
        reference = ids
      }
    }
    val tgt = dir + "_compacted"
    val tc0 = System.nanoTime()
    Pq.compactIndex(spark, dir, tgt)
    val compactWall = (System.nanoTime() - tc0) / 1e9
    val (tc, idsC) = probeMin(tgt)
    println(f"| compacted (${compactWall}%.1f s rewrite) | ${files(tgt)} | $tc%.2f |")
    require(idsC == reference, s"compacted probe diverged: $idsC vs $reference")
    println("probe results identical pre/post compaction")
    spark.stop()
  }
}
