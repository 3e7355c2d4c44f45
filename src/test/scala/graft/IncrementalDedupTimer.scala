package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALE.md measurement: incremental-dedup probe cost as the INDEXED CORPUS
  * grows 100× while the ingest batch stays fixed — the claim under test is
  * that per-batch cost scales with the batch, not the corpus. Usage:
  * `sbt "Test/runMain graft.IncrementalDedupTimer <1xDir> <100xDir> <reps>"`.
  */
object IncrementalDedupTimer {
  def main(args: Array[String]): Unit = {
    val dir1 = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dir100 = args.lift(1).getOrElse("/tmp/sf0.1_x100")
    val reps = args.lift(2).map(_.toInt).getOrElse(5)
    val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // fixed ingest batch: 100 docs from the 1x corpus (re-keyed so they are
    // "new" ids but duplicate indexed content — every probe hits)
    val batch = graft.Tables.documentsBalanced(spark, dir1)
      .filter(col("doc_id") % 50 === 0)
      .withColumn("doc_id", col("doc_id") + 7000000000L)
      .cache()
    println(s"[incdedup] batch docs: ${batch.count()}")

    for ((label, dir) <- Seq("1x" -> dir1, "100x" -> dir100)) {
      val corpus = graft.Tables.documentsBalanced(spark, dir)
      val idx = SparkSpec.tempDir(s"incidx_$label") // removed at JVM exit
      val t0 = System.nanoTime()
      graft.operators.Dedup.writeSignatureIndex(corpus, "doc_id", "text", idx)
      println(f"[incdedup] $label index build: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      val times = (1 to reps).map { _ =>
        val t = System.nanoTime()
        val n = graft.operators.Dedup
          .dedupAgainstIndex(batch, "doc_id", "text", idx).count()
        ((System.nanoTime() - t) / 1e9, n)
      }
      println(f"[incdedup] $label probe min=${times.map(_._1).min}%.2f s " +
        s"reps=${times.map(t => f"${t._1}%.2f").mkString("[", ", ", "]")} " +
        s"matches=${times.head._2}")
    }
    spark.stop()
  }
}
