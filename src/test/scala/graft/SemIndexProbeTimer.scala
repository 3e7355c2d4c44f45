package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALE.md measurement: semantic-index probe cost vs index size. Builds a
  * writeSemIndex artifact from the sf embeddings replicated R× (ids offset),
  * probes it with a fixed small batch, and times the probe leg alone —
  * the claim under test: probe cost scales with the PROBED CELLS' volume,
  * never with a corpus rescan/shuffle, and compaction keeps the file count
  * flat after appends.
  * `sbt "Test/runMain graft.SemIndexProbeTimer <sfDir> <R> <appends>"`
  */
object SemIndexProbeTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rep = args.lift(1).map(_.toInt).getOrElse(100)
    val nAppends = args.lift(2).map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity
    val emb = Tables.embeddingsBalanced(spark, sfDir)
    val cents = Similarity.collectCentroids(
      Tables.embeddings(spark, sfDir).filter(col("vec_id") < 8),
      "vec_id", "embedding")
    val base = emb.filter(col("vec_id") >= 8 && col("vec_id") % 7 =!= 0)
      .select("vec_id", "embedding")
    val corpus = (0 until rep).map { r =>
      base.select((col("vec_id") * rep + r).as("vec_id"), col("embedding"))
    }.reduce(_ union _)
    val idx = SparkSpec.tempDir("semidx_probe") + "/idx"
    val t0 = System.nanoTime()
    Similarity.writeSemIndex(corpus, "vec_id", "embedding", cents, idx)
    println(f"[semprobe] index build (${rep}x): ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val batch = emb.filter(col("vec_id") >= 8 && col("vec_id") % 7 === 0)
      .select((col("vec_id") * rep).as("vec_id"), col("embedding"))
      .persist()
    println(s"[semprobe] batch rows: ${batch.count()}")
    def probeOnce(path: String, label: String): Unit = {
      val secs = (1 to 3).map { _ =>
        val s0 = System.nanoTime()
        val n = Similarity.semDedupAgainstIndex(batch, "vec_id", "embedding",
          path, tau = 0.35).count()
        val s = (System.nanoTime() - s0) / 1e9
        println(f"[semprobe] $label probe: matches=$n wall=$s%.2f s")
        s
      }
      println(f"[semprobe] $label min=${secs.min}%.2f s")
    }
    probeOnce(idx, s"${rep}x")
    if (nAppends > 0) {
      val t1 = System.nanoTime()
      (0 until nAppends).foreach { k =>
        Similarity.appendToSemIndex(
          base.limit(50).select((col("vec_id") + 900000L + k * 1000000L).as("vec_id"),
            col("embedding")),
          "vec_id", "embedding", idx)
      }
      println(f"[semprobe] $nAppends appends: ${(System.nanoTime() - t1) / 1e9}%.1f s")
      def fileCount(p: String): Int = {
        def walk(f: java.io.File): Int =
          if (f.isDirectory) f.listFiles().map(walk).sum
          else if (f.getName.endsWith(".parquet")) 1 else 0
        walk(new java.io.File(p))
      }
      println(s"[semprobe] files after appends: ${fileCount(idx)}")
      probeOnce(idx, "post-append")
      val compacted = SparkSpec.tempDir("semidx_probe_c") + "/idx"
      val t2 = System.nanoTime()
      Similarity.compactSemIndex(spark, idx, compacted)
      println(f"[semprobe] compaction: ${(System.nanoTime() - t2) / 1e9}%.1f s, files: ${fileCount(compacted)}")
      probeOnce(compacted, "compacted")
    }
    batch.unpersist()
    spark.stop()
  }
}
