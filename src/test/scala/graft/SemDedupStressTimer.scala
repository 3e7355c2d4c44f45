package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures SemDeDup on an R×-duplicated corpus (every vector an R-twin
  * clique with distinct ids — the adversarial crawl-mirror shape): the
  * default collapseExact path vs the naive per-row quadratic, flags
  * asserted identical when both run.
  * `sbt "Test/runMain graft.SemDedupStressTimer <sfDir> <R> [naive]"`
  */
object SemDedupStressTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rep = args.lift(1).map(_.toInt).getOrElse(100)
    val runNaive = args.contains("naive")
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
    val base = emb.filter(col("vec_id") >= 8)
    val corpus = (0 until rep).map { r =>
      base.select((col("vec_id") * rep + r).as("vec_id"), col("embedding"))
    }.reduce(_ union _).repartition(32).persist()
    val n = corpus.count()
    println(s"corpus rows: $n (${rep}x)")
    def time(label: String, collapse: Boolean): Long = {
      val t0 = System.nanoTime()
      val removed = Similarity.semDedupFlag(corpus, "vec_id", "embedding",
          cents, tau = 0.35, collapseExact = collapse)
        .filter(col("is_semdup")).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$label%-12s removed=$removed%8d  $secs%8.1f s")
      removed
    }
    val a = time("collapsed", collapse = true)
    val b = time("collapsed2", collapse = true) // warm re-run
    assert(a == b)
    if (runNaive) {
      val c = time("naive", collapse = false)
      assert(a == c, s"collapsed $a vs naive $c flags diverge")
    }
    // survivor-policy form (components + arg-max) on the same corpus
    val t0 = System.nanoTime()
    val kept = Similarity.semDedupBy(corpus, "vec_id", "embedding", cents,
        tau = 0.35, keepBy = col("vec_id"))
      .count()
    println(f"semDedupBy   kept=$kept%8d  ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    corpus.unpersist()
    spark.stop()
  }
}
