package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scale probe for the in-plan deep multi-probe regime: a query batch FAR
  * beyond the old literal-map design's 65,536-query driver-collect cap.
  * Usage: Test/runMain graft.DeepProbeScaleTimer <embeddingsDir> <replicas>
  *   [broadcast|shuffle]
  */
object DeepProbeScaleTimer {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val replicas = args(1).toInt
    val useBroadcast = args.length < 3 || args(2) == "broadcast"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("deep-probe-scale").getOrCreate()

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val corpus = emb
    val queries = emb.crossJoin(
        spark.range(replicas.toLong).select(col("id").as("__r")))
      .select((col("vec_id") * replicas + col("__r")).as("qid"),
        col("embedding").as("qvec"))
    val nQ = queries.count()
    println(s"[deep-scale] corpus=${corpus.count()} queries=$nQ " +
      s"mode=${if (useBroadcast) "broadcast" else "shuffle"}")

    (1 to 3).foreach { rep =>
      val t0 = System.nanoTime()
      val out = Similarity.annJoinTopKMultiProbe(corpus, queries,
        "vec_id", "embedding", "qid", "qvec",
        k = 5, nBits = 8, probes = 16, // 16 > nBits+1 = 9: deep regime
        broadcastQueries = useBroadcast)
      val n = out.count()
      println(f"[deep-scale] rep$rep rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
