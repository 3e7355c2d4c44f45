package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the IVF verify-stage cellCap on a (possibly duplicated)
  * corpus: wall time and recall@k, capped vs uncapped, same probe policy
  * as q_ann_ivf_search_batch (centroids = vec_id < 8, queries = 8 and 9,
  * corpus = vec_id > 9).
  * `sbt "Test/runMain graft.IvfCapTimer <sfDir> <cellCap>"`
  */
object IvfCapTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cap = args.lift(1).map(_.toInt).getOrElse(500)
    val nQueries = args.lift(2).map(_.toInt).getOrElse(2)
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
    val qRows = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") >= 8 && col("vec_id") < 8 + nQueries)
      .select(col("vec_id"), col("embedding")).collect()
      .sortBy(_.getLong(0))
    import spark.implicits._
    val qVecs = qRows.map(_.getSeq[Float](1).toArray)
    val queries = qRows.zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1).toArray) }
      .toSeq.toDF("qid", "qvec")
    val corpus = emb.filter(col("vec_id") > 9)
    val assigned = Similarity.ivfAssign(corpus, "vec_id", "embedding", cents)
      .persist()
    assigned.count()
    def run(c: Int): (Double, Double) = {
      val t0 = System.nanoTime()
      val ann = Similarity.ivfJoinTopK(assigned, queries, "vec_id",
        "embedding", "qid", "qvec", cents, k = 10, nprobe = 2, cellCap = c)
      ann.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val recall = Similarity.annRecallAtBatch(corpus, "vec_id", "embedding",
        qVecs.toIndexedSeq, 10,
        Similarity.ivfJoinTopK(assigned, queries, "vec_id", "embedding",
          "qid", "qvec", cents, k = 10, nprobe = 2, cellCap = c))
      (secs, recall)
    }
    run(0) // warm
    val (tUn, rUn) = run(0)
    val (tCap, rCap) = run(cap)
    println(f"[ivfcap] dir=$sfDir cap=$cap nq=$nQueries " +
      f"uncapped=${tUn}%.2f s recall=${rUn}%.3f " +
      f"capped=${tCap}%.2f s recall=${rCap}%.3f")
    spark.stop()
  }
}
