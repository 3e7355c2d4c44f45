package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.{Vectors, VectorQueries}

/** Embedding-similarity search over an `array<float>` column.
  *
  * Scale path: brute force is the exact baseline (scan × broadcast query
  * vectors — never shuffles the corpus); LSH buckets / IVF assignment bound
  * the candidate set so per-query work is corpus_size / buckets.
  */
object Similarity {

  def dot(a: Column, b: Column): Column = VectorQueries.dotCol(a, b)
  def norm(a: Column): Column = VectorQueries.normCol(a)
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine against one query vector (broadcast single row). */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Float], k: Int): DataFrame = {
    val q = lit(null) // placeholder to keep Column API; use literal array:
    val qArr = array(queryVec.map(v => lit(v)): _*)
    corpus.withColumn("cosine", cosine(col(vecCol), qArr))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("cosine"))
  }

  /** Random-hyperplane LSH bucket id per row (deterministic literal
    * hyperplanes — stays inside codegen).
    */
  def lshBucket(vecCol: Column, nBits: Int = 12): Column =
    Vectors.lshBucket(vecCol, nBits)

  /** Bucketed ANN: search only the query's bucket. Recall is traded for a
    * 2^nBits candidate reduction; verify with [[bruteForceTopK]].
    */
  def annTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Float], k: Int, nBits: Int = 12): DataFrame = {
    val dim = queryVec.length
    val qBucket = {
      // same hyperplanes as lshBucket, evaluated driver-side
      (0 until nBits).map { j =>
        val r = Vectors.hyperplane(j, dim)
        val d = queryVec.zip(r).map { case (x, y) => x.toDouble * y }.sum
        if (d > 0) 1 << j else 0
      }.sum
    }
    val qArr = array(queryVec.map(v => lit(v)): _*)
    corpus.withColumn("__bucket", lshBucket(col(vecCol), nBits))
      .filter(col("__bucket") === qBucket)
      .withColumn("cosine", cosine(col(vecCol), qArr))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("cosine"))
  }

  /** Collect (id, vector) centroid pairs driver-side by column name — the
    * input shape [[ivfAssign]] expects. Runs one small Spark job.
    */
  def collectCentroids(df: DataFrame, idCol: String, vecCol: String): Seq[(Int, Array[Float])] =
    df.select(col(idCol), col(vecCol)).collect()
      .map(r => (r.getAs[Long](idCol).toInt, r.getAs[Seq[Float]](vecCol).toArray)).toSeq

  /** IVF-style assignment: nearest of `centroids` per row (broadcast
    * centroids; tie → lowest centroid id). Returns
    * (row cols…, centroid_id, cosine) where `cosine` is the similarity to
    * the assigned centroid.
    */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Float])]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cent = corpus.sparkSession.createDataFrame(
      centroids.map { case (id, v) => (id, v) })
      .toDF("centroid_id", "__cvec")
      .withColumn("__cvec", col("__cvec").cast("array<float>"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("cosine").desc, col("centroid_id"))
    corpus.crossJoin(broadcast(cent))
      .withColumn("cosine", cosine(col(vecCol), col("__cvec")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__cvec", "__rn")
  }
}
