package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALE.md measurement for the IVFADC residual-encoding claim: recall@10
  * of the IVF-PQ probe, raw vs residual codebooks, over a
  * (config × rerankK × nprobe) grid on the sf embeddings —
  * [[graft.operators.Pq.ivfPqRecallAt]] against the brute-force exact
  * top-10. Both encodings share the SAME coarse centroids and the same
  * probe-cell selection, so any recall difference at equal (nprobe,
  * rerankK) is pure ADC-shortlist quality — exactly what the residual
  * encoding is supposed to buy (Jégou TPAMI'11 §IV).
  * `sbt "Test/runMain graft.Round15PqRecallTimer <sfDir>"`.
  */
object Round15PqRecallTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val n = corpus.count()
    val cents = Similarity.collectCentroids(
      emb.filter(col("vec_id") < 8), "vec_id", "embedding")
    val queries = emb.filter(col("vec_id") >= 8 && col("vec_id") < 24)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray).toSeq
    println(s"corpus=$n vectors, ${cents.size} cells, ${queries.size} queries")

    runGrid("near-random corpus (as stored)", corpus, queries, cents)

    // CLUSTERED variant: pull every vector toward its coarse centroid
    // (x' = c + α·(x − c), α = 0.25) — the regime IVFADC exists for
    // (Jégou TPAMI'11 §IV: residuals small relative to the vectors).
    // Same derivation applied to the queries, same centroids throughout.
    val alpha = 0.25
    val centMap = map(cents.flatMap { case (cid, c) =>
      Seq(lit(cid), array(c.toIndexedSeq.map(lit(_)): _*))
    }: _*)
    val clustered = graft.operators.Similarity
      .ivfAssign(corpus, "vec_id", "embedding", cents)
      .withColumn("embedding",
        zip_with(element_at(centMap, col("centroid_id")), col("embedding"),
          (c, x) => c + lit(alpha) * (x - c)).cast("array<float>"))
      .select("vec_id", "embedding").localCheckpoint()
    def pull(v: Array[Float]): Array[Float] = {
      val cell = graft.operators.Similarity.probeCellsFor(cents, v, 1).head
      val c = cents.find(_._1 == cell).get._2
      v.indices.map(i => c(i) + alpha.toFloat * (v(i) - c(i))).toArray
    }
    runGrid("clustered corpus (x' = c + 0.25(x−c))", clustered,
      queries.map(pull), cents)
    spark.stop()
  }

  private def runGrid(label: String,
      corpus: org.apache.spark.sql.DataFrame,
      queries: Seq[Array[Float]],
      cents: Seq[(Int, Array[Float])]): Unit = {
    import graft.operators.{Pq, Similarity}
    println(s"\n## $label")
    for ((m, k) <- Seq((8, 16), (16, 256))) {
      val raw = Pq.train(corpus, "vec_id", "embedding", m, k, iters = 3)
      val res = Pq.trainResidual(corpus, "vec_id", "embedding", cents,
        m, k, iters = 3)
      val assigned = Similarity.ivfAssign(corpus, "vec_id", "embedding", cents)
      val encRaw = Pq.encode(assigned, "embedding", raw).localCheckpoint()
      val encRes = Pq.encodeResidual(assigned, "embedding", res, cents)
        .localCheckpoint()
      println(s"\n### ${m}x$k codebooks")
      println("| nprobe | rerankK | raw recall@10 | residual recall@10 |")
      println("|---|---|---|---|")
      for (nprobe <- Seq(2, cents.size); rerankK <- Seq(16, 32, 64, 128)) {
        // the BATCH evaluator (PqSpec-locked ≡ the per-query loop): the
        // original loop ran 2 jobs per query — this grid cell is now a
        // fixed handful of jobs regardless of |queries|
        val r0 = Pq.ivfPqRecallAtBatch(encRaw, corpus, "vec_id", "embedding",
          cents, raw, queries, k = 10, rerankK = rerankK, nprobe = nprobe)
        val r1 = Pq.ivfPqRecallAtBatch(encRes, corpus, "vec_id", "embedding",
          cents, res, queries, k = 10, rerankK = rerankK, nprobe = nprobe)
        println(f"| $nprobe | $rerankK | $r0%.3f | $r1%.3f |")
      }
    }
  }
}
