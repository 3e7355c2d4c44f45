package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-18 phase attribution for the IVF-PQ entries: `q_ann_ivfpq`
  * measured ~23–31 s of summed executor run-time at local[8]/sf0.1 —
  * far above what its arithmetic suggests. Split the entry into its
  * phases (centroid collect, PQ train, encode, search) and time each
  * with summed executorRunTime, so the burner is attributable before
  * any optimization is attempted (guide §1).
  *
  * Run: sbt "testOnly graft.Round18PqPhaseProbe" (env PQ_SF_DIR to
  * change scale; skipped in normal suite runs unless PQ_PHASE_PROBE=1).
  */
class Round18PqPhaseProbe extends SparkSpec {

  test("phase split of q_ann_ivfpq at sf0.1") {
    assume(sys.env.get("PQ_PHASE_PROBE").contains("1"))
    val d = sys.env.getOrElse("PQ_SF_DIR", "/root/testdata/sf0.1")
    val runMs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) runMs.addAndGet(t.taskMetrics.executorRunTime): Unit
    })
    def phase[A](name: String)(f: => A): A = {
      Thread.sleep(300)
      val r0 = runMs.get(); val w0 = System.nanoTime()
      val out = f
      Thread.sleep(300)
      println(f"[pq-phase] $name%-28s wall ${(System.nanoTime() - w0) / 1e6}%8.0f ms   run ${runMs.get() - r0}%8d ms")
      out
    }
    (1 to 2).foreach { rep =>
      println(s"---- rep $rep ----")
      val emb = Tables.embeddingsBalanced(spark, d)
      val corpus = emb.filter(col("vec_id") > 8)
      val cents = phase("collectCentroids") {
        graft.operators.Similarity.collectCentroids(
          Tables.embeddings(spark, d).filter(col("vec_id") < 8), "vec_id", "embedding")
      }
      val queryVec = phase("queryVec collect") {
        Tables.embeddings(spark, d).filter(col("vec_id") === 8)
          .select("embedding").collect().head.getAs[Seq[Float]](0).toArray
      }
      phase("Pq.train iters=0 (seeds)") {
        graft.operators.Pq.train(corpus, "vec_id", "embedding",
          subspaces = 16, codes = 256, iters = 0)
      }
      phase("Pq.train iters=1") {
        graft.operators.Pq.train(corpus, "vec_id", "embedding",
          subspaces = 16, codes = 256, iters = 1)
      }
      val cb = phase("Pq.train (16x256x3)") {
        graft.operators.Pq.train(corpus, "vec_id", "embedding",
          subspaces = 16, codes = 256, iters = 3)
      }
      val encoded = phase("encode+assign (lazy+noop)") {
        val e = graft.operators.Pq.encode(
          graft.operators.Similarity.ivfAssign(corpus, "vec_id", "embedding", cents),
          "embedding", cb)
        e.write.format("noop").mode("overwrite").save()
        e
      }
      phase("ivfPqSearchTopK") {
        graft.operators.Pq.ivfPqSearchTopK(encoded, corpus, "vec_id", "embedding",
            cents, cb, queryVec, k = 10, rerankK = 256, nprobe = 2)
          .write.format("noop").mode("overwrite").save()
      }
    }
  }
}
