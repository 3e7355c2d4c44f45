package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-19 phase attribution for the BM25 retrieval entries (the
  * [[Round18PqPhaseProbe]] method): VERDICT r18 ranked the BM25-family
  * index-build tax the biggest untouched cost (~17 s across 6 entries at
  * sf0.1) and `q_bm25_wand_batch`/`q_rrf_hybrid_batch` CPU unattributed.
  * Split each entry into its phases — index build (writeTextIndex),
  * append, and the probe(s) — timing summed executorRunTime per phase so
  * the burner is attributable before any optimization (guide §1).
  *
  * Run: BM_PHASE_PROBE=1 sbt "testOnly graft.Round19BmPhaseProbe"
  * (env BM_SF_DIR to change scale; skipped in normal suite runs).
  */
class Round19BmPhaseProbe extends SparkSpec {

  test("phase split of the BM25 index lifecycle at sf0.1") {
    assume(sys.env.get("BM_PHASE_PROBE").contains("1"))
    val d = sys.env.getOrElse("BM_SF_DIR", "/root/testdata/sf0.1")
    val runMs = new java.util.concurrent.atomic.AtomicLong(0)
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) runMs.addAndGet(t.taskMetrics.executorRunTime): Unit
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(): Unit
      }
    })
    def phase[A](name: String)(f: => A): A = {
      Thread.sleep(300)
      val r0 = runMs.get(); val j0 = jobs.get(); val w0 = System.nanoTime()
      val out = f
      Thread.sleep(300)
      println(f"[bm-phase] $name%-34s wall ${(System.nanoTime() - w0) / 1e6}%8.0f ms   run ${runMs.get() - r0}%8d ms   jobs ${jobs.get() - j0}%3d")
      out
    }
    import graft.operators.Retrieval
    (1 to 2).foreach { rep =>
      println(s"---- rep $rep ----")
      val docs = Tables.documentsBalanced(spark, d)
      // q_bm25_indexed shape: split build + append + plain probe
      val idx1 = tempDir("bmphase_idx") + "/idx"
      phase("writeTextIndex (half corpus)") {
        Retrieval.writeTextIndex(
          docs.where(col("doc_id") % 2 === 0), "doc_id", "text", idx1,
          nBuckets = 16)
      }
      phase("appendToTextIndex (other half)") {
        Retrieval.appendToTextIndex(
          docs.where(col("doc_id") % 2 === 1), "doc_id", "text", idx1)
      }
      phase("bm25AgainstIndex probe") {
        Retrieval.bm25AgainstIndex(spark, idx1,
            Seq("hash", "join", "spark", "window"), 20)
          .write.format("noop").mode("overwrite").save()
      }
      // q_bm25_wand_batch shape: full-corpus build (blockSize 64) + batch WAND
      val idx2 = tempDir("bmphase_idxwb") + "/idx"
      phase("writeTextIndex (full, bs=64)") {
        Retrieval.writeTextIndex(docs, "doc_id", "text", idx2,
          nBuckets = 16, blockSize = 64)
      }
      import spark.implicits._
      val batch = Seq((1L, "hash"), (1L, "join"), (2L, "spark"),
        (2L, "window"), (2L, "scan")).toDF("query_id", "term")
      phase("bm25WandBatchAgainstIndex probe") {
        Retrieval.bm25WandBatchAgainstIndex(spark, idx2, batch,
            "query_id", "term", 10)
          .write.format("noop").mode("overwrite").save()
      }
      phase("bm25BatchAgainstIndex probe") {
        Retrieval.bm25BatchAgainstIndex(spark, idx2, batch,
            "query_id", "term", 10)
          .write.format("noop").mode("overwrite").save()
      }
      phase("bm25WandAgainstIndex probe") {
        Retrieval.bm25WandAgainstIndex(spark, idx2,
            Seq("hash", "join", "spark", "window"), 20)
          .write.format("noop").mode("overwrite").save()
      }
    }
  }
}
