package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump the EXECUTED plans of the BM25 index-build actions — the plans
  * `PlanDump` can't see (the lifecycle entries' `.explain` shows only
  * the returned probe frame; the build writes are separate actions).
  * A QueryExecutionListener captures every action's QueryExecution
  * while `writeTextIndex` + `appendToTextIndex` run, so the committed
  * plans/r19 before/after files show the real build plan shape (the
  * r19 claim: the `groupBy(doc_id, dl, term)` count Exchange is gone,
  * postings are a map-side `token_tf` projection).
  * `sbt "Test/runMain graft.BuildPlanDump <sfDir>"`
  */
object BuildPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plans = new java.util.concurrent.CopyOnWriteArrayList[(String, String)]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        plans.add((funcName,
          qe.explainString(ExplainMode.fromString("formatted")))): Unit
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    })
    import org.apache.spark.sql.functions.col
    val docs = Tables.documentsBalanced(spark, sfDir)
    val idx = java.nio.file.Files.createTempDirectory("bmplan_idx").toString + "/idx"
    graft.operators.Retrieval.writeTextIndex(
      docs.where(col("doc_id") % 2 === 0), "doc_id", "text", idx, nBuckets = 16)
    graft.operators.Retrieval.appendToTextIndex(
      docs.where(col("doc_id") % 2 === 1), "doc_id", "text", idx)
    spark.sparkContext.listenerBus.waitUntilEmpty()
    Thread.sleep(500) // listenerManager delivery is async
    plans.forEach { case (f, p) =>
      println(s"==== build action: $f ====")
      println(p)
    }
    spark.stop()
  }
}
