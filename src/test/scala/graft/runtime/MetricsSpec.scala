package graft.runtime

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.dsl._

/** Metrics recorder (reference 1.3.0 roadmap superset): per-microbatch
  * throughput / latency / state-size captured from the listener bus and
  * queryable as a Dataset.
  */
class MetricsSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("recorder captures per-batch rows and stateful-op state size") {
    val rec = Metrics.attach(spark)
    try {
      val in = MemoryStream[(String, Long)]
      val counts = new KStream(in.toDS().map { case (k, t) =>
        KV(k, 1, new java.sql.Timestamp(t)) }).groupByKey.count
      val q = counts.changelog.writeStream.format("memory")
        .queryName("m_counts").outputMode("update").start()
      try {
        in.addData(("a", 1L), ("b", 2L)); q.processAllAvailable()
        in.addData(("a", 3L)); q.processAllAvailable()
        // listener bus is async — wait for the progress events to land
        var tries = 0
        def rows() = rec.snapshot(spark).filter(_.numInputRows > 0).collect()
        while (rows().length < 2 && tries < 50) { Thread.sleep(100); tries += 1 }

        val ms = rows()
        assert(ms.map(_.numInputRows).sum === 3L)
        assert(ms.forall(_.queryName == "m_counts"))
        // the count op holds per-key state: 2 keys after the second batch
        assert(ms.maxBy(_.batchId).stateRows === 2L)
        // metrics are a Dataset: aggregate them like any other data
        val byQuery = rec.snapshot(spark).groupBy("queryName").sum("numInputRows")
        assert(byQuery.collect().head.getLong(1) >= 3L)
      } finally q.stop()
    } finally Metrics.remove(spark, rec)
  }
}
