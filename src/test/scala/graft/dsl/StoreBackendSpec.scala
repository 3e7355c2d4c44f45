package graft.dsl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.runtime.Stores

/** The first-class store-backend dial ([[graft.runtime.Stores]] — the
  * reference's `core/State/Stores.cs` choice between RocksDbKeyValueStore
  * and InMemoryKeyValueStore): the SAME DSL windowed count runs green and
  * value-identical on both providers, and the dial round-trips through
  * the session conf.
  */
class StoreBackendSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("DSL windowed count: identical results on RocksDB and in-memory state stores") {
    val saved = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    try {
      val results = Seq(Stores.RocksDb, Stores.InMemory).map { backend =>
        Stores.use(spark, backend)
        assert(Stores.backendOf(spark) === backend, "the dial must round-trip")
        val in = MemoryStream[(String, Long)]
        val counted = new KStream(in.toDS().map { case (k, t) =>
          KV(k, 1, new java.sql.Timestamp(t)) })
          .groupByKey.windowedBy(TumblingWindow.of(1000)).count
        val name = s"t_backend_${backend.toString.toLowerCase}"
        val q = counted.changelog.writeStream.format("memory")
          .queryName(name).outputMode("update").start()
        try {
          in.addData(("a", 100L), ("a", 900L), ("b", 600L))
          q.processAllAvailable()
          // a LATER batch updating the same window — the count must come
          // from the STORE (2 -> 3), which is what the backend holds
          in.addData(("a", 950L))
          q.processAllAvailable()
        } finally q.stop()
        spark.table(name).as[Upsert[Windowed[String], Long]].collect()
          .groupBy(u => (u.key.key, u.key.start.getTime))
          .map { case (k, us) => k -> us.maxBy(_.ts.getTime).value }
      }
      assert(results(0) === Map(("a", 0L) -> Some(3L), ("b", 0L) -> Some(1L)))
      assert(results(0) === results(1),
        "both backends must produce identical windowed counts")
    } finally {
      saved match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
