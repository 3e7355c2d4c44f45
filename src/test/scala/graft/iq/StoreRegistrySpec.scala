package graft.iq

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.dsl.{KStream, KV}

/** Interactive queries: materialized stores are queryable like the
  * reference's `KafkaStream.Store` views (SURVEY §3.3).
  */
class StoreRegistrySpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("streaming store: get/range/all reflect latest state per key") {
    val registry = new StoreRegistry(spark)
    val in = MemoryStream[(String, Long)]
    val table = new KStream(in.toDS().map { case (k, v) =>
      KV(k, v, new java.sql.Timestamp(v)) }).toTable
    val q = registry.materialize(table, "word_store")

    in.addData(("a", 1L), ("b", 2L)); q.processAllAvailable()
    in.addData(("a", 10L)); q.processAllAvailable()

    val all = registry.all("word_store").collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Long]("value")).toMap
    assert(all === Map("a" -> 10L, "b" -> 2L))
    assert(registry.get("word_store", "a") === Some(10L))
    assert(registry.range("word_store", "a", "a").count() === 1)
    assert(registry.approximateNumEntries("word_store") === 2L)
    registry.stop()
  }

  test("streaming store stays O(keys): many triggers never grow the store") {
    val registry = new StoreRegistry(spark)
    val in = MemoryStream[(String, Long)]
    val table = new KStream(in.toDS().map { case (k, v) =>
      KV(k, v, new java.sql.Timestamp(v)) }).toTable
    val q = registry.materialize(table, "compact_store")

    // 20 triggers x 2 keys: an append-log store would hold 40 rows
    (1 to 20).foreach { i =>
      in.addData(("a", i.toLong), ("b", i * 100L)); q.processAllAvailable()
    }
    assert(registry.storeSize("compact_store") === Some(2))
    val all = registry.all("compact_store").collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Long]("value")).toMap
    assert(all === Map("a" -> 20L, "b" -> 2000L))
    registry.stop()
  }

  test("error handling: permissive parse splits good and corrupt records") {
    import graft.runtime.ErrorHandling
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType)))
    val df = Seq("{\"k\": 1}", "not-json").toDF("raw")
    val parsed = ErrorHandling.deserializeJson(df, "raw", schema)
    val (good, bad) = ErrorHandling.deadLetter(parsed)
    assert(good.count() === 1 && bad.count() === 1)

    // FAIL policy: first corrupt record aborts the query (reference's FAIL)
    val failing = ErrorHandling.deserializeJson(df, "raw", schema, ErrorHandling.Fail)
    intercept[org.apache.spark.SparkException] { failing.collect() }
  }

  test("transform/transformValues: per-partition init, per-record apply") {
    val s = new graft.dsl.KStream(Seq(
      graft.dsl.KV("a", "x", new java.sql.Timestamp(1))).toDS())
    val out = s.transformValues(() => { (k: String, v: String) => s"$k:$v" })
      .ds.collect().head
    assert(out.value === "a:x" && out.ts.getTime === 1L)
    val t = s.transform(it => it.map(r => r.copy(value = r.value.toUpperCase)))
    assert(t.ds.collect().head.value === "X")
  }
}
