package graft.testkit

import java.sql.Timestamp

import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dsl.{KStream, KTable, KV, Upsert}
import graft.iq.StoreRegistry

/** Packaged test harness, the analog of the reference's
  * `TopologyTestDriver` + `TestInputTopic` / `TestOutputTopic`
  * (`core/Mock/TopologyTestDriver.cs:63-99`, `core/Mock/TestInputTopic.cs:99-167`,
  * `core/Mock/TestOutputTopic.cs:92-150`): drive a typed topology without any
  * broker, pipe records in, read records or query stores out.
  *
  * Mapping: an input topic is a `MemoryStream[KV[K, V]]`; each `pipeInput`
  * runs every started query to completion (the reference's SYNC_TASK mode —
  * one record fully processed before the next); an output topic is a named
  * memory sink read through a cursor; `getKeyValueStore` serves the
  * latest-per-key view via [[graft.iq.StoreRegistry]].
  *
  * Usage (mirrors the reference's `using (var driver = ...)` pattern):
  * {{{
  * val driver = new TopologyTestDriver(spark)
  * val in  = driver.createInputTopic[String, String]()
  * val out = driver.createOutputTopic(in.stream.filter((_, v) => v.length > 3), "out")
  * in.pipeInput("key1", "test1234")
  * val rec = out.readKeyValue()
  * driver.close()
  * }}}
  */
final class TopologyTestDriver(val spark: SparkSession) extends AutoCloseable {

  private var queries: List[StreamingQuery] = Nil
  private var autoTsMs = 0L
  private val registry = new StoreRegistry(spark)

  private[testkit] def nextTs(): Timestamp = { autoTsMs += 1; new Timestamp(autoTsMs) }
  private[testkit] def processAll(): Unit = queries.foreach(_.processAllAvailable())

  /** Track an externally-started query (custom sink shapes in tests) so
    * `pipeInput` drives it and `close()` stops it.
    */
  private[testkit] def register(q: StreamingQuery): Unit = queries ::= q

  /** `CreateInputTopic<K, V>(topic)`: a typed in-memory source. */
  def createInputTopic[K, V]()(implicit e: Encoder[KV[K, V]],
      eu: Encoder[Upsert[K, V]]): TestInputTopic[K, V] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    new TestInputTopic[K, V](MemoryStream[KV[K, V]], this)
  }

  /** `CreateOuputTopic<K, V>(topic)`: starts the topology ending at `stream`
    * into a named memory sink readable via the returned topic. Append mode
    * for record streams; pass `outputMode = "update"` for aggregated
    * topologies — the reference emits every update immediately, and the
    * update-mode sink appends each trigger's changed rows, reproducing that
    * cadence record for record.
    */
  def createOutputTopic[K, V](stream: KStream[K, V], name: String,
      outputMode: String = "append")(
      implicit e: Encoder[KV[K, V]]): TestOutputTopic[K, V] = {
    // complete mode rewrites the sink table each trigger, which would break
    // the topic's append-only read cursor
    require(outputMode == "append" || outputMode == "update",
      s"output topic supports append/update modes, got '$outputMode'")
    val q = stream.ds.writeStream.format("memory")
      .queryName(name).outputMode(outputMode).start()
    queries ::= q
    new TestOutputTopic[K, V](spark, name, this)
  }

  /** Materialize a KTable under `name` for [[getKeyValueStore]] — the
    * `Materialized.As(storeName)` analog. Tries update mode first (plain
    * latest-per-key chains), falling back to append (chains whose stateful
    * ops all run append-mode, e.g. `table.groupBy(...).aggregate`).
    */
  def materializeStore[K, V](table: KTable[K, V], name: String): Unit = {
    val q =
      try registry.materialize(table, name)
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          registry.materialize(table, name, outputMode = "append")
      }
    if (q != null) queries ::= q
  }

  /** `GetKeyValueStore<K, V>(name)` over a store registered with
    * [[materializeStore]].
    */
  def getKeyValueStore[K, V](name: String): KeyValueStoreView[K, V] =
    new KeyValueStoreView[K, V](registry, name)

  /** `GetWindowStore<K, V>(name)` (`core/Mock/TopologyTestDriver.cs:358-376`)
    * over a store materialized from a windowed KTable (`Windowed[K]` keys).
    */
  def getWindowStore[K, V](name: String): WindowStoreView[K, V] =
    new WindowStoreView[K, V](registry, name)

  def close(): Unit = {
    queries.foreach(q => if (q.isActive) q.stop())
    registry.stop()
  }
}

/** `TestInputTopic<K, V>` (`core/Mock/TestInputTopic.cs`). */
final class TestInputTopic[K, V] private[testkit] (
    in: MemoryStream[KV[K, V]], driver: TopologyTestDriver)(
    implicit e: Encoder[KV[K, V]], eu: Encoder[Upsert[K, V]]) {

  /** The topology source, `builder.Stream(topic)`. */
  def stream: KStream[K, V] = new KStream(in.toDS())

  /** `builder.Table(topic)`: each record is an upsert of its key (a null
    * value is a tombstone), feeding the changelog directly. Null-key records
    * are skipped, as the reference's table source does
    * (`KTableSourceProcessor.cs`).
    */
  def table: KTable[K, V] =
    new KTable(in.toDS().filter(kv => kv.key != null)
      .map(kv => Upsert(kv.key, Option(kv.value), kv.ts)))

  /** `PipeInput(key, value)` — auto-advancing timestamp, processed
    * synchronously (SYNC_TASK).
    */
  def pipeInput(key: K, value: V): Unit = pipeInput(key, value, driver.nextTs())

  def pipeInput(key: K, value: V, ts: Timestamp): Unit = {
    in.addData(KV(key, value, ts))
    driver.processAll()
  }

  /** `PipeInputs(records)`: pipe a batch, then process once. */
  def pipeInputs(records: Seq[(K, V)]): Unit = {
    records.foreach { case (k, v) => in.addData(KV(k, v, driver.nextTs())) }
    driver.processAll()
  }
}

/** `TestOutputTopic<K, V>` (`core/Mock/TestOutputTopic.cs`): cursor over the
  * topology's emitted records, in emission order.
  */
final class TestOutputTopic[K, V] private[testkit] (
    spark: SparkSession, name: String, driver: TopologyTestDriver)(
    implicit e: Encoder[KV[K, V]]) {

  private var offset = 0
  private def rows: Seq[KV[K, V]] = spark.table(name).as[KV[K, V]].collect().toSeq

  /** `IsEmpty` — no unread records. */
  def isEmpty: Boolean = rows.lengthCompare(offset) <= 0

  /** `QueueSize` — unread record count. */
  def queueSize: Int = math.max(0, rows.size - offset)

  /** `ReadKeyValue()` — next unread record, None when drained. */
  def readKeyValue(): Option[KV[K, V]] = {
    val r = rows
    if (r.lengthCompare(offset) > 0) { val x = r(offset); offset += 1; Some(x) }
    else None
  }

  /** `ReadKeyValueList()` — drain all unread records. */
  def readKeyValueList(): Seq[KV[K, V]] = {
    val r = rows
    val out = r.drop(offset); offset = r.size; out
  }

  /** `ReadValueList()`. */
  def readValueList(): Seq[V] = readKeyValueList().map(_.value)
}

/** `IReadOnlyKeyValueStore<K, V>` view (`core/State/QueryableStoreTypes.cs`). */
final class KeyValueStoreView[K, V] private[testkit] (
    registry: StoreRegistry, name: String) {

  def get(key: K): Option[V] = registry.get(name, key).map(_.asInstanceOf[V])

  def approximateNumEntries(): Long = registry.approximateNumEntries(name)

  def all(): Map[K, V] = registry.all(name).collect()
    .map(r => r.getAs[K]("key") -> r.getAs[V]("value")).toMap

  private def pairs(df: org.apache.spark.sql.DataFrame): Seq[(K, V)] =
    df.collect().map(r => r.getAs[K]("key") -> r.getAs[V]("value")).toSeq

  /** `Range(from, to)` — ascending key order, both bounds inclusive. */
  def range(from: K, to: K): Seq[(K, V)] = pairs(registry.range(name, from, to))

  /** `ReverseRange(from, to)` (`IReadOnlyKeyValueStore.cs:36`). */
  def reverseRange(from: K, to: K): Seq[(K, V)] =
    pairs(registry.reverseRange(name, from, to))

  /** `ReverseAll()` (`IReadOnlyKeyValueStore.cs:46`). */
  def reverseAll(): Seq[(K, V)] = pairs(registry.reverseAll(name))
}

/** `IReadOnlyWindowStore<K, V>` view (`core/State/IReadOnlyWindowStore.cs`):
  * entries keyed by (key, window start, window end).
  */
final class WindowStoreView[K, V] private[testkit] (
    registry: StoreRegistry, name: String) {

  private def entry(r: org.apache.spark.sql.Row): (K, Timestamp, Timestamp, V) = {
    val wk = r.getStruct(r.fieldIndex("key"))
    (wk.getAs[K]("key"), wk.getAs[Timestamp]("start"), wk.getAs[Timestamp]("end"),
      r.getAs[V]("value"))
  }

  /** `Fetch(key, from, to)`: this key's windows with start in [fromMs, toMs],
    * ordered by window start.
    */
  def fetch(key: K, fromMs: Long, toMs: Long): Seq[(Timestamp, V)] =
    registry.fetch(name, key, fromMs, toMs).collect()
      .map(r => { val (_, s, _, v) = entry(r); (s, v) }).toSeq

  /** `All()`: every (key, window) entry. */
  def all(): Seq[(K, Timestamp, Timestamp, V)] =
    registry.all(name).collect().map(entry).toSeq

  def approximateNumEntries(): Long = registry.approximateNumEntries(name)
}
