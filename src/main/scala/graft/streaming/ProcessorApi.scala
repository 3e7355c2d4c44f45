package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

import graft.dsl.KV

/** Processor API v2: the reference's low-level `IProcessor` surface
  * (`core/Processors/IProcessor.cs:8-29` — `Init(context)` / `Process(key,
  * value)` / `Close()` against named `IStateStore`s,
  * `core/Processors/IStateStore.cs:8`) re-expressed on Spark 4's
  * `transformWithState`.
  *
  * The mapping is direct:
  *  - `Init(ProcessorContext)`  → `StatefulProcessor.init` + `getHandle
  *    .getValueState/getListState/getMapState` (named per-key stores).
  *  - `Process(key, value)`     → `handleInputRows` (per-key record batches).
  *  - `Close()`                 → `close()`.
  *  - Kafka Streams punctuators (`context.schedule`, a declared-roadmap gap in
  *    the reference) → `registerTimer` + `handleExpiredTimer` — event-time or
  *    processing-time, so this engine is a superset here.
  *  - window retention / store TTL → `TTLConfig`.
  *
  * Scale note: state lives in the per-partition RocksDB instances (streaming
  * requires [[ProcessorApi.useRocksDb]]); each key's state is local to the
  * task that owns the key's shuffle partition, exactly the reference's
  * task-per-partition store layout — so it scales horizontally with
  * partitions, and state size is bounded per executor, not per cluster.
  */
object ProcessorApi {

  /** Spark's RocksDB state store provider (rocksdbjni ships with Spark; this
    * is the analog of the reference's default persistent RocksDB stores,
    * `core/State/Stores.cs`).
    */
  val RocksDbProvider: String = graft.runtime.Stores.RocksDb.providerClass

  /** Switch the session's streaming state to RocksDB. `transformWithState`
    * REQUIRES this in streaming mode; the fMGWS-based ops in [[StatefulOps]]
    * also run on it (faster recovery via changelog checkpointing: only the
    * delta is uploaded per commit, not a full store snapshot). Sugar for
    * [[graft.runtime.Stores.use]] — the first-class backend dial with the
    * reference mapping (`core/State/Stores.cs`).
    */
  def useRocksDb(spark: SparkSession, changelogCheckpointing: Boolean = true): Unit =
    graft.runtime.Stores.use(spark, graft.runtime.Stores.RocksDb,
      changelogCheckpointing)

  /** Revert to the default HDFS-backed in-memory provider. */
  def useDefaultStateStore(spark: SparkSession): Unit =
    graft.runtime.Stores.use(spark, graft.runtime.Stores.InMemory)

  /** Run a custom processor over a keyed stream. Event-time timers need a
    * watermark on the input (`KStream.withWatermarkMs`). Works in batch too
    * (single pass, empty initial state) — the same processor serves the
    * batch façade and the streaming topology.
    */
  def process[K, V, O](stream: Dataset[KV[K, V]],
      processor: StatefulProcessor[K, KV[K, V], O],
      timeMode: TimeMode = TimeMode.EventTime(),
      outputMode: OutputMode = OutputMode.Append())(
      implicit ek: Encoder[K], eo: Encoder[O]): Dataset[O] =
    stream.groupByKey(_.key).transformWithState(processor, timeMode, outputMode)
}

/** Canonical `process()` example, the reference docs' stateful
  * processor shape: a per-key running count emitted on every update
  * (`KStreamAggregateProcessor` is the built-in equivalent,
  * `core/Processors/KStreamAggregateProcessor.cs`).
  */
final class RunningCountProcessor[K, V](implicit eLong: Encoder[Long])
    extends StatefulProcessor[K, KV[K, V], KV[K, Long]] {
  @transient private var count: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState[Long]("count", eLong, TTLConfig.NONE)

  override def handleInputRows(key: K, rows: Iterator[KV[K, V]],
      tv: TimerValues): Iterator[KV[K, Long]] = {
    var c = if (count.exists()) count.get() else 0L
    var maxTs = 0L
    rows.foreach { r => c += 1; maxTs = math.max(maxTs, r.ts.getTime) }
    count.update(c)
    Iterator.single(KV(key, c, new Timestamp(maxTs)))
  }
}

/** Idle-session summary via event-time timers — the punctuator pattern: each
  * record (re)arms a timer at `lastEventTs + gapMs`; when the watermark passes
  * it with no new records, the summary fires once and state clears. This is
  * the session-gap shape Kafka Streams expresses with `Punctuator` +
  * session stores; the reference has no punctuators (declared roadmap), so
  * this is superset surface with the same store/topology layout.
  */
final case class SessionSummary[K](key: K, count: Long, lastTs: Timestamp)

final class IdleSessionSummaryProcessor[K, V](gapMs: Long)(
    implicit eState: Encoder[(Long, Long, Long)])
    extends StatefulProcessor[K, KV[K, V], SessionSummary[K]] {
  // (count, maxEventTs, armedTimerAt)
  @transient private var session: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    session = getHandle.getValueState[(Long, Long, Long)]("session", eState, TTLConfig.NONE)

  override def handleInputRows(key: K, rows: Iterator[KV[K, V]],
      tv: TimerValues): Iterator[SessionSummary[K]] = {
    var (count, maxTs, armedAt) = if (session.exists()) session.get() else (0L, 0L, -1L)
    rows.foreach { r => count += 1; maxTs = math.max(maxTs, r.ts.getTime) }
    if (armedAt >= 0) getHandle.deleteTimer(armedAt)
    val next = maxTs + gapMs
    getHandle.registerTimer(next)
    session.update((count, maxTs, next))
    Iterator.empty
  }

  override def handleExpiredTimer(key: K, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[SessionSummary[K]] = {
    val out =
      if (session.exists()) {
        val (c, m, _) = session.get()
        Iterator.single(SessionSummary(key, c, new Timestamp(m)))
      } else Iterator.empty
    session.clear()
    out
  }
}
