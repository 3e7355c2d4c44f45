package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}
import org.apache.spark.sql.types.StructType

/** Query lifecycle + guarantees (SURVEY §2.7, §3.2).
  *
  * Reference mapping:
  *  - `ProcessingGuarantee.AT_LEAST_ONCE` (default; `core/StreamConfig.cs:219`)
  *    → stock microbatch semantics.
  *  - `EXACTLY_ONCE` (Kafka transactions, `StreamTask.cs:92-110`) →
  *    checkpointed state is exactly-once by construction; end-to-end EOS to
  *    the sink needs an idempotent or transactional sink (the Kafka sink is
  *    at-least-once; dedupe on read or use an idempotent downstream).
  *  - `StateDir` → `checkpointLocation`.
  *  - `CommitIntervalMs` (30 s default, `StreamConfig.cs:166-169`) →
  *    `Trigger.ProcessingTime`.
  */
object Guarantees {
  sealed trait Guarantee
  case object AtLeastOnce extends Guarantee
  case object ExactlyOnceState extends Guarantee

  /** Persistent store selection (the reference's RocksDB default,
    * `core/State/Stores.cs`): see [[graft.streaming.ProcessorApi.useRocksDb]]
    * — required for `transformWithState`, recommended for large state
    * (changelog checkpointing uploads per-commit deltas, not snapshots).
    */

  def configure[T](w: org.apache.spark.sql.streaming.DataStreamWriter[T],
      checkpointDir: String, commitIntervalMs: Long = 30000L,
      guarantee: Guarantee = AtLeastOnce): org.apache.spark.sql.streaming.DataStreamWriter[T] =
    w.option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(commitIntervalMs))
}

/** State-store BACKEND selection for every stateful op in the library —
  * the DSL's windowed/table aggregations and joins ([[graft.streaming
  * .StatefulOps]]), the Processor API, and the streaming as-of enrich all
  * read the session's provider when their query STARTS.
  *
  * Reference mapping (`core/State/Stores.cs`): the reference defaults
  * stateful processors to persistent RocksDB stores
  * (`RocksDbKeyValueStore.cs`) with in-memory stores
  * (`InMemoryKeyValueStore.cs`) as the opt-in — here the same dial is
  * Spark's state-store provider class:
  *  - [[Stores.RocksDb]] → `RocksDBStateStoreProvider` (rocksdbjni ships
  *    with Spark): state spills to local disk per shuffle partition, so a
  *    key-heavy op is bounded by executor DISK, not heap — the backend the
  *    key-scale measurements ran on (SCALE.md "Changelog stateful ops at
  *    key scale": 100k live keys × 24 batches, flat per-batch wall, state
  *    rows == live keys) and the one `transformWithState` requires.
  *    Changelog checkpointing (on by default here) uploads per-commit
  *    deltas instead of full snapshots.
  *  - [[Stores.InMemory]] → `HDFSBackedStateStoreProvider` (Spark's
  *    default): state lives on-heap with snapshot checkpoints — fine for
  *    small state, GC-bound at key scale.
  *
  * Set BEFORE `start()`; a running query keeps the provider it started
  * with, and a checkpoint PINS its provider — restarting an existing
  * checkpoint under the other backend fails (Spark state formats are not
  * cross-compatible). Pick the backend per app, like the reference's
  * store supplier choice.
  */
object Stores {
  sealed trait Backend { private[graft] def providerClass: String }

  /** `InMemoryKeyValueStore.cs` analog: on-heap state, snapshot ckpts. */
  case object InMemory extends Backend {
    private[graft] val providerClass =
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
  }

  /** `RocksDbKeyValueStore.cs` analog (the reference's default persistent
    * store): disk-backed per-partition state, delta checkpoints.
    */
  case object RocksDb extends Backend {
    private[graft] val providerClass =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  }

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** Select the session's store backend for queries started AFTER this
    * call. `changelogCheckpointing` applies to RocksDB only (delta-upload
    * commits; ignored by the in-memory provider).
    */
  def use(spark: SparkSession, backend: Backend,
      changelogCheckpointing: Boolean = true): Unit = {
    spark.conf.set(ProviderKey, backend.providerClass)
    if (backend == RocksDb)
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        changelogCheckpointing.toString)
  }

  /** The backend queries started NOW would run on (session conf; Spark's
    * own default when never set).
    */
  def backendOf(spark: SparkSession): Backend =
    if (spark.conf.get(ProviderKey, InMemory.providerClass)
        == RocksDb.providerClass) RocksDb
    else InMemory
}

/** Error handling (SURVEY §2.7): the reference's
  * `DeserializationExceptionHandler` / `ProductionExceptionHandler` with
  * CONTINUE-or-FAIL policies (`core/StreamConfig.cs:2140-2150`).
  */
object ErrorHandling {

  sealed trait Policy
  case object Continue extends Policy
  case object Fail extends Policy

  /** CONTINUE-mode deserialization: PERMISSIVE `from_json` keeps the raw
    * record in `_corrupt` instead of failing the query; FAIL mode uses
    * FAILFAST (query error on first bad record) — exactly the reference's two
    * policies.
    */
  def deserializeJson(df: DataFrame, rawCol: String, schema: StructType,
      policy: Policy = Continue): DataFrame = policy match {
    case Continue =>
      val withCorrupt = schema.add("_corrupt", "string")
      df.withColumn("parsed", from_json(col(rawCol).cast("string"), withCorrupt,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")))
    case Fail =>
      df.withColumn("parsed", from_json(col(rawCol).cast("string"), schema,
        Map("mode" -> "FAILFAST")))
  }

  /** Dead-letter split: (good, bad) after permissive parse. */
  def deadLetter(parsed: DataFrame): (DataFrame, DataFrame) =
    (parsed.filter(col("parsed._corrupt").isNull),
      parsed.filter(col("parsed._corrupt").isNotNull))

  /** Query-level failure observer (the `InnerExceptionHandler` analog). */
  def onQueryError(spark: SparkSession)(handler: String => Unit): StreamingQueryListener = {
    val l = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        e.exception.foreach(handler)
    }
    spark.streams.addListener(l)
    l
  }
}

/** One microbatch's metrics for one streaming query. */
final case class QueryMetric(
    queryName: String, queryId: String, batchId: Long,
    numInputRows: Long, inputRowsPerSecond: Double,
    processedRowsPerSecond: Double, batchDurationMs: Long,
    stateRows: Long, stateMemoryBytes: Long)

/** Per-query runtime metrics — on the reference's 1.3.0 roadmap
  * (`README.md:34-37`, sensors/metrics), implemented here as a superset over
  * Spark's `StreamingQueryListener`: every microbatch's progress (throughput,
  * latency, state size) is captured into a bounded in-memory ring and
  * queryable as a `Dataset`, so metrics join the same analytical surface as
  * the data (e.g. alert when `processedRowsPerSecond` drops).
  */
object Metrics {

  final class Recorder private[Metrics] (maxRetained: Int)
      extends StreamingQueryListener {
    private val buf = new scala.collection.mutable.ArrayDeque[QueryMetric]()

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val m = QueryMetric(
        queryName = Option(p.name).getOrElse(""),
        queryId = p.id.toString,
        batchId = p.batchId,
        numInputRows = p.numInputRows,
        inputRowsPerSecond = zeroIfNaN(p.inputRowsPerSecond),
        processedRowsPerSecond = zeroIfNaN(p.processedRowsPerSecond),
        batchDurationMs = Option(p.durationMs)
          .flatMap(d => Option(d.get("triggerExecution"))).map(_.longValue).getOrElse(0L),
        stateRows = p.stateOperators.map(_.numRowsTotal).sum,
        stateMemoryBytes = p.stateOperators.map(_.memoryUsedBytes).sum)
      buf.synchronized {
        buf.append(m)
        while (buf.size > maxRetained) buf.removeHead()
      }
    }

    private def zeroIfNaN(d: Double): Double = if (d.isNaN) 0.0 else d

    /** Current metrics as a queryable Dataset. */
    def snapshot(spark: SparkSession): org.apache.spark.sql.Dataset[QueryMetric] = {
      implicit val enc: org.apache.spark.sql.Encoder[QueryMetric] =
        org.apache.spark.sql.Encoders.product[QueryMetric]
      spark.createDataset(buf.synchronized(buf.toSeq))
    }
  }

  /** Attach a recorder to the session; detach with `remove`. */
  def attach(spark: SparkSession, maxRetained: Int = 10000): Recorder = {
    val r = new Recorder(maxRetained)
    spark.streams.addListener(r)
    r
  }

  def remove(spark: SparkSession, r: Recorder): Unit =
    spark.streams.removeListener(r)
}
