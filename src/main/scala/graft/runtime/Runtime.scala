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
