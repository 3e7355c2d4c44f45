package graft.dsl

import java.sql.Timestamp

/** Core record model (SURVEY §1).
  *
  * The reference processes (key, value, timestamp[, metadata]) tuples one at
  * a time (`core/Processors/StreamTask.cs:297-325`); our engine's typed row
  * is the `KV` case class over a Spark `Dataset`, so Catalyst sees the full
  * structure and can optimize — a strict superset of the reference's opaque
  * K/V bytes (`core/SerDes/ISerDes.cs`).
  */
final case class KV[K, V](key: K, value: V, ts: Timestamp)

/** Table changelog row: `value = None` is a tombstone (delete), mirroring the
  * reference's null-value convention
  * (`docs/_sources/statefull-processors.md.txt:32`).
  */
final case class Upsert[K, V](key: K, value: Option[V], ts: Timestamp)

/** Old/new value pair passed between KTable operators, the reference's
  * `Change<T>` (`core/Table/Internal/Change.cs:7-19`). Drives the
  * adder/subtractor aggregation of `KGroupedTable`
  * (`core/Processors/KTableAggregateProcessor.cs:24-74`).
  */
final case class Change[V](oldValue: Option[V], newValue: Option[V])

/** Windowed result key, the reference's `Windowed<K>`
  * (`core/State/Windowed.cs:18-38`): window bounds are [start, end).
  */
final case class Windowed[K](key: K, start: Timestamp, end: Timestamp)

object KV {
  def now[K, V](key: K, value: V): KV[K, V] =
    KV(key, value, new Timestamp(System.currentTimeMillis()))
}

/** What to do when a timestamp extractor returns a null or negative
  * timestamp — the reference ships one extractor subclass per policy
  * (`core/Processors/Internal/ExtractRecordMetadataTimestamp.cs:6-18`,
  * `FailOnInvalidTimestamp`, `LogAndSkipOnInvalidTimestamp`); here the
  * policy is a parameter of `KStream.withTimestamp`.
  */
sealed trait InvalidTimestampPolicy
object InvalidTimestampPolicy {
  /** Abort the task (the reference's default, `FailOnInvalidTimestamp`). */
  case object Fail extends InvalidTimestampPolicy
  /** Log and drop the record (`LogAndSkipOnInvalidTimestamp`). */
  case object LogAndSkip extends InvalidTimestampPolicy
  /** Keep the record's current source/metadata timestamp
    * (`ExtractRecordMetadataTimestamp`'s fallback).
    */
  case object UseRecordMetadata extends InvalidTimestampPolicy
}

/** Per-record source metadata, the reference's `IRecordContext`
  * (`core/Processors/IRecordContext.cs:9-36`). Field mapping:
  * `Topic`→topic, `Partition`→partition, `Offset`→offset,
  * `Headers`→headers (name → raw bytes; Kafka allows duplicate header
  * names — last one wins here, which is also the reference's read-most
  * pattern), `Timestamp` lives on the enclosing [[KVMeta]] row.
  */
final case class RecordMeta(topic: String, partition: Int, offset: Long,
    headers: Map[String, Array[Byte]]) {
  def header(name: String): Option[Array[Byte]] = headers.get(name)
  def headerString(name: String): Option[String] =
    header(name).map(new String(_, java.nio.charset.StandardCharsets.UTF_8))
}

/** Metadata-carrying record: the typed DSL's answer to header/offset-aware
  * users — `KV` plus the source [[RecordMeta]]. `toKV` drops into the plain
  * DSL; `changeTimestamp` mirrors `IRecordContext.ChangeTimestamp`.
  */
final case class KVMeta[K, V](key: K, value: V, ts: Timestamp, meta: RecordMeta) {
  def toKV: KV[K, V] = KV(key, value, ts)
  def changeTimestamp(newTs: Timestamp): KVMeta[K, V] = copy(ts = newTs)
}
