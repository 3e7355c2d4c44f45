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
