package graft.dsl

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.functions.{count => fcount, _}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.StatefulOps

/** Grouped stream pre-aggregation (`IKGroupedStream`,
  * `core/Stream/IKGroupedStream.cs:18`). All aggregations are incremental
  * per-key state (SURVEY §2.4): one running value per key, re-emitted on
  * every update (update mode in streaming; final state in batch).
  *
  * Null-key records are dropped, matching the stateful-op rule
  * (`KStreamReduceProcessor.cs:20-24`).
  */
final class KGroupedStream[K, V](val ds: Dataset[KV[K, V]]) extends Serializable {

  private def nonNullKey: Dataset[KV[K, V]] = ds.filter(r => r.key != null)

  /** `Count` (`IKGroupedStream.cs:27`) — Catalyst hash-agg with map-side
    * partial aggregation (no custom state needed).
    */
  def count(implicit eu: Encoder[Upsert[K, Long]],
      et: Encoder[(K, Long, Timestamp)]): KTable[K, Long] = {
    val df = nonNullKey.toDF("key", "value", "ts")
      .groupBy(col("key"))
      .agg(fcount(lit(1)).as("cnt"), max(col("ts")).as("mts"))
      .select(col("key"), col("cnt"), col("mts"))
    new KTable(df.as[(K, Long, Timestamp)]
      .map { case (k, c, ts) => Upsert(k, Some(c), ts) })
  }

  /** `Aggregate` (`IKGroupedStream.cs:82`): init + fold, VR free. Result
    * timestamp = max input ts (`KStreamAggregateProcessor.cs:37-42`). Fold
    * order = event time within each batch.
    */
  def aggregate[VR](init: () => VR)(agg: (K, V, VR) => VR)(
      implicit eu: Encoder[Upsert[K, VR]], ek: Encoder[K],
      evr: Encoder[Option[VR]]): KTable[K, VR] =
    new KTable(nonNullKey.groupByKey(_.key)
      .flatMapGroupsWithState[Option[VR], Upsert[K, VR]](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[KV[K, V]], state: GroupState[Option[VR]]) =>
          var acc = state.getOption.flatten
          var maxTs = 0L
          it.toSeq.sortBy(_.ts.getTime).foreach { r =>
            acc = Some(agg(key, r.value, acc.getOrElse(init())))
            maxTs = math.max(maxTs, r.ts.getTime)
          }
          state.update(acc)
          Iterator.single(Upsert(key, acc, new Timestamp(maxTs)))
      })

  /** `Reduce` (`IKGroupedStream.cs:251`): first value seeds. */
  def reduce(f: (V, V) => V)(
      implicit eu: Encoder[Upsert[K, V]], ek: Encoder[K],
      ev: Encoder[Option[V]]): KTable[K, V] =
    new KTable(nonNullKey.groupByKey(_.key)
      .flatMapGroupsWithState[Option[V], Upsert[K, V]](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[KV[K, V]], state: GroupState[Option[V]]) =>
          var acc = state.getOption.flatten
          var maxTs = 0L
          it.toSeq.sortBy(_.ts.getTime).foreach { r =>
            acc = Some(acc.fold(r.value)(a => f(a, r.value)))
            maxTs = math.max(maxTs, r.ts.getTime)
          }
          state.update(acc)
          Iterator.single(Upsert(key, acc, new Timestamp(maxTs)))
      })

  /** `WindowedBy` (`IKGroupedStream`): tumbling/hopping/session. */
  def windowedBy(w: TumblingWindow): TimeWindowedKStream[K, V] =
    new TimeWindowedKStream(ds, w.sizeExpr, w.sizeExpr, w)

  def windowedBy(w: HoppingWindow): TimeWindowedKStream[K, V] =
    new TimeWindowedKStream(ds, w.sizeExpr, w.advanceExpr, w)

  def windowedBy(w: SessionWindow): SessionWindowedKStream[K, V] =
    new SessionWindowedKStream(ds, w)
}

/** Windowed grouped stream (`ITimeWindowedKStream`,
  * `core/Stream/ITimeWindowedKStream.cs:28`). Aggregations run as Catalyst
  * `window()` group-bys — partial aggregation + single shuffle on
  * (key, window); grace becomes `withWatermark` in streaming
  * (`KStreamWindowAggregateProcessor.cs:52-58`).
  */
final class TimeWindowedKStream[K, V](ds: Dataset[KV[K, V]],
    sizeExpr: String, advanceExpr: String, w: WindowDef) extends Serializable {

  private def withWatermarkIfStreaming =
    if (ds.isStreaming && w.grace.toMillis > 0)
      ds.withWatermark("ts", w.graceExpr)
    else ds

  /** Windowed `Count` (`ITimeWindowedKStream.cs:52`). */
  def count(implicit eu: Encoder[Upsert[Windowed[K], Long]],
      et: Encoder[(K, Timestamp, Timestamp, Long, Timestamp)]): KTable[Windowed[K], Long] = {
    val df = withWatermarkIfStreaming.toDF("key", "value", "ts")
      .filter(col("key").isNotNull)
      .groupBy(window(col("ts"), sizeExpr, advanceExpr), col("key"))
      .agg(fcount(lit(1)).as("cnt"), max(col("ts")).as("mts"))
    new KTable(df.select(
        col("key"), col("window.start").as("start"), col("window.end").as("end"),
        col("cnt"), col("mts"))
      .as[(K, Timestamp, Timestamp, Long, Timestamp)]
      .map { case (k, s, e, c, mts) => Upsert(Windowed(k, s, e), Some(c), mts) })
  }

  /** Windowed `Aggregate` (`ITimeWindowedKStream.cs:107`): arbitrary fold per
    * (key, window). Records are exploded to their covering windows
    * (`TimeWindowOptions.WindowsFor`, `TimeWindowOptions.cs:59-72`), then
    * folded in event-time order via per-(key, window) state.
    */
  def aggregate[VR](init: () => VR)(agg: (K, V, VR) => VR)(
      implicit ew: Encoder[KV[Windowed[K], V]], eu: Encoder[Upsert[Windowed[K], VR]],
      ek: Encoder[Windowed[K]], evr: Encoder[Option[VR]]): KTable[Windowed[K], VR] = {
    val sizeMs = parseMs(sizeExpr)
    val advanceMs = parseMs(advanceExpr)
    val windowedRecords = withWatermarkIfStreaming.flatMap { r =>
      windowsFor(r.ts.getTime, sizeMs, advanceMs).map { case (s, e) =>
        KV(Windowed(r.key, new Timestamp(s), new Timestamp(e)), r.value, r.ts)
      }
    }
    new KGroupedStream(windowedRecords).aggregate(init)((wk, v, acc) => agg(wk.key, v, acc))
  }

  def reduce(f: (V, V) => V)(
      implicit ew: Encoder[KV[Windowed[K], V]], eu: Encoder[Upsert[Windowed[K], V]],
      ek: Encoder[Windowed[K]], ev: Encoder[Option[V]]): KTable[Windowed[K], V] = {
    val sizeMs = parseMs(sizeExpr)
    val advanceMs = parseMs(advanceExpr)
    val windowedRecords = withWatermarkIfStreaming.flatMap { r =>
      windowsFor(r.ts.getTime, sizeMs, advanceMs).map { case (s, e) =>
        KV(Windowed(r.key, new Timestamp(s), new Timestamp(e)), r.value, r.ts)
      }
    }
    new KGroupedStream(windowedRecords).reduce(f)
  }

  private def parseMs(e: String): Long = e.stripSuffix(" milliseconds").toLong

  /** All windows covering tsMs: starts ≡ 0 (mod advance), start ∈
    * (tsMs − size, tsMs] — `TimeWindowOptions.WindowsFor`.
    */
  private def windowsFor(tsMs: Long, sizeMs: Long, advanceMs: Long): Seq[(Long, Long)] = {
    var start = tsMs - (tsMs % advanceMs)
    val out = Seq.newBuilder[(Long, Long)]
    while (start > tsMs - sizeMs) {
      out += ((start, start + sizeMs))
      start -= advanceMs
    }
    out.result()
  }
}

/** Session-windowed grouped stream — Spark-native `session_window` superset
  * (reference roadmap only, `feature.md:7`).
  */
final class SessionWindowedKStream[K, V](ds: Dataset[KV[K, V]], w: SessionWindow)
    extends Serializable {

  private def withWatermarkIfStreaming =
    if (ds.isStreaming && w.grace.toMillis > 0) ds.withWatermark("ts", w.graceExpr)
    else if (ds.isStreaming) ds.withWatermark("ts", "0 milliseconds")
    else ds

  def count(implicit eu: Encoder[Upsert[Windowed[K], Long]],
      et: Encoder[(K, Timestamp, Timestamp, Long, Timestamp)]): KTable[Windowed[K], Long] = {
    val df = withWatermarkIfStreaming.toDF("key", "value", "ts")
      .filter(col("key").isNotNull)
      .groupBy(session_window(col("ts"), w.gapExpr), col("key"))
      .agg(fcount(lit(1)).as("cnt"), max(col("ts")).as("mts"))
    new KTable(df.select(
        col("key"), col("session_window.start").as("start"),
        col("session_window.end").as("end"), col("cnt"), col("mts"))
      .as[(K, Timestamp, Timestamp, Long, Timestamp)]
      .map { case (k, s, e, c, mts) => Upsert(Windowed(k, s, e), Some(c), mts) })
  }
}
