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

  // non-windowed stream aggregations skip null key OR null value
  // (`KStreamAggregateProcessor.cs:24`, `KStreamReduceProcessor.cs:20`);
  // windowed ones skip only null keys (`KStreamWindowAggregateProcessor.cs:45`)
  private def nonNullKey: Dataset[KV[K, V]] =
    ds.filter(r => r.key != null && r.value != null)

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
      evr: Encoder[(Option[VR], Long)]): KTable[K, VR] =
    new KTable(nonNullKey.groupByKey(_.key)
      .flatMapGroupsWithState[(Option[VR], Long), Upsert[K, VR]](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[KV[K, V]], state: GroupState[(Option[VR], Long)]) =>
          // state carries the running max ts — a late batch must emit the
          // reference's max(record ts, previous agg ts), never a regression
          var (acc, maxTs) = state.getOption.getOrElse((Option.empty[VR], 0L))
          it.toSeq.sortBy(_.ts.getTime).foreach { r =>
            acc = Some(agg(key, r.value, acc.getOrElse(init())))
            maxTs = math.max(maxTs, r.ts.getTime)
          }
          state.update((acc, maxTs))
          Iterator.single(Upsert(key, acc, new Timestamp(maxTs)))
      })

  /** `Reduce` (`IKGroupedStream.cs:251`): first value seeds. */
  def reduce(f: (V, V) => V)(
      implicit eu: Encoder[Upsert[K, V]], ek: Encoder[K],
      ev: Encoder[(Option[V], Long)]): KTable[K, V] =
    new KTable(nonNullKey.groupByKey(_.key)
      .flatMapGroupsWithState[(Option[V], Long), Upsert[K, V]](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[KV[K, V]], state: GroupState[(Option[V], Long)]) =>
          var (acc, maxTs) = state.getOption.getOrElse((Option.empty[V], 0L))
          it.toSeq.sortBy(_.ts.getTime).foreach { r =>
            acc = Some(acc.fold(r.value)(a => f(a, r.value)))
            maxTs = math.max(maxTs, r.ts.getTime)
          }
          state.update((acc, maxTs))
          Iterator.single(Upsert(key, acc, new Timestamp(maxTs)))
      })

  /** `WindowedBy` (`IKGroupedStream`): tumbling/hopping/session. */
  def windowedBy(w: TumblingWindow): TimeWindowedKStream[K, V] =
    new TimeWindowedKStream(ds, w.sizeExpr, w.sizeExpr, w)

  def windowedBy(w: HoppingWindow): TimeWindowedKStream[K, V] =
    new TimeWindowedKStream(ds, w.sizeExpr, w.advanceExpr, w)

  def windowedBy(w: SessionWindow): SessionWindowedKStream[K, V] =
    new SessionWindowedKStream(ds, w)

  def windowedBy(w: SlidingWindow): SlidingWindowedKStream[K, V] =
    new SlidingWindowedKStream(ds, w)

  /** User-defined window shapes ([[CustomWindow]]) — the reference's
    * `WindowOptions` subclassing surface.
    */
  def windowedBy(w: CustomWindow): CustomWindowedKStream[K, V] =
    new CustomWindowedKStream(new TimeWindowedKStream(
      ds, w.sizeExpr, w.sizeExpr, w, Some(w.assign)))
}

/** Windowed grouped stream (`ITimeWindowedKStream`,
  * `core/Stream/ITimeWindowedKStream.cs:28`). Aggregations run as Catalyst
  * `window()` group-bys — partial aggregation + single shuffle on
  * (key, window); grace becomes `withWatermark` in streaming
  * (`KStreamWindowAggregateProcessor.cs:52-58`).
  */
final class TimeWindowedKStream[K, V](ds: Dataset[KV[K, V]],
    sizeExpr: String, advanceExpr: String, w: WindowDef,
    assign: Option[Long => Seq[(Long, Long)]] = None) extends Serializable {

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
      ek: Encoder[Windowed[K]], evr: Encoder[(Option[VR], Long)]): KTable[Windowed[K], VR] =
    new KTable(windowedFold[VR](init, (wk, v, acc) => agg(wk.key, v, acc)))

  def reduce(f: (V, V) => V)(
      implicit ew: Encoder[KV[Windowed[K], V]], eu: Encoder[Upsert[Windowed[K], V]],
      ek: Encoder[Windowed[K]], ev: Encoder[(Option[V], Long)]): KTable[Windowed[K], V] =
    new KTable(windowedFold[V](
      () => null.asInstanceOf[V],
      (_, v, acc) => if (acc == null) v else f(acc, v)))

  /** Shared windowed fold: explode records to covering windows, RE-apply the
    * watermark on the exploded rows (typed flatMap drops the event-time
    * attribute), then fold per (key, window) with event-time state eviction —
    * closed windows (watermark past end) have their state removed, so state
    * is bounded by OPEN windows × keys, and grace actually drops late rows.
    */
  private def windowedFold[VR](init: () => VR, agg: (Windowed[K], V, VR) => VR)(
      implicit ew: Encoder[KV[Windowed[K], V]], eu: Encoder[Upsert[Windowed[K], VR]],
      ek: Encoder[Windowed[K]],
      evr: Encoder[(Option[VR], Long)]): Dataset[Upsert[Windowed[K], VR]] = {
    val sizeMs = parseMs(sizeExpr)
    val advanceMs = parseMs(advanceExpr)
    // a CustomWindow supplies its own covering-windows function; sizeMs is
    // then its maxSize bound, which keeps the watermark/eviction arithmetic
    // below valid for every assignable window
    val assignFn: Long => Seq[(Long, Long)] =
      assign.getOrElse(t => windowsFor(t, sizeMs, advanceMs))
    val exploded = ds.filter(r => r.key != null).flatMap { r =>
      assignFn(r.ts.getTime).map { case (s, e) =>
        KV(Windowed(r.key, new Timestamp(s), new Timestamp(e)), r.value, r.ts)
      }
    }
    val streaming = exploded.isStreaming
    // Lateness is measured from the WINDOW END, as the reference does
    // (`TimeWindowOptions.GracePeriodMs`: admit out-of-order events until
    // stream time passes end + grace) and as Spark's native window() agg does
    // (the count path) — a row is late only when its window closed. The
    // watermark delay is therefore size + grace: Spark's row-level late
    // filter (record ts vs watermark) then never drops a row whose window is
    // still open (row.ts >= end − size >= watermark − grace − size), and the
    // exact end-based check runs in the fold below.
    val graceMs = w.grace.toMillis
    val withWm =
      if (streaming)
        exploded.withWatermark("ts", s"${sizeMs + graceMs} milliseconds")
      else exploded
    val timeout =
      if (streaming) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    withWm.groupByKey(_.key)
      .flatMapGroupsWithState[(Option[VR], Long), Upsert[Windowed[K], VR]](
        OutputMode.Update(), timeout) {
        (wk: Windowed[K], it: Iterator[KV[Windowed[K], V]],
            state: GroupState[(Option[VR], Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // true event-time watermark (the applied delay includes the size
            // padding, so add it back; watermark 0 = not yet established):
            // wmMs = streamTime − grace. A window closes when end ≤ wmMs,
            // i.e. streamTime ≥ end + grace — exactly the reference's
            // closeTime = streamTime − grace, drop when end ≤ closeTime
            // (`TimeWindowOptions.GracePeriodMs`). Grace is NOT re-added on
            // the left: the watermark delay already subtracted it once.
            val curWm = if (streaming) state.getCurrentWatermarkMs() else 0L
            val wmMs = if (curWm > 0) curWm + sizeMs else Long.MinValue
            if (streaming && wk.end.getTime <= wmMs) {
              // closed window: drop its late rows; free state early if the
              // timeout hasn't fired yet
              if (state.exists) state.remove()
              Iterator.empty
            } else {
              var (acc, maxTs) = state.getOption.getOrElse((Option.empty[VR], 0L))
              it.toSeq.sortBy(_.ts.getTime).foreach { r =>
                acc = Some(agg(wk, r.value, acc.getOrElse(init())))
                maxTs = math.max(maxTs, r.ts.getTime)
              }
              state.update((acc, maxTs))
              if (streaming)
                state.setTimeoutTimestamp(wk.end.getTime + graceMs)
              Iterator.single(Upsert(wk, acc, new Timestamp(maxTs)))
            }
          }
      }
  }

  private def parseMs(e: String): Long = e.stripSuffix(" milliseconds").toLong

  /** All windows covering tsMs: starts ≡ 0 (mod advance), start ∈
    * (tsMs − size, tsMs] — `TimeWindowOptions.WindowsFor`.
    */
  private def windowsFor(tsMs: Long, sizeMs: Long, advanceMs: Long): Seq[(Long, Long)] = {
    // floorMod: pre-epoch timestamps must floor toward -inf like window()
    var start = tsMs - java.lang.Math.floorMod(tsMs, advanceMs)
    val out = Seq.newBuilder[(Long, Long)]
    while (start > tsMs - sizeMs) {
      out += ((start, start + sizeMs))
      start -= advanceMs
    }
    out.result()
  }
}

/** Custom-windowed grouped stream ([[CustomWindow]]): the same exploded
  * event-time fold as the fixed shapes, with the user's window-assignment
  * function in place of the grid arithmetic. `count` rides the fold too —
  * the native `window()` shortcut only exists for grid-aligned shapes.
  * The close/eviction arithmetic stays valid because the watermark delay
  * is bounded by `maxSize` (every assignable window spans at most that).
  */
final class CustomWindowedKStream[K, V](inner: TimeWindowedKStream[K, V])
    extends Serializable {
  def aggregate[VR](init: () => VR)(agg: (K, V, VR) => VR)(
      implicit ew: Encoder[KV[Windowed[K], V]], eu: Encoder[Upsert[Windowed[K], VR]],
      ek: Encoder[Windowed[K]], evr: Encoder[(Option[VR], Long)]): KTable[Windowed[K], VR] =
    inner.aggregate(init)(agg)

  def reduce(f: (V, V) => V)(
      implicit ew: Encoder[KV[Windowed[K], V]], eu: Encoder[Upsert[Windowed[K], V]],
      ek: Encoder[Windowed[K]], ev: Encoder[(Option[V], Long)]): KTable[Windowed[K], V] =
    inner.reduce(f)

  def count(
      implicit ew: Encoder[KV[Windowed[K], V]], eu: Encoder[Upsert[Windowed[K], Long]],
      ek: Encoder[Windowed[K]], el: Encoder[(Option[Long], Long)]): KTable[Windowed[K], Long] =
    inner.aggregate(() => 0L)((_, _, acc) => acc + 1L)
}

/** Sliding-windowed grouped stream (KIP-450 analog — superset, see
  * [[SlidingWindow]]): one window [t − size, t] per distinct record
  * timestamp t.
  *
  * Batch: a codegen'd RANGE-frame window function — single shuffle on the
  * key, no state, no explosion; at 100 TB this is the cheapest possible
  * formulation (Catalyst sorts each partition once and streams the frame).
  * Streaming: per-key event-time buffer with watermark eviction, so state
  * is bounded by (events within `size` + grace) per key.
  */
final class SlidingWindowedKStream[K, V](ds: Dataset[KV[K, V]], w: SlidingWindow)
    extends Serializable {

  def count(implicit eu: Encoder[Upsert[Windowed[K], Long]],
      et: Encoder[(K, Long, Long)], ek: Encoder[K],
      ekv: Encoder[KV[K, V]],
      est: Encoder[Vector[(Long, V)]]): KTable[Windowed[K], Long] = {
    val sizeMs = w.sizeMs
    if (!ds.isStreaming) {
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("key")).orderBy(col("tsm"))
        .rangeBetween(-sizeMs, 0) // [t-size, t], both ends inclusive
      val df = ds.filter(r => r.key != null).toDF("key", "value", "ts")
        .withColumn("tsm", unix_millis(col("ts")))
        .withColumn("cnt", fcount(lit(1)).over(win))
        .select(col("key"), col("tsm"), col("cnt"))
        .distinct() // same-ts records share one window
      new KTable(df.as[(K, Long, Long)].map { case (k, t, c) =>
        Upsert(Windowed(k, new Timestamp(t - sizeMs), new Timestamp(t)),
          Some(c), new Timestamp(t))
      })
    } else {
      new KTable(streamingWindows[Long]((_, slice) => slice.size.toLong))
    }
  }

  /** Shared streaming path for count/aggregate/reduce: a per-key event
    * buffer kept SORTED by event time, watermark-evicted, with late-but-
    * within-grace arrivals RE-EMITTING every already-formed window whose
    * span [end − size, end] contains the late event — so streaming results
    * converge to the batch RANGE-frame results. For in-order arrival the
    * affected set is just the record's own window; the extra work is
    * proportional to events inside one window span.
    */
  private def streamingWindows[VR](foldWindow: (K, Seq[(Long, V)]) => VR)(
      implicit eu: Encoder[Upsert[Windowed[K], VR]], ek: Encoder[K],
      est: Encoder[Vector[(Long, V)]]): Dataset[Upsert[Windowed[K], VR]] = {
    val sizeMs = w.sizeMs
    val graceMs = w.grace.toMillis
    val src = ds.filter(r => r.key != null).withWatermark("ts", w.graceExpr)
    src.groupByKey(_.key)
      .flatMapGroupsWithState[Vector[(Long, V)], Upsert[Windowed[K], VR]](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout) {
        (key: K, it: Iterator[KV[K, V]], state: GroupState[Vector[(Long, V)]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var buf = state.getOption.getOrElse(Vector.empty[(Long, V)]) // ts-sorted
            // evict events that can no longer fall in any future window
            val wm = state.getCurrentWatermarkMs()
            if (wm > 0) buf = buf.dropWhile(_._1 < wm - sizeMs)
            // one result per affected window end; a later re-emit overwrites
            val out = scala.collection.mutable.LinkedHashMap.empty[Long, Upsert[Windowed[K], VR]]
            it.toSeq.sortBy(_.ts.getTime).foreach { r =>
              val t = r.ts.getTime
              // insert keeping ts order (same-ts: after existing = arrival order)
              val at = buf.lastIndexWhere(_._1 <= t) + 1
              buf = (buf.take(at) :+ (t -> r.value)) ++ buf.drop(at)
              // window ends at every buffered event ts in [t, t + size]:
              // t's own window plus later windows a late event now falls into
              buf.iterator.map(_._1).filter(e => e >= t && e <= t + sizeMs)
                .toSeq.distinct.foreach { e =>
                  val slice = buf.filter(x => x._1 >= e - sizeMs && x._1 <= e)
                  out(e) = Upsert(
                    Windowed(key, new Timestamp(e - sizeMs), new Timestamp(e)),
                    Some(foldWindow(key, slice)), new Timestamp(e))
                }
            }
            state.update(buf)
            if (buf.nonEmpty)
              state.setTimeoutTimestamp(buf.last._1 + sizeMs + graceMs + 1)
            out.valuesIterator
          }
      }
  }

  /** Sliding-window `aggregate`: arbitrary event-time-ordered fold over
    * [t − size, t] per distinct record timestamp. Batch collects each
    * window's events via the same RANGE frame (`collect_list` — per-row cost
    * is O(events in window), the price of an arbitrary non-mergeable fold;
    * prefer [[count]] / algebraic sums where possible). Ties in event time
    * fold in frame order (arrival), matching the reference's arrival-order
    * processing.
    */
  def aggregate[VR](init: () => VR)(agg: (K, V, VR) => VR)(
      implicit eu: Encoder[Upsert[Windowed[K], VR]],
      ebatch: Encoder[(K, Long, Seq[(Long, V)])], ek: Encoder[K],
      est: Encoder[Vector[(Long, V)]]): KTable[Windowed[K], VR] = {
    val sizeMs = w.sizeMs
    if (!ds.isStreaming) {
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("key")).orderBy(col("tsm"))
        .rangeBetween(-sizeMs, 0)
      val df = ds.filter(r => r.key != null).toDF("key", "value", "ts")
        .withColumn("tsm", unix_millis(col("ts")))
        .withColumn("evs", collect_list(struct(col("tsm"), col("value"))).over(win))
        .select(col("key"), col("tsm"), col("evs"))
        .distinct()
      new KTable(df.as[(K, Long, Seq[(Long, V)])].map { case (k, t, evs) =>
        var acc = init()
        evs.foreach { case (_, v) => acc = agg(k, v, acc) } // frame is ts-ordered
        Upsert(Windowed(k, new Timestamp(t - sizeMs), new Timestamp(t)),
          Some(acc), new Timestamp(t))
      })
    } else {
      new KTable(streamingWindows[VR] { (k, slice) =>
        var acc = init()
        slice.foreach { case (_, v) => acc = agg(k, v, acc) } // slice is ts-sorted
        acc
      })
    }
  }

  def reduce(f: (V, V) => V)(
      implicit eu: Encoder[Upsert[Windowed[K], V]],
      ebatch: Encoder[(K, Long, Seq[(Long, V)])], ek: Encoder[K],
      est: Encoder[Vector[(Long, V)]]): KTable[Windowed[K], V] =
    aggregate(() => null.asInstanceOf[V])(
      (_, v, acc) => if (acc == null) v else f(acc, v))
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

  /** Session `aggregate`: arbitrary fold per merged session. Events are
    * collected per session via Catalyst's `session_window` (native session
    * merging, map-side partial list concat, watermark-based close in
    * streaming), then folded in event-time order in a typed map. The sort
    * comparator orders by the TS FIELD ONLY, so `V` needs no ordering
    * (maps, nested types all work); event-time ties fold in unspecified
    * order — make the fold tie-commutative if ties are possible.
    */
  def aggregate[VR](init: () => VR)(agg: (K, V, VR) => VR)(
      implicit eu: Encoder[Upsert[Windowed[K], VR]],
      erow: Encoder[(K, Timestamp, Timestamp, Seq[(Timestamp, V)])]): KTable[Windowed[K], VR] = {
    val byTs = (l: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column) =>
      when(l.getField("ts") < r.getField("ts"), -1)
        .when(l.getField("ts") > r.getField("ts"), 1).otherwise(0)
    val df = withWatermarkIfStreaming.toDF("key", "value", "ts")
      .filter(col("key").isNotNull)
      .groupBy(session_window(col("ts"), w.gapExpr), col("key"))
      .agg(array_sort(collect_list(struct(col("ts"), col("value"))), byTs).as("evs"))
    new KTable(df.select(
        col("key"), col("session_window.start").as("start"),
        col("session_window.end").as("end"), col("evs"))
      .as[(K, Timestamp, Timestamp, Seq[(Timestamp, V)])]
      .map { case (k, s, e, evs) =>
        var acc = init()
        evs.foreach { case (_, v) => acc = agg(k, v, acc) }
        // evs is ts-ascending: last element carries the max event time
        Upsert(Windowed(k, s, e), Some(acc), evs.last._1)
      })
  }

  def reduce(f: (V, V) => V)(
      implicit eu: Encoder[Upsert[Windowed[K], V]],
      erow: Encoder[(K, Timestamp, Timestamp, Seq[(Timestamp, V)])]): KTable[Windowed[K], V] =
    aggregate(() => null.asInstanceOf[V])(
      (_, v, acc) => if (acc == null) v else f(acc, v))
}
