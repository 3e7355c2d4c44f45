package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** One input record for the streaming as-of enrichment: a FACT (left) or a
  * DIMENSION update (right) on the same key, discriminated by which payload
  * is present (exactly one must be). `ts` is event time in epoch millis.
  */
final case class AsofEvent[K, L, R](key: K, ts: Long,
    left: Option[L], right: Option[R])

/** A fact enriched with the latest-known dimension state at its event time
  * (`asofTs`/`right` NULL when no dimension update at-or-before the fact
  * has arrived, or the match is staler than the tolerance).
  */
final case class AsofEnriched[K, L, R](key: K, ts: Long, left: L,
    asofTs: Option[Long], right: Option[R])

/** Streaming as-of enrichment — the temporal form of the reference's
  * stream-table join (`KStreamKTableJoinProcessor.cs:28-44` joins each
  * stream record against the table's CURRENT value; this processor joins
  * against the table's value AS OF the record's event time, keeping the
  * per-key dimension TIMELINE in state instead of only the latest row).
  * The batch twin is [[graft.operators.Temporal.asofJoin]] (backward
  * direction); on a time-ordered replay — every dimension update arrives
  * in an earlier-or-same microbatch than the facts it should serve — the
  * streaming output equals the batch join over the union of all batches
  * (spec-locked, `AsofEnrichSpec`).
  *
  * Semantics:
  *  - Within a microbatch, ALL dimension rows merge into state BEFORE any
  *    fact is enriched (a fact sees same-batch updates at or before its
  *    ts — matching the batch join).
  *  - A dimension update arriving AFTER a fact was already emitted does
  *    NOT retro-enrich it (stream-table rule; batch divergence happens
  *    exactly when replay order breaks the time-ordered contract).
  *  - Duplicate (key, ts) dimension rows combine via `preferRight`
  *    (default: the arriving row wins — the KTable upsert rule; pass a
  *    commutative reducer like `math.max` when same-ts duplicates can
  *    land in ONE batch, where arrival order is not defined).
  *  - `toleranceMs`: a match farther than this below the fact ts is
  *    discarded (pandas merge_asof tolerance, as in the batch join).
  *
  * State shape & scale: one ListState per key holding the (ts, payload)
  * timeline, ts-ascending. Every watermark advance COMPACTS it: entries
  * older than `watermark − tolerance` can only ever serve a fact as "the
  * newest entry below the cutoff", so exactly one of them is retained.
  * With a watermark the per-key state is bounded by the dimension's
  * update rate within the watermark window, not by history; without one
  * (TimeMode.None — the batch façade) the timeline lives for the single
  * pass only.
  */
final class AsofEnrichProcessor[K, L, R](
    toleranceMs: Option[Long] = None,
    preferRight: (R, R) => R = (_: R, b: R) => b)(
    implicit eTl: Encoder[(Long, R)])
    extends StatefulProcessor[K, AsofEvent[K, L, R], AsofEnriched[K, L, R]] {

  toleranceMs.foreach(t =>
    require(t >= 0, s"AsofEnrichProcessor: negative tolerance $t"))

  @transient private var timeline: ListState[(Long, R)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    timeline = getHandle.getListState[(Long, R)]("timeline", eTl, TTLConfig.NONE)

  override def handleInputRows(key: K, rows: Iterator[AsofEvent[K, L, R]],
      tv: TimerValues): Iterator[AsofEnriched[K, L, R]] = {
    val tl = ArrayBuffer.empty[(Long, R)]
    timeline.get().foreach(tl += _) // ts-ascending invariant
    val lefts = ArrayBuffer.empty[(Long, L)]
    var changed = false

    rows.foreach {
      case AsofEvent(_, ts, None, Some(r)) =>
        upsert(tl, ts, r); changed = true
      case AsofEvent(_, ts, Some(l), None) =>
        lefts += ((ts, l))
      case e => throw new IllegalArgumentException(
        s"AsofEvent must carry exactly one of left/right, got $e")
    }

    // deterministic emit order; facts see every same-batch right above.
    // MATERIALIZED (not a lazy iterator) because compaction below mutates
    // the timeline the matches read — and it must: this batch's facts are
    // enriched BEFORE entries are evicted. Spark admits input rows with
    // the PREVIOUS batch's (older) late-events watermark, so a fact with
    // ts in [lateWatermark, evictionWatermark − tolerance) is legal input
    // here — compacting first would evict its true as-of match in the
    // same call and silently enrich it to NULL (diverging from the batch
    // asofJoin even under the time-ordered replay contract).
    lefts.sortInPlaceBy(_._1)
    val out = lefts.map { case (ts, l) =>
      matchAt(tl, ts) match {
        case Some((rts, r)) =>
          AsofEnriched[K, L, R](key, ts, l, Some(rts), Some(r))
        case None => AsofEnriched[K, L, R](key, ts, l, None, None)
      }
    }

    // watermark compaction ON THE WAY OUT: of the entries at or below the
    // cutoff, only the newest can still serve a future fact — keep just
    // it. Batch N's eviction boundary equals batch N+1's late-record
    // admission boundary, so every row the engine ever admits can still
    // find its newest-at-or-before entry.
    val wm = tv.getCurrentWatermarkInMs()
    if (wm > 0 && tl.nonEmpty) {
      val cutoff = wm - toleranceMs.getOrElse(0L)
      val below = tl.lastIndexWhere(_._1 <= cutoff)
      if (below > 0) { tl.remove(0, below); changed = true }
    }
    if (changed) {
      timeline.clear()
      if (tl.nonEmpty) timeline.appendList(tl.toArray)
    }
    out.iterator
  }

  /** Insert keeping ts order; same-ts entries fold through preferRight. */
  private def upsert(tl: ArrayBuffer[(Long, R)], ts: Long, r: R): Unit = {
    var lo = 0; var hi = tl.length
    while (lo < hi) { // first index with entry.ts >= ts
      val mid = (lo + hi) >>> 1
      if (tl(mid)._1 < ts) lo = mid + 1 else hi = mid
    }
    if (lo < tl.length && tl(lo)._1 == ts)
      tl(lo) = (ts, preferRight(tl(lo)._2, r))
    else tl.insert(lo, (ts, r))
  }

  /** Newest entry at-or-before `ts`, tolerance-gated. */
  private def matchAt(tl: ArrayBuffer[(Long, R)], ts: Long): Option[(Long, R)] = {
    var lo = 0; var hi = tl.length
    while (lo < hi) { // first index with entry.ts > ts
      val mid = (lo + hi) >>> 1
      if (tl(mid)._1 <= ts) lo = mid + 1 else hi = mid
    }
    if (lo == 0) None
    else {
      val cand = tl(lo - 1)
      if (toleranceMs.forall(t => ts - cand._1 <= t)) Some(cand) else None
    }
  }
}

object AsofEnrich {
  /** Run the enrichment over a keyed event stream (facts + dimension
    * updates in ONE stream — union them upstream; see [[AsofEvent]]).
    * Event-time mode needs a watermark on the input for compaction and
    * late-data semantics; works in batch too (single pass — the
    * equivalence gate `q_asof_stream` runs exactly that).
    */
  def enrich[K, L, R](events: Dataset[AsofEvent[K, L, R]],
      toleranceMs: Option[Long] = None,
      preferRight: (R, R) => R = (_: R, b: R) => b,
      timeMode: TimeMode = TimeMode.EventTime(),
      outputMode: OutputMode = OutputMode.Append())(
      implicit ek: Encoder[K], eTl: Encoder[(Long, R)],
      eo: Encoder[AsofEnriched[K, L, R]]): Dataset[AsofEnriched[K, L, R]] = {
    // batch-mode transformWithState asks the driver-side
    // StateStoreCoordinator for store locations, but only a STREAMING
    // query start registers that RPC endpoint — in a batch-only session
    // the lookup dies with RpcEndpointNotFoundException. Touching the
    // manager's lazy ref registers it (idempotent, no-op when a stream
    // already ran).
    org.apache.spark.sql.graft.StreamingBridge
      .ensureStateStoreCoordinator(events.sparkSession)
    events.groupByKey(_.key)
      .transformWithState(
        new AsofEnrichProcessor[K, L, R](toleranceMs, preferRight),
        timeMode, outputMode)
  }
}
