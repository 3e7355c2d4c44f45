package graft.dsl

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions.{broadcast, col, expr}

import graft.streaming.StatefulOps

/** Event stream: the reference's `IKStream<K,V>` (`core/Stream/IKStream.cs:21`)
  * re-expressed as a thin wrapper over `Dataset[KV[K, V]]` — every DSL call
  * is a Catalyst transformation, so chains of stateless operators fuse into
  * one whole-stage-codegen span instead of the reference's per-record
  * processor chain (`AbstractProcessor.cs:157-207`).
  *
  * Works identically over streaming and batch datasets (the batch façade runs
  * the same plans on parquet for the DuckDB oracle).
  */
final class KStream[K, V](val ds: Dataset[KV[K, V]]) extends Serializable {

  /** `Filter` (`IKStream.cs:67`). */
  def filter(p: (K, V) => Boolean): KStream[K, V] =
    new KStream(ds.filter(r => p(r.key, r.value)))

  /** `FilterNot` (`IKStream.cs:79`). */
  def filterNot(p: (K, V) => Boolean): KStream[K, V] =
    new KStream(ds.filter(r => !p(r.key, r.value)))

  /** `Map` — re-key + re-value (`IKStream.cs:274`); key-changing. */
  def map[K2, V2](f: (K, V) => (K2, V2))(
      implicit e: Encoder[KV[K2, V2]]): KStream[K2, V2] =
    new KStream(ds.map { r => val (k2, v2) = f(r.key, r.value); KV(k2, v2, r.ts) })

  /** `MapValues` (`IKStream.cs:313`) — key-preserving, no repartition. */
  def mapValues[V2](f: V => V2)(implicit e: Encoder[KV[K, V2]]): KStream[K, V2] =
    new KStream(ds.map(r => KV(r.key, f(r.value), r.ts)))

  def mapValuesWithKey[V2](f: (K, V) => V2)(
      implicit e: Encoder[KV[K, V2]]): KStream[K, V2] =
    new KStream(ds.map(r => KV(r.key, f(r.key, r.value), r.ts)))

  /** `FlatMap` (`IKStream.cs:155`). */
  def flatMap[K2, V2](f: (K, V) => IterableOnce[(K2, V2)])(
      implicit e: Encoder[KV[K2, V2]]): KStream[K2, V2] =
    new KStream(ds.flatMap(r => f(r.key, r.value).iterator.map { case (k2, v2) => KV(k2, v2, r.ts) }))

  /** `FlatMapValues` (`IKStream.cs:189`). */
  def flatMapValues[V2](f: V => IterableOnce[V2])(
      implicit e: Encoder[KV[K, V2]]): KStream[K, V2] =
    new KStream(ds.flatMap(r => f(r.value).iterator.map(v2 => KV(r.key, v2, r.ts))))

  /** `SelectKey` (`IKStream.cs:409`) — key-changing. */
  def selectKey[K2](f: (K, V) => K2)(
      implicit e: Encoder[KV[K2, V]]): KStream[K2, V] =
    new KStream(ds.map(r => KV(f(r.key, r.value), r.value, r.ts)))

  /** Keep at most `n` records per key, in event-time order — the streaming
    * counterpart of `operators.Sampling.perKeyCap` (bounding any key's
    * contribution during ingest, e.g. max N documents per domain). Runs in
    * batch AND streaming: per-key state is ONE counter, carried across
    * microbatches. Superset — the reference has no sampling surface.
    */
  def limitPerKey(n: Int)(implicit ek: Encoder[K],
      el: Encoder[Long]): KStream[K, V] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    implicit val eds: Encoder[KV[K, V]] = ds.encoder
    new KStream(ds.groupByKey(_.key)
      .flatMapGroupsWithState[Long, KV[K, V]](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_: K, it: Iterator[KV[K, V]],
            state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          val kept = state.getOption.getOrElse(0L)
          val out = it.toSeq.sortBy(_.ts.getTime)
            .take(math.max(0L, n - kept).toInt)
          state.update(kept + out.size)
          out.iterator
      })
  }

  /** Ingest-time exact deduplication: keep the FIRST record per key.
    *
    * Keep policy differs by execution mode (asserted by `DslOpsSpec`):
    * streaming keeps the first-ARRIVED record per key
    * (`dropDuplicatesWithinWatermark` ignores event time), so an
    * out-of-order later-ts record that arrives first survives; batch keeps
    * the earliest EVENT-TIME record (ties broken by `tieBreak` columns,
    * then source order). In streaming the per-key state is bounded by the
    * `withinMs` watermark horizon, so a late duplicate beyond the horizon
    * is admitted rather than the state growing forever — the standard trade
    * for unbounded streams. Superset — the reference has no dedup surface
    * (it is the classic Kafka Streams recipe built on a state store).
    *
    * @param tieBreak extra batch-mode ordering columns after `ts`, so
    *   equal-timestamp survivors are deterministic at any scale (source
    *   order, the final fallback, is partition-layout dependent).
    */
  def deduplicate(withinMs: Long, tieBreak: Seq[Column] = Nil)(
      implicit e: Encoder[KV[K, V]]): KStream[K, V] =
    if (ds.isStreaming)
      new KStream(
        ds.withWatermark("ts", s"$withinMs milliseconds")
          .dropDuplicatesWithinWatermark("key"))
    else {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{monotonically_increasing_id, row_number}
      val w = Window.partitionBy("key")
        .orderBy((col("ts").asc +: tieBreak.map(_.asc)) :+ col("__seq").asc: _*)
      new KStream(ds.toDF()
        .withColumn("__seq", monotonically_increasing_id())
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn", "__seq")
        .as[KV[K, V]])
    }

  /** Explicit repartition-by-key (Kafka Streams 2.6 `repartition()`; the
    * reference only roadmaps repartition topics — `1_2_0.md:14`,
    * `GroupedStreamAggregateBuilder.cs:37` TODO). Rarely needed: every
    * `groupByKey`/join already shuffles correctly; use this to pre-shape
    * parallelism (e.g. widen a narrow source before CPU-heavy maps, or
    * co-partition two streams once for several downstream joins).
    */
  def repartition(numPartitions: Int): KStream[K, V] =
    new KStream(ds.repartition(numPartitions, col("key")))

  /** `Peek` (`IKStream.cs:385`) — pass-through side effect. */
  def peek(action: (K, V) => Unit): KStream[K, V] =
    new KStream(ds.map { r => action(r.key, r.value); r }(ds.encoder))

  /** `Branch` (`IKStream.cs:37`): ordered predicates, first match wins,
    * non-matching dropped. One shared plan, N filters — Catalyst reuses the
    * scan (`KStreamBranchProcessor.cs:16-27`).
    */
  def branch(predicates: ((K, V) => Boolean)*): Seq[KStream[K, V]] =
    predicates.zipWithIndex.map { case (p, i) =>
      val earlier = predicates.take(i)
      new KStream(ds.filter(r =>
        p(r.key, r.value) && !earlier.exists(q => q(r.key, r.value))))
    }

  /** `merge` — multi-stream union (Kafka Streams op the reference lacks;
    * SURVEY §2.6).
    */
  def merge(other: KStream[K, V]): KStream[K, V] =
    new KStream(ds.union(other.ds))

  /** Re-timestamp: the reference's `ITimestampExtractor`
    * (`core/Processors/ITimestampExtractor.cs:10`) as a per-record function.
    *
    * `onInvalid` handles a null or negative extracted timestamp, mirroring
    * the reference's policy extractors
    * (`core/Processors/Internal/ExtractRecordMetadataTimestamp.cs:6-18`):
    * [[InvalidTimestampPolicy.Fail]] (the reference default) aborts the
    * task, [[InvalidTimestampPolicy.LogAndSkip]] drops the record,
    * [[InvalidTimestampPolicy.UseRecordMetadata]] keeps the record's
    * current (source/metadata) timestamp.
    */
  def withTimestamp(f: (K, V) => java.sql.Timestamp,
      onInvalid: InvalidTimestampPolicy = InvalidTimestampPolicy.Fail): KStream[K, V] =
    new KStream(ds.flatMap { r =>
      val t = f(r.key, r.value)
      if (t != null && t.getTime >= 0) Some(KV(r.key, r.value, t))
      else onInvalid match {
        case InvalidTimestampPolicy.Fail =>
          throw new IllegalStateException(
            s"Invalid (negative or null) extracted timestamp $t for key ${r.key}; " +
              "use LogAndSkip or UseRecordMetadata to tolerate it")
        case InvalidTimestampPolicy.LogAndSkip =>
          KStream.log.warn(s"Skipping record with invalid extracted timestamp $t")
          None
        case InvalidTimestampPolicy.UseRecordMetadata => Some(r)
      }
    }(ds.encoder))

  /** `GroupByKey` (`IKStream.cs`; shuffle boundary — Spark repartitions
    * correctly where the reference left repartitioning unimplemented,
    * SURVEY §2.8).
    */
  def groupByKey: KGroupedStream[K, V] = new KGroupedStream(ds)

  /** `GroupBy` — re-key then group. */
  def groupBy[K2](f: (K, V) => K2)(
      implicit e: Encoder[KV[K2, V]]): KGroupedStream[K2, V] =
    new KGroupedStream(selectKey(f).ds)

  /** `ToTable` (`IKStream.cs:1451`): upsert-by-key materialization. The
    * batch fold emits one row per key, so the snapshot is unique-keyed and
    * downstream joins take the scan → equi-join fast paths.
    */
  def toTable(implicit eu: Encoder[Upsert[K, V]], ekv: Encoder[KV[K, V]],
      ek: Encoder[K]): KTable[K, V] =
    new KTable(StatefulOps.latestPerKey(ds), uniqueKeys = !ds.isStreaming)

  /** KStream ⋈ KStream windowed join (`IKStream.cs:983`): interval join on
    * key with |ts1 − ts2| within the window. In streaming, both sides must
    * carry watermarks (`withWatermarkMs`).
    */
  def join[V2, VR](other: KStream[K, V2], windows: JoinWindows)(
      joiner: (V, V2) => VR)(
      implicit e: Encoder[KV[K, VR]],
      et: Encoder[(K, V, Option[V2], java.sql.Timestamp,
        Option[java.sql.Timestamp])]): KStream[K, VR] =
    doStreamJoin(other, windows, "inner")((v, v2) => joiner(v, v2.get))

  /** Left windowed join (`IKStream.cs:1177`): unmatched left emits
    * joiner(v, None). Streaming emits the null-side row only once the
    * watermark passes (cleaner than the reference's eager emit — SURVEY §2.5
    * documents the divergence).
    */
  def leftJoin[V2, VR](other: KStream[K, V2], windows: JoinWindows)(
      joiner: (V, Option[V2]) => VR)(
      implicit e: Encoder[KV[K, VR]],
      et: Encoder[(K, V, Option[V2], java.sql.Timestamp,
        Option[java.sql.Timestamp])]): KStream[K, VR] =
    doStreamJoin(other, windows, "left_outer")(joiner)

  /** Full-outer windowed join (`IKStream.cs:1329`). */
  def outerJoin[V2, VR](other: KStream[K, V2], windows: JoinWindows)(
      joiner: (Option[V], Option[V2]) => VR)(
      implicit e: Encoder[KV[K, VR]],
      et: Encoder[(Option[K], Option[K], Option[V], Option[V2],
        Option[java.sql.Timestamp], Option[java.sql.Timestamp])]): KStream[K, VR] = {
    val (l, r, cond) = joinSides(other, windows)
    val joined = l.join(r, cond, "full_outer")
    val out = joined.select(
        col("l.key").as("lk"), col("r.key").as("rk"),
        col("l.value").as("lv"), col("r.value").as("rv"),
        col("l.ts").as("lts"), col("r.ts").as("rts"))
      .as[(Option[K], Option[K], Option[V], Option[V2], Option[java.sql.Timestamp],
        Option[java.sql.Timestamp])]
      .map { case (lk, rk, lv, rv, lts, rts) =>
        val ts = (lts.map(_.getTime) ++ rts.map(_.getTime)).max
        KV(lk.orElse(rk).get, joiner(lv, rv), new java.sql.Timestamp(ts))
      }
    new KStream(out)
  }

  /** Both sides as DataFrames with watermarks derived from the join window:
    * buffered join state is bounded by window + grace
    * (TimeWindowOptions.GracePeriodMs analog).
    */
  private def joinSides[V2](other: KStream[K, V2], windows: JoinWindows) = {
    def side(d: Dataset[_], alias: String) = {
      val df = d.toDF("key", "value", "ts")
      val alreadyWatermarked = df.queryExecution.logical.collectFirst {
        case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => e
      }.isDefined
      (if (df.isStreaming && !alreadyWatermarked)
        df.withWatermark("ts", s"${windows.grace.toMillis} milliseconds")
      else df).as(alias)
    }
    // match iff r.ts ∈ [l.ts − before, l.ts + after] (JoinWindowOptions.cs:35-53)
    val cond = col("l.key") === col("r.key") &&
      col("r.ts") >= col("l.ts") - expr(s"INTERVAL ${windows.beforeMs} MILLISECONDS") &&
      col("r.ts") <= col("l.ts") + expr(s"INTERVAL ${windows.afterMs} MILLISECONDS")
    (side(ds, "l"), side(other.ds, "r"), cond)
  }

  private def doStreamJoin[V2, VR](other: KStream[K, V2], windows: JoinWindows,
      joinType: String)(joiner: (V, Option[V2]) => VR)(
      implicit e: Encoder[KV[K, VR]],
      et: Encoder[(K, V, Option[V2], java.sql.Timestamp,
        Option[java.sql.Timestamp])]): KStream[K, VR] = {
    val (l, r, cond) = joinSides(other, windows)
    val joined = l.join(r, cond, joinType)
    val out = joined.select(col("l.key").as("k"), col("l.value").as("lv"),
        col("r.value").as("rv"), col("l.ts").as("lts"), col("r.ts").as("rts"))
      .as[(K, V, Option[V2], java.sql.Timestamp, Option[java.sql.Timestamp])]
      .map { case (k, lv, rv, lts, rts) =>
        // result ts = max of inputs (KStreamKStreamJoinProcessor.cs:58-61)
        val ts = rts.map(t => math.max(t.getTime, lts.getTime)).getOrElse(lts.getTime)
        KV(k, joiner(lv, rv), new java.sql.Timestamp(ts))
      }
    new KStream(out)
  }

  /** KStream ⋈ KTable (`IKStream.cs:594`): stream-side-driven lookup. */
  def join[VT, VR](table: KTable[K, VT])(joiner: (V, VT) => VR)(
      implicit esr: Encoder[graft.streaming.SideRow[K, V, VT]],
      ekv: Encoder[KV[K, VR]], ek: Encoder[K],
      est: Encoder[Option[VT]],
      easof: Encoder[(K, V, Option[VT], java.sql.Timestamp)]): KStream[K, VR] =
    new KStream(StatefulOps.streamTableJoin(ds, table.changelog,
      leftJoin = false, tableUniqueKeys = table.uniqueKeys)(
      (v, t) => joiner(v, t.get)))

  def leftJoin[VT, VR](table: KTable[K, VT])(joiner: (V, Option[VT]) => VR)(
      implicit esr: Encoder[graft.streaming.SideRow[K, V, VT]],
      ekv: Encoder[KV[K, VR]], ek: Encoder[K],
      est: Encoder[Option[VT]],
      easof: Encoder[(K, V, Option[VT], java.sql.Timestamp)]): KStream[K, VR] =
    new KStream(StatefulOps.streamTableJoin(ds, table.changelog,
      leftJoin = true, tableUniqueKeys = table.uniqueKeys)(joiner))

  /** KStream ⋈ GlobalKTable (`IKStream.cs:836`): foreign-key lookup against a
    * broadcast dimension — the fact stream never shuffles.
    */
  def join[GK, GV, VR](global: GlobalKTable[GK, GV], keyMapper: (K, V) => GK)(
      joiner: (V, GV) => VR)(
      implicit egk: Encoder[(KV[K, V], GK)], eo: Encoder[(KV[K, V], Option[GV])],
      e: Encoder[KV[K, VR]]): KStream[K, VR] =
    doGlobalJoin(global, keyMapper, inner = true)((v, g) => joiner(v, g.get))

  def leftJoin[GK, GV, VR](global: GlobalKTable[GK, GV], keyMapper: (K, V) => GK)(
      joiner: (V, Option[GV]) => VR)(
      implicit egk: Encoder[(KV[K, V], GK)], eo: Encoder[(KV[K, V], Option[GV])],
      e: Encoder[KV[K, VR]]): KStream[K, VR] =
    doGlobalJoin(global, keyMapper, inner = false)(joiner)

  /** KStream ⋈ CONTINUOUSLY-REFRESHED GlobalKTable — the
    * `GlobalStreamThread` semantics (`core/Processors/
    * GlobalStreamThread.cs:13-220`: a dedicated thread keeps the global
    * replica updated while the topology runs). Spark's stream-static join
    * resolves the static side's listing ONCE, so the refresh must happen at
    * the microbatch boundary: this terminal composes through
    * `foreachBatch`, re-running `global.load()` — a fresh file listing —
    * and re-broadcasting the snapshot for EVERY microbatch, then handing
    * `downstream` the joined batch (batch-static plans compose freely
    * there; write, aggregate, or chain more DSL). A dimension update
    * published between batches is therefore visible to the next batch's
    * joins — the reference's `KGlobalTableTests` update scenario — with
    * refresh lag bounded by the trigger interval, vs. the reference's
    * per-record consumer lag.
    *
    * Returns the configured writer; call `.start()` (and checkpoint it like
    * any sink). For full changelog semantics driven by table updates, use
    * [[KTable.fkJoin]].
    */
  def joinGlobalRefreshing[GK, GV, VR](global: RefreshingGlobalKTable[GK, GV],
      keyMapper: (K, V) => GK, inner: Boolean = true)(
      joiner: (V, Option[GV]) => VR)(
      downstream: (Dataset[KV[K, VR]], Long) => Unit)(
      implicit egk: Encoder[(KV[K, V], GK)], eo: Encoder[(KV[K, V], Option[GV])],
      e: Encoder[KV[K, VR]])
      : org.apache.spark.sql.streaming.DataStreamWriter[KV[K, V]] =
    ds.writeStream.foreachBatch { (batch: Dataset[KV[K, V]], batchId: Long) =>
      val snapshot = new GlobalKTable(global.load())
      val joined = new KStream(batch)
        .doGlobalJoin(snapshot, keyMapper, inner)(joiner)
      downstream(joined.ds, batchId)
    }

  private def doGlobalJoin[GK, GV, VR](global: GlobalKTable[GK, GV],
      keyMapper: (K, V) => GK, inner: Boolean)(joiner: (V, Option[GV]) => VR)(
      implicit egk: Encoder[(KV[K, V], GK)], eo: Encoder[(KV[K, V], Option[GV])],
      e: Encoder[KV[K, VR]]): KStream[K, VR] = {
    val keyed = ds.map(r => (r, keyMapper(r.key, r.value)))
    val dim = broadcast(global.ds.toDF("gk", "gv"))
    val joined = keyed.toDF("rec", "fk")
      .join(dim, col("fk") === col("gk"), if (inner) "inner" else "left")
      .select(col("rec"), col("gv"))
      .as[(KV[K, V], Option[GV])]
    new KStream(joined.map { case (r, gv) => KV(r.key, joiner(r.value, gv), r.ts) })
  }

  /** Processor-API analog (the reference's internal `Transform`,
    * `core/Processors/TransformProcessor.cs:8-27`): arbitrary per-partition
    * record processing. Use as the last resort — lambdas are opaque to
    * Catalyst.
    */
  def transform[K2, V2](f: Iterator[KV[K, V]] => Iterator[KV[K2, V2]])(
      implicit e: Encoder[KV[K2, V2]]): KStream[K2, V2] =
    new KStream(ds.mapPartitions(f))

  /** ValueTransformer analog: `init` runs once per partition (expensive
    * setup — native contexts, models), the returned function once per record.
    */
  def transformValues[V2](init: () => (K, V) => V2)(
      implicit e: Encoder[KV[K, V2]]): KStream[K, V2] =
    new KStream(ds.mapPartitions { it =>
      val fn = init()
      it.map(r => KV(r.key, fn(r.key, r.value), r.ts))
    })

  /** Processor API v2 (`core/Processors/IProcessor.cs:8-29` + named stores):
    * arbitrary per-key stateful processing with timers (punctuator analog)
    * and TTL, via Spark 4 `transformWithState`. Streaming requires the
    * RocksDB state store provider
    * ([[graft.streaming.ProcessorApi.useRocksDb]]); event-time timers need a
    * watermark ([[withWatermarkMs]]).
    */
  def process[O](processor: org.apache.spark.sql.streaming.StatefulProcessor[K, KV[K, V], O],
      timeMode: org.apache.spark.sql.streaming.TimeMode =
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
      outputMode: org.apache.spark.sql.streaming.OutputMode =
        org.apache.spark.sql.streaming.OutputMode.Append())(
      implicit ek: Encoder[K], eo: Encoder[O]): Dataset[O] =
    graft.streaming.ProcessorApi.process(ds, processor, timeMode, outputMode)

  /** Event-time watermark (grace period analog, SURVEY §1.5). */
  def withWatermarkMs(delayMs: Long): KStream[K, V] =
    new KStream(ds.withWatermark("ts", s"$delayMs milliseconds"))

  /** `Foreach` terminal op (`IKStream.cs:256`) — runs distributed on the
    * executors (batch; for streams use foreachBatch on the writer).
    */
  def foreach(action: (K, V) => Unit): Unit =
    ds.foreach(r => action(r.key, r.value))

  /** `Print` debug sink (`IKStream.cs:247`). */
  def print(numRows: Int = 20): Unit = ds.show(numRows, truncate = false)

  /** `Print(Printed)` (`IKStream.cs:247`, `KStreamPrint.cs:21`): writes one
    * `[label]: <mapper(key, value)>` line per record to the configured
    * writer — the reference's exact line format. Collects to the DRIVER's
    * writer: this is a debug sink for small/test streams, not a data path.
    */
  def print(printed: Printed[K, V]): Unit = {
    require(printed != null, "print action must not be null")
    val label = Option(printed.label).getOrElse("KSTREAM-PRINT")
    def emit(rows: Array[KV[K, V]]): Unit = rows.foreach { kv =>
      printed.writer.write(s"[$label]: ${printed.mapper(kv.key, kv.value)}\n")
    }
    if (ds.isStreaming) {
      // drain what is currently available through a driver-side batch hook
      // (the writer lives on the driver; foreachBatch bodies run there)
      val q = ds.writeStream.outputMode("append")
        .foreachBatch((batch: Dataset[KV[K, V]], _: Long) => emit(batch.collect()))
        .start()
      q.processAllAvailable(); q.stop()
    } else emit(ds.collect())
    printed.writer.flush()
  }

  def toDF: DataFrame = ds.toDF("key", "value", "ts")

  /** `Topology.Describe()` rendering of this stream's dataflow — see
    * [[Topology.describe]].
    */
  def describe: String = Topology.describe(ds)
}

object KStream {
  // accessed from executor closures: object access is a per-JVM static
  // load, so the logger is never serialized with the task
  private[dsl] lazy val log = org.slf4j.LoggerFactory.getLogger(classOf[KStream[_, _]])
}

/** `Printed<K, V>` (`core/Stream/Printed.cs:9-50`): writer + optional label
  * + key-value formatter for [[KStream.print]]. Default mapper renders
  * `"$key $value"`, matching the reference's `WrappedKeyValueMapper`.
  */
final case class Printed[K, V](
    writer: java.io.Writer,
    label: String = null,
    mapper: (K, V) => String = (k: K, v: V) => s"$k $v") {
  def withLabel(l: String): Printed[K, V] = copy(label = l)
  def withKeyValueMapper(m: (K, V) => String): Printed[K, V] = copy(mapper = m)
}

object Printed {
  /** `Printed.ToWriter(writer)`. */
  def toWriter[K, V](w: java.io.Writer): Printed[K, V] = Printed(w)
  /** `Printed.ToOut()`. */
  def toOut[K, V]: Printed[K, V] =
    Printed(new java.io.PrintWriter(new java.io.OutputStreamWriter(System.out)))
}

/** Fully-replicated dimension table (`IGlobalKTable`, `core/Table/
  * IGlobalKTable.cs:37`): broadcast to every task instead of partitioned.
  *
  * Refresh semantics: the reference's global table is continuously updated
  * from its topic; a Spark stream-static join reads a SNAPSHOT — the static
  * side's file listing is resolved once, and an in-place overwrite
  * mid-query fails with FILE_NOT_EXIST rather than refreshing. This class
  * is that snapshot form (correct for immutable dims). For the reference's
  * continuous-update semantics use [[RefreshingGlobalKTable]] +
  * [[KStream.joinGlobalRefreshing]] (per-microbatch re-read/re-broadcast);
  * for table-driven updates with full changelog semantics, use
  * [[KTable.fkJoin]] instead.
  */
final class GlobalKTable[K, V](val ds: Dataset[(K, V)]) extends Serializable

/** The refreshable form of [[GlobalKTable]]: holds a LOADER instead of a
  * resolved Dataset, so every [[KStream.joinGlobalRefreshing]] microbatch
  * re-runs it (fresh file listing → updated rows visible) — the Spark
  * expression of the reference's `GlobalStreamThread`
  * (`core/Processors/GlobalStreamThread.cs:13-220`), which keeps the global
  * replica continuously updated while the topology runs. Build via
  * [[StreamsBuilder.globalTableRefreshing]].
  */
final class RefreshingGlobalKTable[K, V](val load: () => Dataset[(K, V)])
  extends Serializable
