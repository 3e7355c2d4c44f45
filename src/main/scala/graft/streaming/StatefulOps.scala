package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.dsl.{Change, KV, Upsert}

/** Discriminated union row for two-input stateful operators (changelog joins):
  * `isLeft` selects the side; the side's `Option` value is `None` for a
  * tombstone.
  */
final case class SideRow[K, V1, V2](
    key: K, ts: Timestamp, isLeft: Boolean, v1: Option[V1], v2: Option[V2])

/** A re-keyed changelog `Change` split into its subtract/add halves, the
  * reference's repartition-map output
  * (`core/Processors/KTableMapProcessor.cs`): an update produces
  * (oldKey, Change(old, None)) then (newKey, Change(None, new)).
  */
final case class KeyedChange[K, V](key: K, change: Change[V], ts: Timestamp)

/** Foreign-key join rows, grouped by the referenced (right-side) key `KO`.
  * `kind`: 0 = silent unsubscribe (fk moved — the new group's result
  * overwrites, so no tombstone), 1 = subscribe/update, 2 = right-side upsert
  * (`rightVal = None` is a tombstone), 3 = unsubscribe + propagate tombstone
  * (left row deleted). Mirrors KIP-213's SubscriptionWrapper instruction
  * types (PROPAGATE vs NO_PROPAGATE deletes). `seq` is a per-left-key
  * monotonic instruction number: same-timestamp instruction sequences
  * (delete + reinsert, fk A→B→A) MUST replay in emission order, and a
  * (ts, kind) sort would invert them — the same hazard the
  * [[StatefulOps.aggregateChanges]] comment documents.
  */
final case class FkRow[K, V, KO, VO](
    ko: KO, ts: Timestamp, kind: Int, seq: Long,
    leftKey: Option[K], leftVal: Option[V], rightVal: Option[VO])

/** Batch-path row for the FK join: left row with its extracted foreign key. */
final case class FkLeft[K, V, KO](key: K, value: V, fkey: KO, ts: Timestamp)

/** The three custom stateful patterns Spark lacks as built-ins (SURVEY §4.2),
  * all implemented once with `flatMapGroupsWithState`, which runs in BOTH
  * batch (single group invocation, empty initial state) and streaming
  * (update-mode, state across microbatches) — so the same DSL executes on
  * static parquet (the batch façade / DuckDB oracle) and on streams.
  *
  * Within a batch, records of a group are folded in event-time order —
  * the Spark analog of the reference's timestamp-synchronized dequeue
  * (`core/Processors/Internal/PartitionGrouper.cs:67-90`).
  *
  * Scale note: every pattern shuffles once on the grouping key and keeps
  * per-key state O(1) (latest value / aggregate), so state size is bounded by
  * key cardinality, not input volume.
  */
object StatefulOps {

  /** Table materialization: latest value per key (upsert-by-key), the
    * reference's `KTableSourceProcessor` (`KTableSourceProcessor.cs:34-61`).
    * Latest = max event time (ties: arrival order).
    */
  def latestPerKey[K, V](ds: Dataset[KV[K, V]])(
      implicit eu: Encoder[Upsert[K, V]], ekv: Encoder[KV[K, V]],
      ek: Encoder[K]): Dataset[Upsert[K, V]] = {
    // Batch: the fold is a codegen'd row_number window (one shuffle + sort,
    // Tungsten), not object state — the 100 TB shape. Ties on ts break by a
    // source-order sequence captured BEFORE the shuffle
    // (monotonically_increasing_id: partition-ordinal << 33 | row-in-
    // partition), so last-in-source-order wins — deterministic, and it
    // matches the streaming path's last-arrival-wins whenever source
    // partition order reflects arrival (single partition, sorted files).
    if (!ds.isStreaming) {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      return ds.filter((kv: KV[K, V]) => kv.key != null)
        .toDF("key", "value", "ts")
        .withColumn("__seq", monotonically_increasing_id())
        .withColumn("__rn", row_number().over(
          Window.partitionBy("key").orderBy(col("ts").desc, col("__seq").desc)))
        .filter(col("__rn") === 1).drop("__rn", "__seq")
        .as[KV[K, V]]
        .map(kv => Upsert(kv.key, Some(kv.value), kv.ts))
    }
    // null-key records are skipped at the table source, as the reference does
    // (`KTableSourceProcessor.cs` logs and drops them)
    ds.filter((kv: KV[K, V]) => kv.key != null)
      .groupByKey(_.key)
      .flatMapGroupsWithState[KV[K, V], Upsert[K, V]](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[KV[K, V]], state: GroupState[KV[K, V]]) =>
          // LAST max wins within the batch (last-write-wins on ts ties)
          val newest = it.reduceLeft((a, b) => if (b.ts.getTime >= a.ts.getTime) b else a)
          val best = state.getOption match {
            case Some(prev) if prev.ts.getTime > newest.ts.getTime => prev
            case _ => newest
          }
          state.update(best)
          Iterator.single(Upsert(key, Some(best.value), best.ts))
      }
  }

  /** Changelog upsert stream → latest view (handles tombstones): per key keep
    * the newest upsert; a tombstone deletes.
    */
  def latestFromChangelog[K, V](ds: Dataset[Upsert[K, V]])(
      implicit eu: Encoder[Upsert[K, V]], ek: Encoder[K]): Dataset[Upsert[K, V]] = {
    // Batch: codegen'd row_number fold with the same source-order tie-break
    // as latestPerKey above. The latest row per key survives even if it is a
    // tombstone — downstream views drop the Nones.
    if (!ds.isStreaming) {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      return ds.toDF("key", "value", "ts")
        .withColumn("__seq", monotonically_increasing_id())
        .withColumn("__rn", row_number().over(
          Window.partitionBy("key").orderBy(col("ts").desc, col("__seq").desc)))
        .filter(col("__rn") === 1).drop("__rn", "__seq")
        .as[Upsert[K, V]]
    }
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Upsert[K, V], Upsert[K, V]](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[Upsert[K, V]], state: GroupState[Upsert[K, V]]) =>
          val newest = it.reduceLeft((a, b) => if (b.ts.getTime >= a.ts.getTime) b else a)
          val best = state.getOption match {
            case Some(prev) if prev.ts.getTime > newest.ts.getTime => prev
            case _ => newest
          }
          state.update(best)
          Iterator.single(best)
      }
  }

  /** Re-keying a changelog for re-aggregation (`KTable.GroupBy`,
    * `IKTable.cs:376-464`): tracks the previous value per original key and
    * emits subtract/add `KeyedChange` halves under the new key.
    */
  def changelogChanges[K, V, K2, V2](ds: Dataset[Upsert[K, V]])(
      selector: (K, V) => (K2, V2))(
      implicit ekc: Encoder[KeyedChange[K2, V2]], ek: Encoder[K],
      ev: Encoder[Option[V]]): Dataset[KeyedChange[K2, V2]] = {
    // Append mode: emitted subtract/add halves are final events, never
    // retracted — and it lets a downstream built-in aggregation chain in the
    // same streaming query (Spark forbids chained update-mode fMGWS).
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Option[V], KeyedChange[K2, V2]](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[Upsert[K, V]], state: GroupState[Option[V]]) =>
          var prev: Option[V] = state.getOption.flatten
          val out = Seq.newBuilder[KeyedChange[K2, V2]]
          it.toSeq.sortBy(_.ts.getTime).foreach { up =>
            prev.foreach { o =>
              val (k2, v2) = selector(key, o)
              out += KeyedChange(k2, Change(Some(v2), None), up.ts)
            }
            up.value.foreach { n =>
              val (k2, v2) = selector(key, n)
              out += KeyedChange(k2, Change(None, Some(v2)), up.ts)
            }
            prev = up.value
          }
          // a tombstoned original key needs no previous-value row anymore —
          // evict, so the re-key store stays bounded by LIVE keys
          if (prev.isEmpty) state.remove() else state.update(prev)
          out.result().iterator
      }
  }

  /** Add/subtract aggregation over `Change` rows (`KGroupedTable.Aggregate`,
    * `KTableAggregateProcessor.cs:24-74`): update = subtract(old) then
    * add(new); a subtractor returning null deletes the key
    * (`docs/_sources/statefull-processors.md.txt:98-103`).
    */
  def aggregateChanges[K, V, VR](ds: Dataset[KeyedChange[K, V]])(
      init: () => VR, adder: (K, V, VR) => VR, subtractor: (K, V, VR) => VR)(
      implicit eu: Encoder[Upsert[K, VR]], ek: Encoder[K],
      evr: Encoder[(Option[VR], Long)]): Dataset[Upsert[K, VR]] = {
    // Append mode: each emitted Upsert is a CHANGELOG EVENT (final as an
    // event — downstream folds latest-per-key), so append semantics are
    // correct AND the op may legally chain after the append-mode
    // changelogChanges in one streaming query (Spark rejects any chain that
    // mixes update-mode fMGWS; see the fkTableJoin note below).
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[(Option[VR], Long), Upsert[K, VR]](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[KeyedChange[K, V]], state: GroupState[(Option[VR], Long)]) =>
          var (agg, maxTs) = state.getOption.getOrElse((Option.empty[VR], 0L))
          // stable ts sort preserves per-update emission order (sub, then
          // add) at equal timestamps — a sub-before-add secondary key would
          // mis-order successive same-ts updates of one key
          val ordered = it.toSeq.sortBy(_.ts.getTime)
          ordered.foreach { c =>
            maxTs = math.max(maxTs, c.ts.getTime)
            c.change.oldValue.foreach { o =>
              val next = subtractor(key, o, agg.getOrElse(init()))
              agg = Option(next)
            }
            c.change.newValue.foreach { n =>
              val next = adder(key, n, agg.getOrElse(init()))
              agg = Option(next)
            }
          }
          // result ts carries the running max — a late batch must not emit
          // a regressed ts that downstream latest-views would ignore.
          // A null aggregate DELETES the key's state row (the reference's
          // store semantics: a null aggregation result is a store delete,
          // KTableAggregateProcessor.cs:63-66) — without it a churning
          // keyspace accretes one state row per key EVER seen and the
          // store grows without bound (measured: Round16StatefulScaleTimer,
          // SCALE.md). The running-max ts guard protects LIVE keys; after
          // a delete, a revived key is a fresh generation and emits its
          // own ts, exactly as the reference's store does. CONSEQUENCE
          // (spec-locked, StreamingChangelogSpec "revival after
          // tombstone"): a revival whose event-ts is OLDER than the
          // tombstone's is visible to log-ordered consumers of this
          // changelog but DROPPED by ts-ordered latest views
          // (latestFromChangelog keeps the newer tombstone) — the
          // reference's own out-of-order-drop rule for table
          // materialization. Keeping the dead key's ts would reverse that
          // at the cost of unbounded state; the reference makes the same
          // trade.
          if (agg.isEmpty) state.remove() else state.update((agg, maxTs))
          Iterator.single(Upsert(key, agg, new Timestamp(maxTs)))
      }
  }

  /** KTable ⋈ KTable changelog join (`KTableKTableJoinProcessor.cs:20-56` and
    * left/outer variants): dual value state, every side change re-emits the
    * joined row; result timestamp = max of the inputs
    * (`KTableKTableJoinProcessor.cs:36`). Emits a tombstone when the join
    * result disappears.
    */
  def tableTableJoin[K, V1, V2, VR](
      left: Dataset[Upsert[K, V1]], right: Dataset[Upsert[K, V2]],
      joinType: String)(joiner: (Option[V1], Option[V2]) => VR)(
      implicit esr: Encoder[SideRow[K, V1, V2]], eu: Encoder[Upsert[K, VR]],
      ek: Encoder[K], est: Encoder[(Option[V1], Option[V2])]): Dataset[Upsert[K, VR]] = {
    require(left.isStreaming == right.isStreaming,
      "table-table join requires both sides streaming or both batch; " +
        "read the static side with readStream (rate-limited file source) to mix")
    val l = left.map(u => SideRow[K, V1, V2](u.key, u.ts, isLeft = true, u.value, None))
    val r = right.map(u => SideRow[K, V1, V2](u.key, u.ts, isLeft = false, None, u.value))
    // Append mode, like aggregateChanges above: each emitted Upsert is a final
    // changelog EVENT (downstream folds latest-per-key), so append semantics
    // are correct AND the joined table may legally feed further stateful ops
    // (stream-table join, groupBy) in the same streaming query — Spark rejects
    // any chain that mixes update-mode fMGWS.
    l.union(r).groupByKey(_.key)
      .flatMapGroupsWithState[(Option[V1], Option[V2]), Upsert[K, VR]](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[SideRow[K, V1, V2]],
            state: GroupState[(Option[V1], Option[V2])]) =>
          var (lv, rv) = state.getOption.getOrElse((Option.empty[V1], Option.empty[V2]))
          val out = Seq.newBuilder[Upsert[K, VR]]
          it.toSeq.sortBy(_.ts.getTime).foreach { row =>
            if (row.isLeft) lv = row.v1 else rv = row.v2
            val emit: Option[VR] = joinType match {
              case "inner" => for (a <- lv; b <- rv) yield joiner(Some(a), Some(b))
              case "left"  => lv.map(a => joiner(Some(a), rv))
              case "outer" =>
                if (lv.isDefined || rv.isDefined) Some(joiner(lv, rv)) else None
            }
            out += Upsert(key, emit, row.ts)
          }
          // both sides tombstoned ⇒ the key is DEAD: delete its dual-state
          // row (the reference deletes store rows on null, so its join
          // stores are bounded by live keys — ours must be too; measured:
          // Round16StatefulScaleTimer, SCALE.md). A revived key starts a
          // fresh dual state, same as a first-seen key.
          if (lv.isEmpty && rv.isEmpty) state.remove()
          else state.update((lv, rv))
          out.result().iterator
      }
  }

  /** Foreign-key KTable ⋈ KTable join — ABSENT in the reference (declared
    * roadmap gap, SURVEY §2.8 / `1_2_0.md`); implemented as a superset after
    * Kafka Streams' KIP-213 design. Result is keyed by the LEFT key; a right
    * (referenced) table update re-emits every subscribed left row.
    *
    * Batch fast path: latest view of both sides, plain equi-join on the
    * extracted key — Catalyst picks broadcast/shuffled hash join and AQE
    * re-plans at runtime, so a small dimension side never shuffles the fact
    * side. Streaming path: the KIP-213 "subscription store" — an append-mode
    * subscription pass re-keys left changes by foreign key (distinguishing
    * fk-move from left-delete, like KIP-213's instruction types), then one
    * update-mode stateful op per `KO` holds (subscribers: Map[K, V], right
    * value). Because the result is keyed by the LEFT key, an fk-move needs
    * no tombstone — the new group's emission overwrites — which avoids
    * KIP-213's out-of-order-resolution machinery entirely.
    *
    * Scale note (streaming): state per referenced key is O(#subscribers), so
    * a hot dimension row (every fact referencing one key) concentrates its
    * subscriber map on one partition — same skew as any FK join; the batch
    * path instead inherits AQE skew-join splitting.
    */
  def fkTableJoin[K, V, KO, VO, VR](
      left: Dataset[Upsert[K, V]], right: Dataset[Upsert[KO, VO]],
      leftOuter: Boolean, leftUnique: Boolean = false,
      rightUnique: Boolean = false)(fk: V => KO)(joiner: (V, Option[VO]) => VR)(
      implicit efr: Encoder[FkRow[K, V, KO, VO]], eu: Encoder[Upsert[K, VR]],
      eko: Encoder[KO], ek: Encoder[K],
      esub: Encoder[(Option[V], Long, Long)],
      est: Encoder[(Map[K, V], Option[VO], Long)],
      efl: Encoder[FkLeft[K, V, KO]],
      epair: Encoder[(FkLeft[K, V, KO], Upsert[KO, VO])]): Dataset[Upsert[K, VR]] = {
    require(left.isStreaming == right.isStreaming,
      "fk join requires both sides streaming or both batch")
    if (!left.isStreaming) {
      // A side marked unique (dimension snapshot) skips the stateful fold:
      // the plan stays scan → join, keeping pushdown/pruning/broadcast.
      val lsrc = if (leftUnique) left else latestFromChangelog(left)(left.encoder, ek)
      val lv = lsrc.flatMap(u => u.value.map(v => FkLeft(u.key, v, fk(v), u.ts)))
      val rv = (if (rightUnique) right else latestFromChangelog(right)(right.encoder, eko))
        .filter(_.value.isDefined)
      lv.joinWith(rv, lv("fkey") === rv("key"),
          if (leftOuter) "left_outer" else "inner")
        .map { case (l, r) =>
          val rOpt = Option(r).flatMap(_.value)
          val ts = math.max(l.ts.getTime, Option(r).map(_.ts.getTime).getOrElse(0L))
          Upsert(l.key, Some(joiner(l.value, rOpt)), new Timestamp(ts))
        }
    } else {
      // Subscription pass (append mode, so the downstream join op can chain
      // after it): tracks (previous left value, last event time, instruction
      // counter) per key and emits move/delete instructions under the OLD fk
      // plus subscribe under the new. Cross-batch out-of-order upserts older
      // than the applied state are IGNORED (the latest-by-ts contract the
      // other materialization ops guard with prev.ts > newest.ts); a deleted
      // key's state is removed, so the store is bounded by LIVE left keys.
      val ls = left.groupByKey(_.key)
        .flatMapGroupsWithState[(Option[V], Long, Long), FkRow[K, V, KO, VO]](
          OutputMode.Append(), GroupStateTimeout.NoTimeout) {
          (k: K, it: Iterator[Upsert[K, V]],
              state: GroupState[(Option[V], Long, Long)]) =>
            var (prev, lastTs, seq) = state.getOption.getOrElse(
              (Option.empty[V], Long.MinValue, 0L))
            val out = Seq.newBuilder[FkRow[K, V, KO, VO]]
            it.toSeq.sortBy(_.ts.getTime).foreach { up =>
              if (up.ts.getTime < lastTs) () // stale out-of-order upsert
              else {
                (prev, up.value) match {
                  case (Some(o), Some(n)) =>
                    if (fk(o) != fk(n)) { // silent: new group's result overwrites
                      out += FkRow[K, V, KO, VO](fk(o), up.ts, 0, seq, Some(k), None, None)
                      seq += 1
                    }
                    out += FkRow[K, V, KO, VO](fk(n), up.ts, 1, seq, Some(k), Some(n), None)
                    seq += 1
                  case (None, Some(n)) =>
                    out += FkRow[K, V, KO, VO](fk(n), up.ts, 1, seq, Some(k), Some(n), None)
                    seq += 1
                  case (Some(o), None) => // left delete: propagate a tombstone
                    out += FkRow[K, V, KO, VO](fk(o), up.ts, 3, seq, Some(k), None, None)
                    seq += 1
                  case (None, None) => ()
                }
                prev = up.value
                lastTs = up.ts.getTime
              }
            }
            if (prev.isEmpty) state.remove() else state.update((prev, lastTs, seq))
            out.result().iterator
        }
      // Right rows get seq = MinValue: at equal timestamps the right update
      // applies BEFORE left instructions, so a subscribe at the same ts sees
      // the new right value. Left instructions replay in (ts, seq) order.
      val rs = right.map(u =>
        FkRow[K, V, KO, VO](u.key, u.ts, 2, Long.MinValue, None, None, u.value))
      // Append mode on BOTH stateful ops: Spark only chains multiple fMGWS
      // when all are append-mode under an append-mode sink. Emitted upserts
      // are final changelog EVENTS (never retracted in place), so append is
      // the honest mode; consumers fold them latest-per-key as usual.
      ls.union(rs).groupByKey(_.ko)
        .flatMapGroupsWithState[(Map[K, V], Option[VO], Long), Upsert[K, VR]](
          OutputMode.Append(), GroupStateTimeout.NoTimeout) {
          (_: KO, it: Iterator[FkRow[K, V, KO, VO]],
              state: GroupState[(Map[K, V], Option[VO], Long)]) =>
            var (subscribers, rv, rvTs) = state.getOption.getOrElse(
              (Map.empty[K, V], Option.empty[VO], Long.MinValue))
            def result(v: V): Option[VR] =
              if (leftOuter) Some(joiner(v, rv))
              else rv.map(b => joiner(v, Some(b)))
            val out = Seq.newBuilder[Upsert[K, VR]]
            it.toSeq.sortBy(r => (r.ts.getTime, r.seq)).foreach { row =>
              row.kind match {
                case 0 => row.leftKey.foreach(subscribers -= _)
                case 1 => for (k <- row.leftKey; v <- row.leftVal) {
                  subscribers += (k -> v)
                  out += Upsert(k, result(v), row.ts)
                }
                case 2 =>
                  if (row.ts.getTime >= rvTs) { // ignore stale right updates
                    rv = row.rightVal
                    rvTs = row.ts.getTime
                    subscribers.foreach { case (k, v) =>
                      out += Upsert(k, result(v), row.ts)
                    }
                  }
                case _ => row.leftKey.foreach { k =>
                  subscribers -= k
                  out += Upsert(k, None, row.ts)
                }
              }
            }
            if (subscribers.isEmpty && rv.isEmpty) state.remove()
            else state.update((subscribers, rv, rvTs))
            out.result().iterator
        }
    }
  }

  /** KStream ⋈ KTable enrichment join (`KStreamKTableJoinProcessor.cs:28-44`):
    * table side updates state silently; stream records look up the current
    * table value (event-time-ordered within the batch — the analog of the
    * reference's timestamp synchronization). No output on table update.
    */
  def streamTableJoin[K, V, VT, VR](
      stream: Dataset[KV[K, V]], table: Dataset[Upsert[K, VT]],
      leftJoin: Boolean, tableUniqueKeys: Boolean = false)(
      joiner: (V, Option[VT]) => VR)(
      implicit esr: Encoder[SideRow[K, V, VT]], ekv: Encoder[KV[K, VR]],
      ek: Encoder[K], est: Encoder[Option[VT]],
      easof: Encoder[(K, V, Option[VT], Timestamp)]): Dataset[KV[K, VR]] = {
    if (!stream.isStreaming && !table.isStreaming) {
      // a unique-keyed snapshot (withUniqueKeys) has one live row per key, so
      // the as-of lookup IS an equi join — broadcast-eligible, no union +
      // window shuffle, no row_number fold
      if (tableUniqueKeys)
        return snapshotEquiJoin(stream, table, leftJoin, unique = true)(joiner)
      return streamTableJoinBatch(stream, table, leftJoin)(joiner)
    }
    if (stream.isStreaming && !table.isStreaming)
      return streamStaticJoin(stream, table, leftJoin)(joiner)
    require(stream.isStreaming,
      "batch stream side cannot join a streaming table; swap the sides or stream both")
    val s = stream.map(r => SideRow[K, V, VT](r.key, r.ts, isLeft = true, Some(r.value), None))
    val t = table.map(u => SideRow[K, V, VT](u.key, u.ts, isLeft = false, None, u.value))
    s.union(t).groupByKey(_.key)
      .flatMapGroupsWithState[Option[VT], KV[K, VR]](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[SideRow[K, V, VT]], state: GroupState[Option[VT]]) =>
          var tv: Option[VT] = state.getOption.flatten
          val out = Seq.newBuilder[KV[K, VR]]
          // table rows sort before stream rows at equal timestamps
          it.toSeq.sortBy(row => (row.ts.getTime, if (row.isLeft) 1 else 0)).foreach { row =>
            if (!row.isLeft) tv = row.v2
            else row.v1.foreach { v =>
              if (tv.isDefined || leftJoin) out += KV(key, joiner(v, tv), row.ts)
            }
          }
          state.update(tv)
          out.result().iterator
      }
  }

  /** Streaming stream × STATIC table: the table's content is fixed for the
    * query's lifetime, so the as-of lookup collapses to an equi-join against
    * the table's final latest-per-key view (Spark's stream-static join;
    * broadcast when small). This is the GlobalKTable-style enrichment shape.
    */
  private def streamStaticJoin[K, V, VT, VR](
      stream: Dataset[KV[K, V]], table: Dataset[Upsert[K, VT]],
      leftJoin: Boolean)(joiner: (V, Option[VT]) => VR)(
      implicit ekv: Encoder[KV[K, VR]],
      easof: Encoder[(K, V, Option[VT], Timestamp)]): Dataset[KV[K, VR]] =
    snapshotEquiJoin(stream, table, leftJoin, unique = false)(joiner)

  /** Equi join against a table snapshot. `unique = true` (a `withUniqueKeys`
    * changelog) skips the latest-per-key `row_number` fold entirely — the
    * plan is scan → join, pruned and broadcast-eligible.
    */
  private def snapshotEquiJoin[K, V, VT, VR](
      stream: Dataset[KV[K, V]], table: Dataset[Upsert[K, VT]],
      leftJoin: Boolean, unique: Boolean)(joiner: (V, Option[VT]) => VR)(
      implicit ekv: Encoder[KV[K, VR]],
      easof: Encoder[(K, V, Option[VT], Timestamp)]): Dataset[KV[K, VR]] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val tDF = table.toDF("key", "value", "ts")
    val latest = (if (unique) tDF
      else tDF.withColumn("__rn", row_number().over(
          Window.partitionBy("key").orderBy(col("ts").desc)))
        .filter(col("__rn") === 1))
      .filter(col("value").isNotNull)
      .select(col("key").as("__tk"), col("value").as("tval"))
    val joined = stream.toDF("key", "value", "ts")
      .join(latest, col("key") === col("__tk"), if (leftJoin) "left" else "inner")
      .select(col("key"), col("value").as("sval"), col("tval"), col("ts"))
      .as[(K, V, Option[VT], Timestamp)]
    joined.map { case (k, v, tOpt, ts) => KV(k, joiner(v, tOpt), ts) }
  }

  /** Batch fast path for the stream-table join: it is an AS-OF JOIN — each
    * stream record pairs with the latest table upsert whose ts ≤ the record's
    * ts. Implemented as union + window `last(…, ignoreNulls)` over
    * (key, ts): ONE shuffle, whole-stage codegen, no per-group Scala state —
    * the plan shape that survives 100 TB. Tombstones stay visible because the
    * carried value is a non-null struct whose inner field may be null.
    */
  private def streamTableJoinBatch[K, V, VT, VR](
      stream: Dataset[KV[K, V]], table: Dataset[Upsert[K, VT]],
      leftJoin: Boolean)(joiner: (V, Option[VT]) => VR)(
      implicit ekv: Encoder[KV[K, VR]],
      easof: Encoder[(K, V, Option[VT], Timestamp)]): Dataset[KV[K, VR]] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val sDF = stream.toDF("key", "value", "ts")
    val tDF = table.toDF("key", "value", "ts")
    val tType = tDF.schema("value").dataType
    val su = sDF.select(col("key"), col("ts"), lit(1).as("side"),
      col("value").as("sval"), lit(null).cast(tType).as("tval"))
    val tu = tDF.select(col("key"), col("ts"), lit(0).as("side"),
      lit(null).cast(sDF.schema("value").dataType).as("sval"),
      col("value").as("tval"))
    // table rows sort before stream rows at equal ts (same as streaming path)
    val w = Window.partitionBy("key").orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = su.unionByName(tu)
      .withColumn("tstate",
        last(when(col("side") === 0, struct(col("tval"))), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("key"), col("sval"), col("tstate.tval").as("tval"), col("ts"))
    // inner-join drop happens columnar (inside codegen, before the single
    // object hop) — the opaque Scala joiner then runs exactly once per
    // emitted row, with no null-sentinel re-filter in object space
    val kept = if (leftJoin) joined else joined.filter(col("tval").isNotNull)
    kept.as[(K, V, Option[VT], Timestamp)]
      .map { case (k, v, tOpt, ts) => KV(k, joiner(v, tOpt), ts) }
  }
}
