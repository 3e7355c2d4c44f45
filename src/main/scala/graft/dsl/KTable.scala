package graft.dsl

import org.apache.spark.sql.{Dataset, Encoder}

import graft.streaming.{KeyedChange, StatefulOps}

/** Changelog table: the reference's `IKTable<K,V>` (`core/Table/IKTable.cs:31`)
  * as a `Dataset[Upsert[K, V]]` — a stream of latest-value-per-key updates
  * where `value = None` is a tombstone. In streaming this is an update-mode
  * changelog; in batch it is the final materialized view.
  *
  * Equal-timestamp ties: streaming resolves them last-arrival-wins (the
  * reference's offset order). Batch breaks them by a source-order sequence
  * captured before the shuffle (see `StatefulOps.latestPerKey`) —
  * deterministic, and equal to arrival order when source partition order
  * reflects it; for a multi-file unsorted source, "arrival" is file order.
  */
final class KTable[K, V](val changelog: Dataset[Upsert[K, V]],
    val uniqueKeys: Boolean = false) extends Serializable {

  /** Marks this (batch) changelog as already having at most one row per key —
    * e.g. a dimension snapshot read from parquet. Downstream batch operators
    * ([[view]], [[fkJoin]]) then skip the stateful latest-per-key fold, so
    * the plan stays a plain scan → join with predicate pushdown, column
    * pruning, and broadcast eligibility intact (the fold's shuffle +
    * object-codec hop would hide the scan from Catalyst). No effect on
    * streaming semantics — state folds still run there.
    */
  def withUniqueKeys: KTable[K, V] = new KTable(changelog, uniqueKeys = true)

  /** `KTable.Filter` (`IKTable.cs:52`; `KTableFilterProcessor.cs:21-53`):
    * a row whose value fails the predicate becomes a tombstone downstream.
    */
  def filter(p: (K, V) => Boolean): KTable[K, V] =
    new KTable(changelog.map(u =>
      u.copy(value = u.value.filter(v => p(u.key, v))))(changelog.encoder), uniqueKeys)

  def filterNot(p: (K, V) => Boolean): KTable[K, V] =
    filter((k, v) => !p(k, v))

  /** `KTable.MapValues` (`IKTable.cs:190`). */
  def mapValues[V2](f: V => V2)(
      implicit e: Encoder[Upsert[K, V2]]): KTable[K, V2] =
    new KTable(changelog.map(u => Upsert(u.key, u.value.map(f), u.ts)), uniqueKeys)

  /** `KTable.ToStream` (`IKTable.cs:126`): every update becomes an event;
    * tombstones dropped (use `toChangeStream` to observe them).
    */
  def toStream(implicit e: Encoder[KV[K, V]]): KStream[K, V] =
    new KStream(changelog.flatMap(u => u.value.map(v => KV(u.key, v, u.ts))))

  /** `KTable.ToStream(keyMapper)` (`IKTable.cs:146`): re-key each update as
    * it becomes an event.
    */
  def toStream[K2](f: (K, V) => K2)(implicit e: Encoder[KV[K2, V]]): KStream[K2, V] =
    new KStream(changelog.flatMap(u => u.value.map(v => KV(f(u.key, v), v, u.ts))))

  def toChangeStream(implicit e: Encoder[Upsert[K, V]]): Dataset[Upsert[K, V]] =
    changelog

  /** `Topology.Describe()` rendering of this table's changelog dataflow —
    * see [[Topology.describe]].
    */
  def describe: String = Topology.describe(changelog)

  /** `KTable.GroupBy` (`IKTable.cs:376`): re-key the changelog, emitting
    * subtract/add halves so the downstream aggregation can retract old values.
    */
  def groupBy[K2, V2](selector: (K, V) => (K2, V2))(
      implicit ekc: Encoder[KeyedChange[K2, V2]], ek: Encoder[K],
      ev: Encoder[Option[V]]): KGroupedTable[K2, V2] =
    new KGroupedTable(StatefulOps.changelogChanges(changelog)(selector))

  /** KTable ⋈ KTable (`IKTable.cs:500`). */
  def join[V2, VR](other: KTable[K, V2])(joiner: (V, V2) => VR)(
      implicit esr: Encoder[graft.streaming.SideRow[K, V, V2]],
      eu: Encoder[Upsert[K, VR]], ek: Encoder[K],
      est: Encoder[(Option[V], Option[V2])]): KTable[K, VR] =
    new KTable(StatefulOps.tableTableJoin(changelog, other.changelog, "inner")(
      (l, r) => joiner(l.get, r.get)))

  /** KTable ⟕ KTable (`IKTable.cs:657`). */
  def leftJoin[V2, VR](other: KTable[K, V2])(joiner: (V, Option[V2]) => VR)(
      implicit esr: Encoder[graft.streaming.SideRow[K, V, V2]],
      eu: Encoder[Upsert[K, VR]], ek: Encoder[K],
      est: Encoder[(Option[V], Option[V2])]): KTable[K, VR] =
    new KTable(StatefulOps.tableTableJoin(changelog, other.changelog, "left")(
      (l, r) => joiner(l.get, r)))

  /** KTable ⟗ KTable (`IKTable.cs:826`): result removed when both sides null
    * (`KTableKTableOuterJoinProcessor.cs:14-50`).
    */
  def outerJoin[V2, VR](other: KTable[K, V2])(
      joiner: (Option[V], Option[V2]) => VR)(
      implicit esr: Encoder[graft.streaming.SideRow[K, V, V2]],
      eu: Encoder[Upsert[K, VR]], ek: Encoder[K],
      est: Encoder[(Option[V], Option[V2])]): KTable[K, VR] =
    new KTable(StatefulOps.tableTableJoin(changelog, other.changelog, "outer")(joiner))

  /** Foreign-key KTable ⋈ KTable join (superset — on the reference's declared
    * roadmap but absent, SURVEY §2.8; modeled on Kafka Streams KIP-213):
    * each left row joins the `other` row whose key is `fk(leftValue)`; the
    * result stays keyed by the LEFT key, and an update to a referenced right
    * row re-emits all left rows pointing at it.
    */
  def fkJoin[KO, VO, VR](other: KTable[KO, VO])(fk: V => KO)(
      joiner: (V, VO) => VR)(
      implicit efr: Encoder[graft.streaming.FkRow[K, V, KO, VO]],
      eu: Encoder[Upsert[K, VR]], eko: Encoder[KO], ek: Encoder[K],
      esub: Encoder[(Option[V], Long, Long)],
      est: Encoder[(Map[K, V], Option[VO], Long)],
      efl: Encoder[graft.streaming.FkLeft[K, V, KO]],
      epair: Encoder[(graft.streaming.FkLeft[K, V, KO], Upsert[KO, VO])]): KTable[K, VR] =
    new KTable(StatefulOps.fkTableJoin(changelog, other.changelog,
      leftOuter = false, leftUnique = uniqueKeys, rightUnique = other.uniqueKeys)(
      fk)((v, vo) => joiner(v, vo.get)), uniqueKeys)

  /** Foreign-key left join: unmatched left rows emit `joiner(v, None)`. */
  def fkLeftJoin[KO, VO, VR](other: KTable[KO, VO])(fk: V => KO)(
      joiner: (V, Option[VO]) => VR)(
      implicit efr: Encoder[graft.streaming.FkRow[K, V, KO, VO]],
      eu: Encoder[Upsert[K, VR]], eko: Encoder[KO], ek: Encoder[K],
      esub: Encoder[(Option[V], Long, Long)],
      est: Encoder[(Map[K, V], Option[VO], Long)],
      efl: Encoder[graft.streaming.FkLeft[K, V, KO]],
      epair: Encoder[(graft.streaming.FkLeft[K, V, KO], Upsert[KO, VO])]): KTable[K, VR] =
    new KTable(StatefulOps.fkTableJoin(changelog, other.changelog,
      leftOuter = true, leftUnique = uniqueKeys, rightUnique = other.uniqueKeys)(
      fk)(joiner), uniqueKeys)

  /** Materialized view: latest row per key with tombstones applied — the
    * interactive-query surface (`KafkaStream.Store`, SURVEY §3.3).
    */
  def view(implicit eu: Encoder[Upsert[K, V]], ek: Encoder[K],
      ekv: Encoder[(K, V)]): Dataset[(K, V)] =
    if (!changelog.isStreaming && uniqueKeys)
      changelog.flatMap(u => u.value.map(v => (u.key, v))) // snapshot: no fold
    else
      StatefulOps.latestFromChangelog(changelog)
        .flatMap(u => u.value.map(v => (u.key, v)))
}

/** Grouped changelog (`IKGroupedTable`, `core/Table/IKGroupedTable.cs:16`):
  * aggregations must handle subtract (retraction) halves.
  */
final class KGroupedTable[K, V](val changes: Dataset[KeyedChange[K, V]])
    extends Serializable {

  /** `KGroupedTable.Count` (`IKGroupedTable.cs:25`): +1 on add, −1 on
    * subtract — expressed as a built-in signed-sum aggregation so Catalyst
    * runs it (map-side partials; chains after the append-mode change
    * emission in a single streaming query).
    */
  def count(implicit eu: Encoder[Upsert[K, Long]], ek: Encoder[K],
      et: Encoder[(K, Long, java.sql.Timestamp)]): KTable[K, Long] = {
    import org.apache.spark.sql.functions._
    val df = changes.toDF("key", "change", "ts")
      .groupBy(col("key"))
      .agg(sum(when(col("change.newValue").isNotNull, 1L).otherwise(-1L)).as("cnt"),
        max(col("ts")).as("mts"))
    new KTable(df.as[(K, Long, java.sql.Timestamp)]
      .map { case (k, c, ts) => Upsert(k, Some(c), ts) })
  }

  /** `KGroupedTable.Aggregate` (`IKGroupedTable.cs:220`): init + adder +
    * subtractor; subtractor returning null deletes the key.
    */
  def aggregate[VR](init: () => VR)(adder: (K, V, VR) => VR)(
      subtractor: (K, V, VR) => VR)(
      implicit eu: Encoder[Upsert[K, VR]], ek: Encoder[K],
      evr: Encoder[(Option[VR], Long)]): KTable[K, VR] =
    new KTable(StatefulOps.aggregateChanges(changes)(init, adder, subtractor))

  /** `KGroupedTable.Reduce` (`IKGroupedTable.cs:93`). */
  def reduce(adder: (V, V) => V, subtractor: (V, V) => V)(
      implicit eu: Encoder[Upsert[K, V]], ek: Encoder[K],
      ev: Encoder[(Option[V], Long)]): KTable[K, V] =
    new KTable(StatefulOps.aggregateChanges(changes)(
      () => null.asInstanceOf[V],
      (_, v, agg) => if (agg == null) v else adder(agg, v),
      (_, v, agg) => if (agg == null) null.asInstanceOf[V] else subtractor(agg, v)))
}
