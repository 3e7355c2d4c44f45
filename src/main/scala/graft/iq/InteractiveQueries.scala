package graft.iq

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dsl.KTable

/** Interactive queries (SURVEY §3.3): the reference exposes read-only store
  * views via `KafkaStream.Store(StoreQueryParameters)` →
  * `CompositeReadOnlyKeyValueStore` (`core/KafkaStream.cs:474`,
  * `core/State/QueryableStoreTypes.cs:24-41`).
  *
  * Spark-native equivalent: each materialized KTable's changelog is folded
  * into a latest-per-key store via `foreachBatch` — per trigger the work is
  * O(changed keys) and the store stays O(live keys) however long the query
  * runs (an append-log memory sink would grow without bound). Tombstones
  * (null values) delete; a stale update (older ts than the stored row)
  * loses, matching the changelog's max-timestamp-wins contract. The view
  * lags by at most one trigger (documented divergence, SURVEY §7.4#4).
  */
final class StoreRegistry(spark: SparkSession) {

  // concurrent like `stores`: materialize calls may race from user threads
  private val queries = new java.util.concurrent.ConcurrentHashMap[String, StreamingQuery]()
  // storeName -> (schema of (key, value, ts), key -> latest row)
  private val stores = new java.util.concurrent.ConcurrentHashMap[
    String, (org.apache.spark.sql.types.StructType,
             java.util.concurrent.ConcurrentHashMap[Any, org.apache.spark.sql.Row])]()
  // storeName -> checkpoint dir of a checkpointed (driver-memory-free) store
  private val checkpoints = new java.util.concurrent.ConcurrentHashMap[String, String]()
  // storeName -> (checkpoint dir, state variable name) of a Processor-API
  // (transformWithState) store
  private val processorStores =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  /** Materialize a KTable as a named queryable store. `outputMode` must suit
    * the changelog's stateful chain: "update" for plain latest-per-key
    * chains, "append" when every stateful op runs append-mode (e.g.
    * `table.groupBy(...).aggregate` — Spark ties the query mode to the
    * fMGWS modes). The foreachBatch fold is mode-agnostic either way.
    */
  def materialize[K, V](table: KTable[K, V], storeName: String,
      outputMode: String = "update"): StreamingQuery = {
    val df = table.changelog.toDF("key", "value", "ts")
    val q =
      if (df.isStreaming) {
        val state = (df.schema, new java.util.concurrent.ConcurrentHashMap[Any, org.apache.spark.sql.Row]())
        stores.put(storeName, state)
        df.writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            // driver-side upsert of just this trigger's changes, in ts order
            val rows = batch.collect().sortBy(_.getAs[java.sql.Timestamp]("ts").getTime)
            rows.foreach { r =>
              val key = r.get(0)
              val fresh = Option(state._2.get(key))
                .forall(cur => r.getAs[java.sql.Timestamp]("ts").getTime >=
                  cur.getAs[java.sql.Timestamp]("ts").getTime)
              if (fresh) {
                if (r.isNullAt(1)) state._2.remove(key) else state._2.put(key, r)
              }
            }
          }
          .outputMode(outputMode).start()
      } else {
        df.createOrReplaceTempView(storeName)
        null
      }
    if (q != null) queries.put(storeName, q)
    q
  }

  /** Materialize a table-backed store with NO driver-side map: the table's
    * own stateful operator already keeps exactly one (value, ts) state row
    * per live key inside Spark's state store, so checkpointing that query
    * IS the store — executor-partitioned, spillable, O(live keys) on the
    * CLUSTER instead of the driver. Reads go through the batch
    * `statestore` source over the checkpoint (the
    * `CompositeReadOnlyKeyValueStore.cs` analog's second leg, SURVEY §3.3),
    * which scans only the store files — so a store far larger than driver
    * memory stays queryable; `all`/`get`/`range` on this registry route
    * there automatically. The view lags by at most one committed trigger.
    *
    * Trade against [[materialize]]: `get` is a (small) Spark job over the
    * store files rather than an O(1) map probe — use the driver-map mode
    * for low-latency point lookups on bounded-cardinality stores, this mode
    * when key cardinality is unbounded.
    */
  def materializeCheckpointed[K, V](table: KTable[K, V], storeName: String,
      checkpointLocation: String, outputMode: String = "update"): StreamingQuery = {
    val df = table.changelog.toDF("key", "value", "ts")
    require(df.isStreaming, "checkpointed stores require a streaming table")
    val q = df.writeStream.format("noop")
      .option("checkpointLocation", checkpointLocation)
      .outputMode(outputMode).start()
    checkpoints.put(storeName, checkpointLocation)
    queries.put(storeName, q)
    q
  }

  /** Latest (key, value, ts) view straight off a checkpointed store's state
    * files — no driver map, no reprocessing of the changelog. Three state
    * layouts are recognized by schema:
    *
    *  - table stores (latest-per-key fMGWS): state rows arrive as
    *    `value.groupState.{key, value, ts}`;
    *  - windowed-aggregation stores (native streaming agg over
    *    `window(...)`): key = (window, key), value = (buffer…, max-ts) —
    *    normalized to the `Windowed[K]`-shaped key struct `fetch`/`fetchAll`
    *    expect. A single aggregation buffer surfaces as a scalar `value`;
    *    multiple buffers surface as a struct of them (field names = the
    *    aggregate function names Spark stamps on the state schema);
    *  - session-window stores (native `session_window` agg): key =
    *    (grouping key, sessionStartTime), value = (session_window, key,
    *    buffer…, max-ts) — normalized to the same `Windowed[K]` shape with
    *    the session's merged [start, end).
    *
    * The max-timestamp buffer is the LAST state field — [[graft.streaming
    * .StatefulOps]] appends its internal max-ts aggregate after the user
    * buffers, and Spark preserves buffer order in the state schema — so it
    * is selected POSITIONALLY (by struct ordinal, not by its `max` name): a
    * user aggregation that is itself `max(...)` produces a second field
    * named `max` and a by-name lookup would mis-assign the two. A layout
    * whose last field is not named `max` fails loudly. Retention caveat:
    * this view shows LIVE state, so windows the watermark has already
    * evicted are absent (the driver-map mode's fold retains them) — query
    * within the retention horizon.
    */
  private def checkpointView(storeName: String): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val raw = spark.read.format("statestore")
      .option("path", checkpoints.get(storeName)).load()
    val valueType = raw.schema("value").dataType.asInstanceOf[StructType]
    val keyType = raw.schema("key").dataType.asInstanceOf[StructType]
    // ordinal access, immune to duplicate field names in the state schema:
    // cast renames struct fields POSITIONALLY (a GetStructField ordinal
    // would be re-resolved by name on the Column bridge and mis-bind), so
    // a same-shape struct with unique names makes by-name access safe
    val renamedType = StructType(valueType.fields.zipWithIndex.map {
      case (f, i) => StructField(s"_b$i", f.dataType, f.nullable) })
    def valueField(i: Int): Column =
      col("value").cast(renamedType).getField(s"_b$i")
    def tsField: Column = {
      require(valueType.fields.last.name == "max",
        s"state layout for $storeName does not end in the max-ts buffer: $valueType")
      valueField(valueType.fields.length - 1)
    }
    // one agg buffer -> scalar value; several -> struct of buffers
    def aggValue(aggOrdinals: Seq[Int]) = {
      require(aggOrdinals.nonEmpty,
        s"no aggregation buffer in state layout for $storeName: $valueType")
      if (aggOrdinals.length == 1) valueField(aggOrdinals.head)
      else struct(aggOrdinals.map(i =>
        valueField(i).as(valueType.fields(i).name)): _*)
    }
    if (valueType.fieldNames.contains("groupState"))
      raw.select(col("value.groupState.key").as("key"),
        col("value.groupState.value").as("value"),
        col("value.groupState.ts").as("ts"))
    else if (valueType.fieldNames.contains("session_window")) {
      val groupCols = keyType.fieldNames.filterNot(_ == "sessionStartTime")
      require(groupCols.length == 1,
        s"session checkpoint view expects one grouping column, got key=$keyType")
      // value = (session_window, groupKey, user buffers..., max-ts)
      val aggOrdinals = valueType.fields.indices.init.filter { i =>
        val n = valueType.fields(i).name
        n != "session_window" && !groupCols.contains(n)
      }
      raw.select(
        struct(col(s"value.${groupCols.head}").as("key"),
          col("value.session_window.start").as("start"),
          col("value.session_window.end").as("end")).as("key"),
        aggValue(aggOrdinals).as("value"),
        tsField.as("ts"))
    } else {
      require(keyType.fieldNames.contains("window"),
        s"unsupported state layout for $storeName: key=$keyType value=$valueType")
      // value = (user buffers..., max-ts)
      raw.select(
        struct(col("key.key").as("key"),
          col("key.window.start").as("start"),
          col("key.window.end").as("end")).as("key"),
        aggValue(valueType.fields.indices.init).as("value"),
        tsField.as("ts"))
    }
  }

  /** Register a Processor-API ([[graft.streaming.ProcessorApi]] /
    * `transformWithState`) store for interactive reads straight off the
    * query's checkpoint — the third store mode, for state the OTHER two
    * can't see: named `ValueState`/`ListState`/`MapState` variables inside
    * a custom [[org.apache.spark.sql.streaming.StatefulProcessor]]. No
    * driver map, no changelog fold: reads scan the state files through the
    * batch `statestore` source with `stateVarName`, so the store scales
    * with the cluster and lags by at most one committed trigger.
    *
    * The view normalizes Spark's layouts to this registry's (key, value)
    * contract: value state → one row per key; list state → one row per
    * element (flattened); map state → (key, map_key, value) rows. Spark's
    * single-field encoder structs (`{value: X}`) are unwrapped to scalars
    * on every leg. Use [[all]]/[[range]]/[[get]] as with any other store
    * (for map state, [[get]] returns the FIRST entry of the key — read
    * [[all]] filtered on `key`/`map_key` for the full per-key map).
    */
  def registerProcessorStore(storeName: String, checkpointLocation: String,
      stateVarName: String): Unit =
    processorStores.put(storeName, (checkpointLocation, stateVarName))

  private def processorStateView(storeName: String): DataFrame = {
    val (ckpt, varName) = processorStores.get(storeName)
    val raw = spark.read.format("statestore")
      .option("path", ckpt).option("stateVarName", varName)
      .option("flattenCollectionTypes", "true").load()
    def unwrap(name: String, as: String): Column =
      raw.schema(name).dataType match {
        // single-field encoder struct {value: X} -> the scalar
        case st: org.apache.spark.sql.types.StructType if st.fields.length == 1 =>
          col(name).getField(st.fields.head.name).as(as)
        case _ => col(name).as(as)
      }
    val fields = raw.schema.fieldNames
    if (fields.contains("user_map_key"))
      raw.select(unwrap("key", "key"), unwrap("user_map_key", "map_key"),
        unwrap("user_map_value", "value"))
    else if (fields.contains("list_element"))
      raw.select(unwrap("key", "key"), unwrap("list_element", "value"))
    else
      raw.select(unwrap("key", "key"), unwrap("value", "value"))
  }

  /** Latest-per-key view of a store (the `IReadOnlyKeyValueStore.All()`
    * analog). Streaming stores read the compacted map; batch snapshots fold
    * their changelog view.
    */
  def all(storeName: String): DataFrame = {
    val state = stores.get(storeName)
    if (state != null) {
      val (schema, m) = state
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row](m.values())
      spark.createDataFrame(rows, schema)
    } else if (checkpoints.containsKey(storeName)) {
      checkpointView(storeName)
    } else if (processorStores.containsKey(storeName)) {
      processorStateView(storeName)
    } else {
      import org.apache.spark.sql.expressions.Window
      spark.table(storeName)
        .withColumn("__rn", row_number().over(
          Window.partitionBy("key").orderBy(col("ts").desc)))
        .filter(col("__rn") === 1 && col("value").isNotNull)
        .drop("__rn")
    }
  }

  /** Live key count of a streaming store without a Spark job (O(1)). */
  private[iq] def storeSize(storeName: String): Option[Int] =
    Option(stores.get(storeName)).map(_._2.size())

  /** Point lookup (`Get(key)`). Streaming stores answer from the driver map
    * in O(1) — no Spark job, which is the point of an *interactive* query
    * (`key` must be the changelog's key type; tombstoned keys are absent).
    * Batch snapshots fall back to the folded view.
    */
  def get(storeName: String, key: Any): Option[Any] = {
    val state = stores.get(storeName)
    if (state != null) Option(state._2.get(key)).map(_.get(1))
    else all(storeName).filter(col("key") === lit(key))
      .select("value").collect().headOption.map(_.get(0))
  }

  /** Ordered range scan (`Range(from, to)` — inclusive, like
    * `IReadOnlyKeyValueStore.Range`).
    */
  def range(storeName: String, from: Any, to: Any): DataFrame =
    all(storeName).filter(col("key") >= lit(from) && col("key") <= lit(to))
      .orderBy("key")

  /** Descending-order scans (`ReverseRange` / `ReverseAll`,
    * `core/State/IReadOnlyKeyValueStore.cs:36-46`).
    */
  def reverseRange(storeName: String, from: Any, to: Any): DataFrame =
    all(storeName).filter(col("key") >= lit(from) && col("key") <= lit(to))
      .orderBy(col("key").desc)

  def reverseAll(storeName: String): DataFrame =
    all(storeName).orderBy(col("key").desc)

  /** `ApproximateNumEntries()`. */
  def approximateNumEntries(storeName: String): Long = all(storeName).count()

  /** Windowed-store `Fetch(key, from, to)` (`IReadOnlyWindowStore.cs:23-99`):
    * for stores materialized from windowed KTables (key is a
    * `Windowed[K]` struct with `key`/`start`/`end` fields), return the
    * window entries for `key` whose start lies in [fromMs, toMs].
    */
  def fetch(storeName: String, key: Any, fromMs: Long, toMs: Long): DataFrame =
    all(storeName)
      .filter(col("key.key") === lit(key) &&
        unix_millis(col("key.start").cast("timestamp")) >= fromMs &&
        unix_millis(col("key.start").cast("timestamp")) <= toMs)
      .orderBy(col("key.start"))

  /** Windowed-store `FetchAll(from, to)` (`IReadOnlyWindowStore.cs:23-99`):
    * every key's window entries whose start lies in [fromMs, toMs], ordered
    * by window start then key.
    */
  def fetchAll(storeName: String, fromMs: Long, toMs: Long): DataFrame =
    all(storeName)
      .filter(unix_millis(col("key.start").cast("timestamp")) >= fromMs &&
        unix_millis(col("key.start").cast("timestamp")) <= toMs)
      .orderBy(col("key.start"), col("key.key"))

  def stop(): Unit = queries.values.forEach(q => if (q.isActive) q.stop())
}
