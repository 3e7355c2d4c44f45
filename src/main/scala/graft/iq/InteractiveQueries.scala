package graft.iq

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dsl.KTable

/** Interactive queries (SURVEY §3.3): the reference exposes read-only store
  * views via `KafkaStream.Store(StoreQueryParameters)` →
  * `CompositeReadOnlyKeyValueStore` (`core/KafkaStream.cs:474`,
  * `core/State/QueryableStoreTypes.cs:24-41`).
  *
  * Spark-native equivalent: each materialized KTable registers an update-mode
  * memory sink; reads collapse the update log to latest-per-key. The view
  * lags by at most one trigger (documented divergence, SURVEY §7.4#4).
  */
final class StoreRegistry(spark: SparkSession) {

  private var queries: Map[String, StreamingQuery] = Map.empty

  /** Materialize a KTable as a named queryable store. */
  def materialize[K, V](table: KTable[K, V], storeName: String): StreamingQuery = {
    val df = table.changelog.toDF("key", "value", "ts")
    val q =
      if (df.isStreaming)
        df.writeStream.format("memory").queryName(storeName)
          .outputMode("update").start()
      else {
        df.createOrReplaceTempView(storeName)
        null
      }
    if (q != null) queries += storeName -> q
    q
  }

  /** Latest-per-key view of a store's update log (the
    * `IReadOnlyKeyValueStore.All()` analog).
    */
  def all(storeName: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    spark.table(storeName)
      .withColumn("__rn", row_number().over(
        Window.partitionBy("key").orderBy(col("ts").desc)))
      .filter(col("__rn") === 1 && col("value").isNotNull)
      .drop("__rn")
  }

  /** Point lookup (`Get(key)`). */
  def get(storeName: String, key: Any): Option[Any] =
    all(storeName).filter(col("key") === lit(key))
      .select("value").collect().headOption.map(_.get(0))

  /** Ordered range scan (`Range(from, to)` — inclusive, like
    * `IReadOnlyKeyValueStore.Range`).
    */
  def range(storeName: String, from: Any, to: Any): DataFrame =
    all(storeName).filter(col("key") >= lit(from) && col("key") <= lit(to))
      .orderBy("key")

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

  def stop(): Unit = queries.values.foreach(q => if (q.isActive) q.stop())
}
