package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  * All queries take an `sfDir` like `/root/testdata/sf0.01`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    graft.functions.Md5Prefix32.register(spark) // idempotent; used by hash paths
    graft.functions.FloatVecDot.register(spark) // SQL access: fvec_dot(a, b)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** events.ts has shipped in different testdata generations as either a
    * NANOSECOND parquet timestamp (Spark 4 refuses TimestampType there; the
    * legacy conf reads it as a long we truncate to micros) or a MICROSECOND
    * `isAdjustedToUTC=false` timestamp (read natively as TIMESTAMP_NTZ).
    * Normalize either to session-TZ TimestampType — the session TZ is UTC
    * everywhere in this project, so the NTZ cast is value-preserving and
    * DuckDB (which reads the same file as a naive timestamp) agrees.
    */
  def withEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalArgumentException(
        s"events.ts: unexpected parquet type $other — expected INT64 nanos " +
          "(legacy long), TIMESTAMP_NTZ micros, or TIMESTAMP")
    }
  }

  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    withEventTs(load(spark, d, "events"))
  }
  def lineitem(spark: SparkSession, d: String): DataFrame  = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame    = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame  = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame    = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame    = load(spark, d, "region")
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")

  /** Rebalance a cheap-to-scan input across all cores before CPU-heavy
    * per-row work (tokenization, shingling, dot products). The testdata
    * tables are single-row-group parquet — an unsplittable one-task scan —
    * so without this every downstream map runs serially. No-op when the scan
    * already has enough partitions (a real cluster's many splits).
    */
  def balanced(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // partitioning is per-microbatch; .rdd would throw
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def documentsBalanced(spark: SparkSession, d: String): DataFrame =
    balanced(documents(spark, d))
  def embeddingsBalanced(spark: SparkSession, d: String): DataFrame =
    balanced(embeddings(spark, d))
}
