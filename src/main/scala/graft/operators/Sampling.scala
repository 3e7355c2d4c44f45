package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Md5Prefix32

/** Deterministic sampling / split assignment for training-data curation —
  * beyond the reference's operator set (SURVEY COVERAGE "training-data
  * pipeline operators"); the reference has no sampling surface at all.
  *
  * All sampling here is HASH-based, never `rand()`:
  *  - reproducible across runs, retries, and engines (the DuckDB oracle
  *    computes the same md5-derived buckets bit-for-bit);
  *  - stable under repartitioning — a row's fate depends only on its id, so
  *    speculative re-execution or AQE re-planning cannot change the sample
  *    (Spark's `df.sample` is seed + partition-layout dependent);
  *  - embarrassingly parallel: a filter on a codegen'd expression, no
  *    shuffle, fully pushdown-transparent for other predicates.
  *
  * At 100 TB: sampling and split assignment are pure map-side narrow ops;
  * `perKeyCap` is the only shuffling member (one hash partition by key).
  */
object Sampling {

  /** Hash bucket in [0, 1000): first 8 hex chars of md5(id) mod 1000 via the
    * native [[Md5Prefix32]] expression (codegen'd, no UDF).
    */
  def bucket(id: Column): Column =
    pmod(Md5Prefix32.md5Prefix32(id.cast("string")), lit(1000L))

  /** Keep ~`perMille`/1000 of rows, deterministically by id. */
  def hashSample(df: DataFrame, id: Column, perMille: Int): DataFrame =
    df.where(bucket(id) < perMille)

  /** Stratified sampling: per-stratum keep rates (per mille), e.g.
    * down-sample dominant classes while keeping rare ones whole.
    */
  def stratified(df: DataFrame, strata: Column, id: Column,
      rates: Map[String, Int], defaultPerMille: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPerMille)) { case (acc, (k, r)) =>
      when(strata === k, lit(r)).otherwise(acc)
    }
    df.where(bucket(id) < rate)
  }

  /** Train/val/test split assignment: contiguous hash ranges sized by
    * `perMilleBounds` (cumulative upper bounds, last bucket catches the
    * rest). A row's split never changes as the corpus grows.
    */
  def assignSplit(df: DataFrame, id: Column,
      perMilleBounds: Seq[(String, Int)]): DataFrame = {
    val b = bucket(id)
    val expr = perMilleBounds.init.foldRight(
      lit(perMilleBounds.last._1): Column) { case ((name, bound), acc) =>
      when(b < bound, lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Cap rows per key at `n`, deterministically (ordered by hash-of-id then
    * id): bounds any key's contribution — e.g. at most N documents per
    * domain — regardless of skew. One shuffle on the key.
    */
  def perKeyCap(df: DataFrame, key: Column, id: Column, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(bucket(id), id)
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") <= n)
      .drop("__rn")
  }
}
