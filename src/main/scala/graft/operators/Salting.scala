package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns: when one group key dominates (a hot user, a
  * boilerplate document), a single reducer becomes the straggler. Salting
  * splits the hot key across `saltBuckets` partial groups, then merges —
  * two small shuffles instead of one skewed one.
  */
object Salting {

  /** Two-phase salted aggregation:
    * phase 1 groups on (keys…, salt) with `partialAggs`;
    * phase 2 groups on keys… with `mergeAggs` over the partials.
    * `mergeAggs` must be the algebraic merge of `partialAggs`
    * (sum↦sum, count↦sum, min↦min, …).
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      partialAggs: Seq[Column], mergeAggs: Seq[Column]): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    require(!df.columns.contains("__salt"),
      "input already has a __salt column; rename it before salting")
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
  }

  /** Salted equi-join for a skewed build side: the big (skewed) side gets a
    * salt in [0, saltBuckets); the small side is replicated once per salt
    * value; the join keys become (key, salt), so a hot key's rows spread
    * across `saltBuckets` reducers instead of one straggler. The result is
    * the plain inner join's exact multiset (each big row matches exactly its
    * own salt's replica). Use when AQE skew splitting can't see the skew —
    * streaming joins, or a skewed key hidden behind an expression. Cost:
    * small side shuffled ×saltBuckets.
    */
  def saltedJoin(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, saltBuckets: Int): DataFrame = {
    // 0 buckets would make the replication sequence EMPTY and silently drop
    // every row from the join — fail loudly instead
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "an input already has a __salt column; rename it before salting")
    val saltedBig = big.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets))
        .cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedBig.join(replicated,
        saltedBig(bigKey) === replicated(smallKey) &&
          saltedBig("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
