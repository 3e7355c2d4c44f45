package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared LSH candidate-pair generation: the one self-join shape every
  * bucketed near-dup path (MinHash bands over text, random-hyperplane bands
  * over embeddings) reduces to, with the hot-bucket guard built in so no
  * caller can accidentally ship the unguarded quadratic join.
  */
object Lsh {

  /** Distinct candidate id pairs (`ida` < `idb`) from bucket-key rows: a pair
    * is a candidate iff both ids share one row's `keyCols` value.
    *
    * `hotBucketThreshold` (0 = unbounded) guards against the hot-bucket
    * quadratic blowup (boilerplate content collapsing millions of docs into
    * one bucket yields C(n,2) pairs). Buckets at or under the threshold
    * generate all pairs; a LARGER bucket switches to the star pattern — every
    * member pairs with the bucket's lowest id only — contributing n−1 pairs
    * instead of C(n,2) while every member keeps candidacy through the shared
    * representative (a truncating cap would orphan the overflow docs:
    * identical docs share ALL bucket keys, so per-bucket truncation removes
    * the same docs everywhere). The recall cost is only cross-pairs among
    * non-representative members of a hot bucket — irrelevant for
    * dedup-by-connected-components, where the star already links the bucket.
    * Shape: ONE shuffle on `keyCols` collects each bucket's ids
    * (`collect_list`), then both branches are per-group codegen'd
    * higher-order expressions — no self-join, no sizing window. A cold
    * bucket explodes all C(n,2) sorted pairs (n ≤ threshold bounds the
    * per-row array); a hot bucket emits its n−1 star pairs linearly. A
    * mega-hot bucket concentrates in one task either way (any group-by-key
    * formulation does) — the star keeps that task's OUTPUT linear, which is
    * what makes it survivable.
    */
  def candidatePairs(exploded: DataFrame, idCol: String, keyCols: Seq[String],
      hotBucketThreshold: Int): DataFrame = {
    val grouped = exploded.groupBy(keyCols.map(col): _*)
      .agg(collect_list(col(idCol)).as("__ids"))
    val sorted = array_sort(array_distinct(col("__ids")))
    val n = size(sorted)
    // all i < j pairs of the sorted bucket (ida < idb by construction)
    val coldPairs = flatten(transform(sorted, (x, i) =>
      transform(slice(sorted, i + lit(2), n - i - lit(1)),
        y => struct(x.as("ida"), y.as("idb")))))
    // star: lowest id pairs with every other member
    val hotPairs = transform(slice(sorted, lit(2), n - lit(1)),
      y => struct(element_at(sorted, 1).as("ida"), y.as("idb")))
    val pairsCol =
      if (hotBucketThreshold <= 0) coldPairs
      else when(n > hotBucketThreshold, hotPairs).otherwise(coldPairs)
    grouped.select(explode(pairsCol).as("p"))
      .select(col("p.ida").as("ida"), col("p.idb").as("idb"))
      .distinct()
  }
}
