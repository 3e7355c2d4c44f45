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
    * The sizing window aggregates on the same `keyCols` the self-join
    * shuffles on, so the guard adds no extra shuffle of its own.
    */
  def candidatePairs(exploded: DataFrame, idCol: String, keyCols: Seq[String],
      hotBucketThreshold: Int): DataFrame = {
    def allPairs(df: DataFrame): DataFrame =
      df.as("x").join(df.as("y"),
          keyCols.map(c => col(s"x.$c") === col(s"y.$c")).reduce(_ && _) &&
            col(s"x.$idCol") < col(s"y.$idCol"))
        .select(col(s"x.$idCol").as("ida"), col(s"y.$idCol").as("idb"))
    val pairs =
      if (hotBucketThreshold <= 0) allPairs(exploded)
      else {
        val w = Window.partitionBy(keyCols.map(col): _*)
        val sized = exploded
          .withColumn("__n", count(lit(1)).over(w))
          .withColumn("__mn", min(col(idCol)).over(w))
        val cold = allPairs(sized.filter(col("__n") <= hotBucketThreshold))
        val hot = sized
          .filter(col("__n") > hotBucketThreshold && col(idCol) =!= col("__mn"))
          .select(col("__mn").as("ida"), col(idCol).as("idb"))
        cold.unionByName(hot)
      }
    pairs.distinct()
  }
}
