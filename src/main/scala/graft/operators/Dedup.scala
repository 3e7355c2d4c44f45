package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** Corpus deduplication operators for training-data pipelines, as reusable
  * DataFrame transforms. Scale shapes:
  *  - exact/fingerprint: one shuffle on a 128-bit hash; state = one row per
  *    distinct content.
  *  - MinHash-LSH: signatures are a narrow projection (doc_id + 32 ints);
  *    candidate generation shuffles on band-hash (bounded buckets); the
  *    verify join touches only candidate pairs. No stage is all-pairs.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per identical content.
    *
    * Single-pass shape: `groupBy(md5).agg(min_by(row, id))` — ONE shuffle of
    * the corpus, with the map-side partial aggregate collapsing duplicate
    * content before it ships, no join-back, no sort, and no keep-set to
    * broadcast (at 100 TB that set is corpus-sized — a join-back would be a
    * second full shuffle).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    keepMinBy(df, idCol, md5(col(textCol)))

  /** Fingerprint dedup: normalization-invariant (case/punctuation/word-order)
    * content identity = md5 of sorted distinct tokens.
    */
  def fingerprint(c: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(TextQueries.tokensCol(c)))))

  def byFingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    keepMinBy(df, idCol, fingerprint(col(textCol)))

  /** Shared single-shuffle survivor selection: lowest `idCol` row per
    * `key` value, original columns and order preserved.
    */
  private def keepMinBy(df: DataFrame, idCol: String, key: Column): DataFrame = {
    val cols = df.columns
    df.groupBy(key.as("__k"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("__row"))
      .select(cols.map(c => col(s"__row.$c").as(c)): _*)
  }

  /** MinHash signature columns m0..m{n-1} for a text column (3-word
    * shingles, md5-derived hashes — deterministic, no fitted model).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import TextQueries.{P, hash32, perms, ngramsCol}
    graft.functions.Md5Prefix32.register(df.sparkSession)
    graft.functions.MinHashSigAgg.register(df.sparkSession)
    // docs with <3 tokens drop out: ngramsCol is empty there, explode drops it
    val shingled = df
      .select(col(idCol), explode(ngramsCol(col(textCol), 3)).as("__s"))
      .select(col(idCol), (hash32(col("__s")) % P).as("__h"))
    // one TypedImperativeAggregate computes all minima in a single buffer
    shingled.groupBy(col(idCol))
      .agg(graft.functions.MinHashSigAgg.minhashSig(col("__h")).as("__sig"))
      .select(col(idCol) +: perms.indices.map(j => col("__sig")(j).as(s"m$j")): _*)
  }

  /** LSH candidate pairs from signatures: bands of `rowsPerBand` minima;
    * pairs sharing any band hash. `bands × rowsPerBand` must equal the
    * signature width.
    *
    * `hotBucketThreshold` (0 = unbounded) guards against the hot-bucket
    * quadratic blowup (boilerplate text collapsing millions of docs into one
    * bucket yields C(n,2) pairs). Buckets at or under the threshold generate
    * all pairs as usual; a LARGER bucket switches to the star pattern — every
    * member pairs with the bucket's lowest id only — so it contributes n−1
    * pairs instead of C(n,2) while every member keeps candidacy through the
    * shared representative (a capped/truncated bucket would orphan the
    * overflow docs entirely: identical docs land in the same buckets in ALL
    * bands, so per-band truncation removes the same docs everywhere). The
    * recall cost is only cross-pairs among non-representative members of a
    * hot bucket — irrelevant for dedup-by-connected-components, where the
    * star already links the whole bucket. The sizing window aggregates on
    * the same (band, hash) key the self-join shuffles on.
    */
  def lshCandidates(sigs: DataFrame, idCol: String, bands: Int = 8,
      rowsPerBand: Int = 4, hotBucketThreshold: Int = 0): DataFrame = {
    val bandHashes = array((0 until bands).map { b =>
      md5(concat_ws(",", (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}")): _*))
    }: _*)
    val exploded = sigs.select(col(idCol), posexplode(bandHashes).as(Seq("band", "bh")))
    def allPairs(df: DataFrame): DataFrame =
      df.as("x").join(df.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
            col(s"x.$idCol") < col(s"y.$idCol"))
        .select(col(s"x.$idCol").as("ida"), col(s"y.$idCol").as("idb"))
    val pairs =
      if (hotBucketThreshold <= 0) allPairs(exploded)
      else {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")
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

  /** Near-duplicate pairs: LSH candidates whose estimated Jaccard (agreeing
    * permutation fraction) passes `minAgreeFraction`.
    */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
      minAgreeFraction: Double = 0.5, hotBucketThreshold: Int = 0): DataFrame = {
    import TextQueries.NumPerm
    val sigs = minhashSignatures(df, idCol, textCol).persist()
    val cand = lshCandidates(sigs, idCol, hotBucketThreshold = hotBucketThreshold)
    val agree = (0 until NumPerm)
      .map(j => when(col(s"a.m$j") === col(s"b.m$j"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(sigs.as("a"), col(s"a.$idCol") === col("ida"))
      .join(sigs.as("b"), col(s"b.$idCol") === col("idb"))
      .select(col("ida"), col("idb"), agree.as("agreeing"))
      .filter(col("agreeing") >= math.ceil(minAgreeFraction * NumPerm).toInt)
  }

  /** SimHash (16-bit) column pipeline: near-dups differ in few bits. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import TextQueries.{hash32, tokensCol}
    graft.functions.Md5Prefix32.register(df.sparkSession)
    val toks = df.select(col(idCol),
        explode(tokensCol(col(textCol))).as("__tok"))
      .select(col(idCol), hash32(col("__tok")).as("__th"))
    val sums = (0 until 16).map(b =>
      sum(when(shiftright(col("__th"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$b"))
    val sig = (0 until 16).map(b => when(col(s"s$b") > 0, 1 << b).otherwise(0)).reduce(_ + _)
    toks.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
      .select(col(idCol), sig.as("simhash"))
  }
}
