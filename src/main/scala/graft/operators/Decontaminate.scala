package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** Benchmark decontamination: flag corpus documents that share word n-grams
  * with an evaluation/benchmark set — the standard guard against test-set
  * leakage into training data.
  *
  * Scale shape: the benchmark side is tiny next to the corpus (eval sets are
  * thousands of docs vs billions), so its distinct n-grams BROADCAST and the
  * corpus is flagged with one scan + a broadcast semi join of its exploded
  * n-grams — the corpus never shuffles. No reference analog (beyond-parity
  * training-pipeline operator, like [[Dedup]]/[[Similarity]]).
  */
object Decontaminate {

  /** Distinct word n-grams of `textCol` over `df`. */
  def ngramSet(df: DataFrame, textCol: String, n: Int): DataFrame =
    df.select(explode(TextQueries.ngramsCol(col(textCol), n)).as("g")).distinct()

  /** Ids of corpus docs sharing at least one n-gram with `benchmark`. */
  def contaminatedIds(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 5): DataFrame =
    corpus
      .select(col(idCol), explode(TextQueries.ngramsCol(col(textCol), n)).as("g"))
      .join(broadcast(ngramSet(benchmark, textCol, n)), Seq("g"), "left_semi")
      .select(idCol).distinct()

  /** Corpus with benchmark-overlapping docs removed (the pipeline form).
    * The flagged-id set is corpus-derived, so it carries NO broadcast hint
    * (usually tiny → AQE broadcasts; pathological overlap → shuffle join
    * instead of an executor OOM).
    */
  def clean(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 5): DataFrame =
    corpus.join(contaminatedIds(corpus, benchmark, idCol, textCol, n),
      Seq(idCol), "left_anti")

  /** Per-document OVERLAP FRACTION vs the benchmark — the thresholded
    * contamination score (GPT-3 App. C / PaLM-style "dirty document"
    * accounting) rather than [[contaminatedIds]]'s any-overlap flag: for
    * each corpus doc, how many of its DISTINCT n-grams appear in the
    * benchmark gram set. Returns every corpus row's id with
    * `grams_total` and `grams_matched` (0/0 for docs shorter than n
    * tokens — the fraction is the caller's division, kept as an integer
    * PAIR so thresholds stay cross-multiplications).
    *
    * Same scale shape as the flag path: benchmark grams broadcast, the
    * corpus explodes its own grams and aggregates back on the id — one
    * corpus-side shuffle on the id, no benchmark-side shuffle.
    */
  def overlapStats(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 5): DataFrame = {
    val bg = ngramSet(benchmark, textCol, n).withColumn("__bg", lit(1))
    // explode_OUTER keeps gram-less docs as one null-gram row (which joins
    // nothing), so the 0/0 contract needs no second corpus scan or
    // join-back — the count aggregates ignore the nulls
    corpus
      .select(col(idCol),
        explode_outer(array_distinct(TextQueries.ngramsCol(col(textCol), n))).as("g"))
      .join(broadcast(bg), Seq("g"), "left")
      .groupBy(idCol)
      .agg(count(col("g")).as("grams_total"),
        count(col("__bg")).as("grams_matched"))
  }

  /** Keep-side filter on the overlap fraction: docs whose
    * `matched/total` exceeds `maxOverlapPpm`/1e6 are dropped (integer
    * cross-multiplication — no float threshold); gram-less docs are kept.
    */
  def cleanByOverlap(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, maxOverlapPpm: Long,
      n: Int = 5): DataFrame = {
    require(maxOverlapPpm >= 0 && maxOverlapPpm <= 1000000L,
      s"maxOverlapPpm must be a ppm in [0, 1e6], got $maxOverlapPpm")
    val dirty = overlapStats(corpus, benchmark, idCol, textCol, n)
      .filter(col("grams_matched") * 1000000L >
        lit(maxOverlapPpm) * col("grams_total"))
      .select(idCol)
    corpus.join(dirty, Seq(idCol), "left_anti")
  }

  /** Bloom-filter variant of [[contaminatedIds]] for benchmark sides too
    * large to broadcast as an exact gram set (decontaminating against a
    * whole held-out SPLIT rather than a small eval set): the benchmark's
    * grams aggregate into an `expectedGrams`-sized Bloom filter and the
    * corpus is flagged map-side — still no corpus shuffle.
    *
    * Build AND probe ride Spark's native runtime-filter expressions
    * (`BloomFilterAggregate` / `BloomFilterMightContain` over `xxhash64` of
    * the gram — the same pair Catalyst injects for runtime join filtering),
    * so the build is a two-phase distributed aggregate (partial filters
    * merge map-side; one O(bits) binary returns to the driver: ~1.2 GiB for
    * 10⁹ grams at 0.1% fpp vs tens of GiB of strings) and the probe stays
    * inside whole-stage codegen — no Scala UDF anywhere on the path. The
    * filter binary ships to executors once per stage via the task-binary
    * broadcast. At extreme sizes raise
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems`/`maxNumBits`,
    * which also cap explicitly-constructed aggregates.
    *
    * Guarantee direction: NO false negatives — every truly contaminated doc
    * is flagged (the xxhash64 pre-hash can only ADD false positives).
    * False positives over-drop clean docs at ≤ `fpp` per gram — the
    * conservative failure mode for decontamination. Use the exact
    * [[contaminatedIds]] when the gram set broadcasts comfortably.
    */
  /** `BloomFilterAggregate` silently `Math.min`-clamps its size to the
    * runtime-filter confs — a clamped filter's REAL false-positive rate can
    * be orders of magnitude above the requested `fpp`, which would quietly
    * over-drop clean documents. Enforce the contract loudly instead, with
    * the conf keys the caller must raise.
    */
  private def requireWithinBloomCaps(spark: org.apache.spark.sql.SparkSession,
      expectedGrams: Long, numBits: Long): Unit = {
    val maxItems = spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    require(expectedGrams <= maxItems && numBits <= maxBits,
      s"requested filter ($expectedGrams items / $numBits bits) exceeds the " +
        s"runtime-filter caps ($maxItems items / $maxBits bits) and would be " +
        "silently clamped, breaking the fpp contract; raise " +
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems / maxNumBits")
  }

  def contaminatedIdsBloom(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 5,
      expectedGrams: Long = 1000000L, fpp: Double = 0.001): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.ColumnBridge
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedGrams, fpp)
    requireWithinBloomCaps(corpus.sparkSession, expectedGrams, numBits)
    val buildAgg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(col("g"))),
      Literal(expectedGrams), Literal(numBits)).toAggregateExpression()
    val bfBytes = ngramSet(benchmark, textCol, n)
      .select(ColumnBridge.column(buildAgg).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val probe = ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(lit(bfBytes)),
      ColumnBridge.expression(xxhash64(col("g")))))
    corpus
      .select(col(idCol), explode(TextQueries.ngramsCol(col(textCol), n)).as("g"))
      .filter(probe)
      .select(idCol).distinct()
  }

  /** [[clean]] on the Bloom path: may over-drop at ≤ `fpp` per gram, never
    * under-drops.
    */
  def cleanBloom(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 5,
      expectedGrams: Long = 1000000L, fpp: Double = 0.001): DataFrame =
    corpus.join(
      contaminatedIdsBloom(corpus, benchmark, idCol, textCol, n, expectedGrams, fpp),
      Seq(idCol), "left_anti")

  /** INGEST-TIME decontamination: stamp a `contaminated` boolean per record
    * with a pure map-side Bloom probe — no explode, no distinct, no join —
    * so it runs on an UNBOUNDED STREAM (filter crawl data against eval sets
    * as it arrives) as well as in batch, with per-record cost O(grams per
    * doc). The benchmark side is read once (batch) when the filter is
    * built. Same guarantee direction as [[contaminatedIdsBloom]]: every
    * truly contaminated record is flagged; clean records misflag at
    * ≤ `fpp` per gram.
    */
  def flagBloom(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, n: Int = 5,
      expectedGrams: Long = 1000000L, fpp: Double = 0.001): DataFrame = {
    require(!corpus.columns.contains("contaminated"),
      "input already has a contaminated column; rename it first")
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.ColumnBridge
    // build rides the same native two-phase distributed aggregate as
    // [[contaminatedIdsBloom]] — xxhash64 of each gram into the filter —
    // so the benchmark side never funnels raw grams to the driver; one
    // O(bits) binary comes back (same no-false-negative direction: the
    // pre-hash can only ADD false positives)
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedGrams, fpp)
    requireWithinBloomCaps(corpus.sparkSession, expectedGrams, numBits)
    val buildAgg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(col("g"))),
      Literal(expectedGrams), Literal(numBits)).toAggregateExpression()
    val bfBytes = ngramSet(benchmark, textCol, n)
      .select(ColumnBridge.column(buildAgg).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    if (bfBytes == null) // empty benchmark: nothing can be contaminated
      return corpus.withColumn("contaminated", lit(false))
    // probe: native exists() over BloomFilterMightContain(xxhash64(g)) —
    // short-circuits on the first hit like the previous one-UDF-per-row
    // probe, but with no Scala UDF anywhere on the path (build and probe
    // both native now). Measured head-to-head on sf0.01 documents × 40
    // reps (graft.BloomProbeTimer, two runs): native min 0.418/0.419 s,
    // UDF early-exit min 0.431/0.432 s — the native form is ~3-5% faster
    // AND serde-free, so it stays. The filter literal ships to executors
    // once per stage via the task-binary broadcast.
    val mightContain = (g: Column) => ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ColumnBridge.expression(lit(bfBytes)),
        ColumnBridge.expression(xxhash64(g))))
    // null text -> null gram array -> false, matching the batch path
    corpus.withColumn("contaminated",
      coalesce(exists(TextQueries.ngramsCol(col(textCol), n), mightContain),
        lit(false)))
  }

  /** [[flagBloom]] keep-side filter — the streaming-safe [[cleanBloom]]. */
  def cleanBloomStream(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, n: Int = 5,
      expectedGrams: Long = 1000000L, fpp: Double = 0.001): DataFrame =
    flagBloom(corpus, benchmark, textCol, n, expectedGrams, fpp)
      .filter(!col("contaminated")).drop("contaminated")
}
