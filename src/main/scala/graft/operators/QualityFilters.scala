package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Published heuristic document filters for training-data curation, in
  * pure integer/string column arithmetic (no floats — every ratio rule is
  * a cross-multiplication, so the DuckDB oracle reproduces each flag
  * bit-for-bit):
  *
  *  - [[gopherFlags]]: the Gopher quality rules (Rae et al. 2021,
  *    "Scaling Language Models", Appendix A1.1) — word-count bounds, mean
  *    word length, symbol-to-word ratios (hash and ellipsis each), bullet/
  *    ellipsis line fractions, alphabetic-word fraction, stop-word
  *    presence.
  *  - [[c4CleanLines]]: the C4 line/page cleaning (Raffel et al. 2020,
  *    "Exploring the Limits of Transfer Learning", §2.2) — keep lines
  *    that end in terminal punctuation and have ≥ 5 words, drop
  *    `javascript` lines, flag pages with `lorem ipsum` or `{`.
  *
  * Both are pure map-side projections: no shuffle, no UDF — the shape
  * that rides a 100 TB scan untouched. The tokenizations are materialized
  * ONCE per row into temp array columns and every flag derives from
  * those (higher-order-function expressions are not subexpression-
  * eliminated, so naively repeating them would re-split the text per
  * flag).
  */
object QualityFilters {

  /** Raw whitespace words (the papers' unit — NOT the normalized token
    * stream used by the dedup family). `\s+` split: a space-only split
    * would glue words across newlines/tabs and skew every word rule.
    */
  private def words(text: Column): Column =
    filter(split(text, "\\s+"), _ =!= "")

  private def lines(text: Column): Column = split(text, "\n")

  private val Stopwords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Loud-failure contract shared with
    * [[Boilerplate.stripFrequentPrefixes]]: refuse inputs whose columns
    * collide with the temp or output names an operator writes —
    * `withColumn` would silently overwrite them (and the temps would then
    * be dropped on exit, losing user data). Comparison is
    * CASE-INSENSITIVE, because `withColumn`/`drop` resolve through
    * Spark's default case-insensitive resolver: a `Gopher_Pass` input
    * column would be overwritten by `gopher_pass` just the same.
    */
  private[operators] def requireFreshColumns(df: DataFrame, op: String,
      names: Seq[String]): Unit = {
    val existing = df.columns.map(_.toLowerCase).toSet
    names.foreach { c =>
      require(!existing.contains(c.toLowerCase),
        s"$op: input already has a $c column (names are matched " +
          "case-insensitively, like Spark's resolver); rename it first")
    }
  }

  /** Per-document Gopher rule flags + the conjunction `gopher_pass`.
    * Thresholds are the published ones; each flag is its own column so a
    * pipeline can loosen individual rules. Integer cross-multiplication
    * throughout: e.g. "mean word length in [3, 10]" is
    * `3·n ≤ Σlen ≤ 10·n`, "≤ 90% bullet lines" is `10·bullets ≤ 9·lines`.
    * The hash and ellipsis symbol ratios are tested SEPARATELY (each
    * ≤ 0.1), per the paper — a combined sum would over-filter documents
    * near either boundary.
    */
  def gopherFlags(df: DataFrame, textCol: String): DataFrame = {
    requireFreshColumns(df, "gopherFlags", Seq("__gf_w", "__gf_ls",
      "g_word_count", "g_mean_word_len", "g_symbol_ratio",
      "g_bullet_lines", "g_ellipsis_lines", "g_alpha_words",
      "g_stop_words", "gopher_pass"))
    val t = col(textCol)
    val w = col("__gf_w")
    val ls = col("__gf_ls")
    val nWords = size(w).cast("long")
    val sumLen = coalesce(
      aggregate(transform(w, x => length(x).cast("long")), lit(0L), _ + _),
      lit(0L))
    val nLines = size(ls).cast("long")
    val bulletLines = size(filter(ls,
      l => trim(l).rlike("^[-*•]"))).cast("long")
    // \s* before $: a CRLF corpus leaves \r on split lines, and Java's $
    // (before a final terminator) vs RE2's (end of text only) would
    // disagree without it
    val ellipsisLines = size(filter(ls,
      l => l.rlike("\\.\\.\\.\\s*$"))).cast("long")
    val hashes = size(regexp_extract_all(t, lit("#"), lit(0))).cast("long")
    val ellipses =
      size(regexp_extract_all(t, lit("\\.\\.\\."), lit(0))).cast("long")
    val alphaWords = size(filter(w, x => x.rlike("[A-Za-z]"))).cast("long")
    val stops = size(array_intersect(
      transform(w, x => lower(x)), array(Stopwords.map(lit): _*))).cast("long")
    // every flag coalesces to false on NULL text: split(NULL) is NULL, so
    // the raw comparisons would all be NULL while the DuckDB oracle's
    // CASE WHEN yields 0 — a latent hash mismatch the moment a corpus
    // carries a NULL document
    def flag(c: Column): Column = coalesce(c, lit(false))
    df.withColumn("__gf_w", words(t))
      .withColumn("__gf_ls", lines(t))
      .withColumn("g_word_count", flag(nWords.between(50L, 100000L)))
      .withColumn("g_mean_word_len",
        flag(lit(3L) * nWords <= sumLen && sumLen <= lit(10L) * nWords))
      .withColumn("g_symbol_ratio",
        flag(hashes * 10L <= nWords && ellipses * 10L <= nWords))
      .withColumn("g_bullet_lines", flag(bulletLines * 10L <= nLines * 9L))
      .withColumn("g_ellipsis_lines",
        flag(ellipsisLines * 10L <= nLines * 3L))
      .withColumn("g_alpha_words", flag(alphaWords * 5L >= nWords * 4L))
      .withColumn("g_stop_words", flag(stops >= 2L))
      .withColumn("gopher_pass",
        col("g_word_count") && col("g_mean_word_len") &&
          col("g_symbol_ratio") && col("g_bullet_lines") &&
          col("g_ellipsis_lines") && col("g_alpha_words") &&
          col("g_stop_words"))
      .drop("__gf_w", "__gf_ls")
  }

  /** Corpus-trained bigram-rarity fluency score — the integer-exact,
    * no-external-model analog of LM-perplexity quality filtering (CCNet,
    * Wenzek et al. 2020 trains KenLM; at curation time the corpus's own
    * n-gram statistics carry the same signal): a document whose token
    * bigrams are mostly RARE in the corpus (occurrence count ≤ `rareMax`)
    * is incoherent relative to the corpus. Emits, per document,
    * `bigrams_total` (occurrence count, not distinct), `bigrams_rare`,
    * and `lowq` = rare·5 > total (more than 20% rare). Zero-bigram docs
    * (< 2 tokens, NULL text) emit 0/0/false.
    *
    * Kept integer (counts + cross-multiplication) rather than a float
    * log-probability sum so a cross-engine oracle reproduces every value
    * bit-for-bit — no ln() ulp drift.
    *
    * Distributed shape: one explode of bigram OCCURRENCES feeding (a) the
    * corpus-wide count table (one gram-keyed aggregate) and (b) the
    * per-doc re-aggregate after a gram-keyed join — both sides of the
    * join arrive on the same gram partitioning, and the count table is
    * corpus-bounded (distinct bigrams), never collected.
    */
  def bigramRarity(df: DataFrame, idCol: String, textCol: String,
      rareMax: Long = 1L): DataFrame = {
    require(rareMax >= 1, s"rareMax must be >= 1, got $rareMax")
    requireFreshColumns(df, "bigramRarity",
      Seq("bigrams_total", "bigrams_rare", "lowq", "__bg", "__bgc"))
    val ex = df.select(col(idCol),
      explode_outer(graft.queries.TextQueries.ngramsCol(col(textCol), 2))
        .as("__bg"))
    val counts = ex.filter(col("__bg").isNotNull)
      .groupBy(col("__bg")).agg(count(lit(1)).as("__bgc"))
    val metrics = ex.join(counts, Seq("__bg"), "left")
      .groupBy(col(idCol))
      .agg(count(col("__bg")).as("bigrams_total"),
        sum(when(col("__bg").isNotNull && col("__bgc") <= rareMax, 1L)
          .otherwise(0L)).as("bigrams_rare"))
      .withColumn("lowq", col("bigrams_rare") * 5 > col("bigrams_total"))
    // input columns ride along (the sibling-operator contract: filters
    // compose by chaining, no caller-side join); explode_outer covers
    // every NON-NULL id, but a NULL id never matches an equi-join key —
    // left + coalesce keeps such rows with the zero-bigram metrics
    // instead of silently dropping them
    df.join(metrics, Seq(idCol), "left")
      .withColumn("bigrams_total", coalesce(col("bigrams_total"), lit(0L)))
      .withColumn("bigrams_rare", coalesce(col("bigrams_rare"), lit(0L)))
      .withColumn("lowq", coalesce(col("lowq"), lit(false)))
  }

  /** C4 cleaning: per document, the retained lines (terminal-punctuation
    * ending, ≥ 5 words, no `javascript`), their count, and the page-level
    * `c4_page_drop` flag (`lorem ipsum` or a curly brace anywhere — the
    * paper drops the whole page). Returns the input columns plus
    * `c4_text`, `c4_lines_kept`, `c4_lines_total`, `c4_page_drop`; a
    * dropped page keeps its rows flagged rather than silently vanishing,
    * so the caller chooses `.filter(!col("c4_page_drop"))`.
    */
  def c4CleanLines(df: DataFrame, textCol: String): DataFrame = {
    requireFreshColumns(df, "c4CleanLines", Seq("__c4_kept", "c4_text",
      "c4_lines_kept", "c4_lines_total", "c4_page_drop"))
    val t = col(textCol)
    val kept = col("__c4_kept")
    // NULL text ⇒ empty page, not NULL outputs: the DuckDB mirror
    // coalesces to ''/0/false, and downstream pipeline stages expect
    // non-null c4_text
    df.withColumn("__c4_kept", filter(lines(t), l =>
        l.rlike("[.!?\"]\\s*$") &&
          size(filter(split(trim(l), "\\s+"), x => x =!= "")) >= 5 &&
          !lower(l).contains("javascript")))
      .withColumn("c4_text", coalesce(array_join(kept, "\n"), lit("")))
      .withColumn("c4_lines_kept",
        coalesce(size(kept).cast("long"), lit(0L)))
      .withColumn("c4_lines_total",
        coalesce(size(lines(t)).cast("long"), lit(0L)))
      .withColumn("c4_page_drop",
        coalesce(lower(t).contains("lorem ipsum") || t.contains("{"),
          lit(false)))
      .drop("__c4_kept")
  }

  /** Hampel/MAD robust outlier flag, per key group: a row is an outlier
    * when `|value − median| > k · MAD` with
    * `MAD = median(|value − median|)` — the standard robust alternative
    * to mean/stddev z-scores (a handful of giant documents cannot drag
    * the threshold the way they drag a stddev). The entire rule is
    * evaluated in EXACT integer arithmetic: medians of integers land on
    * the ½ grid, so `med2 = 2·median(v)` and `mad4 = 2·median(|2v − med2|)`
    * are integral, and the verdict is the integer comparison
    * `2·|2v − med2| > k·mad4` — engine-exact, no float thresholds.
    *
    * Output: the input plus `med2`, `mad4`, and `is_outlier` (BIGINT
    * 0/1; NULL for a NULL value — it belongs to no distribution).
    * NULL values are excluded from both medians. Rows with a NULL in any
    * KEY column are DROPPED from the output (the stats are joined back
    * with plain equi-joins, and SQL equality never matches NULL) — unlike
    * [[percentileBuckets]], which partitions by key and therefore keeps
    * NULL keys as their own group. On a dirty corpus, filter or
    * coalesce-default the keys first if those rows must survive.
    *
    * Plan shape: two aggregation passes over the input (inherent to MAD
    * — the deviations need the median first), each collapsing to one row
    * per key and broadcast back; the input itself never shuffles. At
    * 100 TB the exact per-key median is the only super-linear piece —
    * Spark's `percentile` buffers per-key values; for web-scale key
    * cardinalities swap in `percentile_approx` at the caller's accuracy
    * budget (the flag rule is unchanged).
    */
  def madOutlierFlags(df: DataFrame, keys: Seq[String], valueCol: String,
      k: Long = 3L): DataFrame = {
    require(keys.nonEmpty, "madOutlierFlags: at least one key column required")
    require(k > 0, s"madOutlierFlags: k must be positive, got $k")
    requireFreshColumns(df, "madOutlierFlags",
      Seq("med2", "mad4", "is_outlier", "__d2"))
    require(df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }, s"madOutlierFlags: value column '$valueCol' must be integral (got " +
      s"${df.schema(valueCol).dataType.simpleString}) — scale to an " +
      "integer grid first (float medians would drift between engines)")

    val v = col(valueCol).cast("long")
    val med = df.groupBy(keys.map(col): _*)
      .agg((percentile(col(valueCol), lit(0.5)) * 2).cast("long").as("med2"))
    val withD = df.join(broadcast(med), keys)
      .withColumn("__d2", abs(v * 2 - col("med2")))
    val mad = withD.groupBy(keys.map(col): _*)
      .agg((percentile(col("__d2"), lit(0.5)) * 2).cast("long").as("mad4"))
    withD.join(broadcast(mad), keys)
      .withColumn("is_outlier",
        (col("__d2") * 2 > lit(k) * col("mad4")).cast("long"))
      .drop("__d2")
  }

  /** CCNet-style percentile buckets (Wenzek et al. 2020 §4.3: per-language
    * perplexity terciles → head/middle/tail): per key group, label each
    * row by the fraction of its group ranking strictly below it. The
    * fraction is an EXACT integer — `pr_ppm = (rank − 1)·10⁶ div n` with
    * SQL `RANK()` (ties share a rank, so the verdict is independent of
    * tie traversal) — and bucket cuts are ppm integers, so both engines
    * agree bit-for-bit with no float percentiles.
    *
    * `cutsPpm` are the ascending upper bounds (exclusive) of every bucket
    * but the last; `labels` has one more entry. Rows with a NULL score get
    * NULL `pr_ppm`/`bucket` (they belong to no distribution) and never
    * shift the ranks of scored rows.
    *
    * Plan shape: ONE window pass per key group (rank + two counts over
    * the same partitioning), everything else map-side. At 100 TB the
    * per-key sort is the window operator's external sort — the same cost
    * as any per-key ranking.
    */
  def percentileBuckets(df: DataFrame, keys: Seq[String], scoreCol: String,
      cutsPpm: Seq[Long] = Seq(333333L, 666667L),
      labels: Seq[String] = Seq("head", "middle", "tail")): DataFrame = {
    require(keys.nonEmpty, "percentileBuckets: at least one key column required")
    require(labels.size == cutsPpm.size + 1,
      s"percentileBuckets: ${cutsPpm.size} cuts need ${cutsPpm.size + 1} " +
        s"labels, got ${labels.size}")
    require(cutsPpm == cutsPpm.sorted && cutsPpm.distinct == cutsPpm &&
      cutsPpm.forall(c => c > 0 && c < 1000000L),
      s"percentileBuckets: cuts must be strictly ascending within " +
        s"(0, 1000000), got ${cutsPpm.mkString(", ")}")
    requireFreshColumns(df, "percentileBuckets",
      Seq("pr_ppm", "bucket", "__r", "__n"))

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
    // NULL scores sort first under the default asc ordering, so every
    // scored row's RANK is inflated by the group's null count — subtract
    // it; count(scoreCol) skips nulls for the denominator
    val scored = df
      .withColumn("__r",
        rank().over(w.orderBy(col(scoreCol).asc)).cast("long") -
          (count(lit(1)).over(w) - count(col(scoreCol)).over(w)))
      .withColumn("__n", count(col(scoreCol)).over(w))
      .withColumn("pr_ppm",
        when(col(scoreCol).isNotNull,
          expr("((__r - 1) * 1000000) DIV __n")))
    val bucket = cutsPpm.zip(labels).foldRight(
        when(col("pr_ppm").isNotNull, lit(labels.last))) {
      case ((cut, label), rest) =>
        when(col("pr_ppm") < cut, lit(label)).otherwise(rest)
    }
    scored
      .withColumn("bucket", when(col("pr_ppm").isNotNull, bucket))
      .drop("__r", "__n")
  }
}
