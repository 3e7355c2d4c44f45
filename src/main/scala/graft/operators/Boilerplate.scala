package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** Boilerplate-prefix detection and removal — the "strip the site header"
  * step of web-corpus curation: a leading token run shared by many
  * documents of the same group (domain/source) is boilerplate, not
  * content, and inflates n-gram counts and dedup signatures.
  *
  * Works on the NORMALIZED token stream ([[TextQueries.tokensCol]]), so
  * detection is case/punctuation-invariant and the stripped output is the
  * normalized text (document it downstream — raw-byte offsets are a
  * different, span-level problem: [[SpanDedup]]).
  *
  * Distributed shape: one aggregate on (group, prefix) — the prefix table
  * is at most |docs|/minDf rows, usually tiny — joined back on the same
  * keys. No corpus self-join, no window.
  */
object Boilerplate {

  private def prefixCol(toks: Column, k: Int): Column =
    when(size(toks) >= k, array_join(slice(toks, 1, k), " "))

  /** Leading `k`-token prefixes occurring in at least `minDf` documents of
    * a group: `(groupCol, prefix, df_count)`. Documents shorter than `k`
    * tokens contribute nothing.
    */
  def frequentPrefixes(df: DataFrame, textCol: String, groupCol: String,
      k: Int, minDf: Long): DataFrame = {
    require(k >= 1, s"prefix length must be >= 1, got $k")
    require(minDf >= 2, s"minDf must be >= 2 (df 1 = every document), got $minDf")
    df.select(col(groupCol),
        prefixCol(TextQueries.tokensCol(col(textCol)), k).as("prefix"))
      .filter(col("prefix").isNotNull)
      .groupBy(groupCol, "prefix")
      .agg(count(lit(1)).as("df_count"))
      .filter(col("df_count") >= minDf)
  }

  /** Cross-document frequent-LINE removal (the CCNet/RefinedWeb
    * line-dedup step, Wenzek et al. 2020 §3.1): a raw line occurring in
    * at least `minDf` DISTINCT documents of its group (navigation bars,
    * cookie banners, footers) is boilerplate and is removed from every
    * document; remaining lines keep their original order and bytes.
    * Returns the input columns plus `text_kept` (surviving lines
    * re-joined with newlines; '' for NULL text) and `lines_removed`.
    *
    * Distributed shape: one (group, line, doc) DISTINCT aggregate builds
    * the frequent-line table (bounded by distinct frequent lines — tiny
    * next to the corpus), joined back to the exploded lines without a
    * broadcast hint (tiny → AQE broadcasts), then one per-document
    * re-aggregate reassembles order via sort_array on (pos, line) — no
    * global sort, no self-join of documents.
    */
  def stripFrequentLines(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, minDf: Long): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2 (df 1 = every line), got $minDf")
    QualityFilters.requireFreshColumns(df, "stripFrequentLines",
      Seq("text_kept", "lines_removed", "__pos", "__ln", "__lf"))
    val lines = split(col(textCol), "\n")
    // posexplode_outer keeps NULL-text docs as one null-line row, so they
    // survive the regroup with text_kept = '' instead of vanishing
    val ex = df.select(col(idCol), col(groupCol),
      posexplode_outer(lines).as(Seq("__pos", "__ln")))
    val freq = ex.filter(col("__ln").isNotNull && trim(col("__ln")) =!= "")
      .select(col(groupCol), col("__ln"), col(idCol)).distinct()
      .groupBy(col(groupCol), col("__ln"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col(groupCol), col("__ln"), lit(1).as("__lf"))
    val re = ex.join(freq, Seq(groupCol, "__ln"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          sort_array(collect_list(when(col("__lf").isNull && col("__ln").isNotNull,
            struct(col("__pos"), col("__ln"))))),
          s => s.getField("__ln")), "\n").as("text_kept"),
        sum(when(col("__lf").isNotNull, 1L).otherwise(0L)).as("lines_removed"))
    df.join(re, Seq(idCol), "left")
      .withColumn("text_kept", coalesce(col("text_kept"), lit("")))
      .withColumn("lines_removed", coalesce(col("lines_removed"), lit(0L)))
  }

  /** Flag and strip: every document whose leading `k` normalized tokens
    * form a [[frequentPrefixes]] prefix of its group gets
    * `is_boilerplate = true` and `text_clean` = the normalized text with
    * those tokens removed; everything else passes through with its full
    * normalized text. The prefix table is corpus-derived, so the join
    * back carries no broadcast hint (tiny → AQE broadcasts; pathological
    * → shuffle join instead of an executor OOM).
    */
  def stripFrequentPrefixes(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, k: Int, minDf: Long): DataFrame = {
    QualityFilters.requireFreshColumns(df, "stripFrequentPrefixes",
      Seq("prefix", "is_boilerplate", "text_clean", "df_count", "__bp"))
    val prefixes = frequentPrefixes(df, textCol, groupCol, k, minDf)
      .withColumn("__bp", lit(1))
    val toks = TextQueries.tokensCol(col(textCol))
    df.withColumn("prefix", prefixCol(toks, k))
      .join(prefixes, Seq(groupCol, "prefix"), "left")
      .withColumn("is_boilerplate", col("__bp").isNotNull)
      // coalesce: NULL text tokenizes to NULL, but the contract (and the
      // DuckDB mirror) is a non-null text_clean — a NULL document strips
      // to the empty string
      .withColumn("text_clean", coalesce(
        when(col("is_boilerplate"),
          array_join(slice(toks, lit(k + 1), greatest(size(toks) - k, lit(0))), " "))
          .otherwise(array_join(toks, " ")),
        lit("")))
      .drop("prefix", "df_count", "__bp")
  }
}
