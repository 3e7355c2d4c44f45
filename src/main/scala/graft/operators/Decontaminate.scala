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
}
