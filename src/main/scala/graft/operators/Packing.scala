package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-shaping operators for the training/embedding side of a data
  * pipeline: split documents into fixed token windows (embedding / RAG
  * chunking) and pack documents into fixed token budgets (training-sequence
  * packing). No reference analog (beyond-parity training-pipeline operators,
  * like [[Dedup]]/[[Similarity]]/[[Decontaminate]]).
  *
  * Both use whitespace tokens so the DuckDB oracle reproduces results
  * bit-for-bit; swap the tokenizer column expression for a BPE UDF at the
  * call site if model-true token counts are needed.
  */
object Packing {

  /** Overlapping token-window chunks of each document: starts at 1, 1+stride,
    * 1+2·stride, … (1-based), each spanning `chunkSize` tokens (the last
    * chunks are shorter). Returns (idCol, chunk_id, chunk, n_tokens).
    *
    * Scale shape: pure map-side — tokenize, explode the per-doc start
    * sequence, slice; all codegen'd builtins, NO shuffle at any size (the
    * plan is Scan → Generate → Project). Output volume is
    * ~`chunkSize/stride` × corpus tokens; chunk rows inherit the input
    * partitioning.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkSize >= stride,
      s"need 0 < stride <= chunkSize, got stride=$stride chunkSize=$chunkSize")
    val t = split(col(textCol), " ")
    df.select(col(idCol), t.as("__t"))
      .select(col(idCol), col("__t"),
        explode(sequence(lit(1), greatest(size(col("__t")), lit(1)),
          lit(stride))).as("__i"))
      .select(
        col(idCol),
        ((col("__i") - 1) / stride).cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("__t"), col("__i"), lit(chunkSize))).as("chunk"),
        least(lit(chunkSize), size(col("__t")) - col("__i") + 1)
          .cast("long").as("n_tokens"))
  }

  /** Contiguous sequence packing: within each `groupCol` partition, docs in
    * `idCol` order fill training sequences of `tokenBudget` tokens —
    * `seq_id = (running-token-total − own-tokens) div budget`, i.e. a doc
    * belongs to the sequence its first token lands in (docs longer than the
    * budget span sequences; the id marks where they start). Deterministic —
    * same inputs → same packing, no RNG — provided `idCol` is unique within
    * each group (the running sum orders by it alone, so duplicate ids would
    * make tie order, and thus seq_id, shuffle-dependent). Returns
    * (idCol, groupCol, n_tokens, seq_id).
    *
    * Scale shape: one shuffle on `groupCol` + a per-group running sum
    * (codegen'd window). Group cardinality bounds parallelism — at corpus
    * scale pack per (source, shard) rather than a handful of global groups,
    * exactly as you'd shard any cumulative assignment.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, tokenBudget: Long): DataFrame =
    packCounts(
      df.select(col(idCol), col(groupCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens")),
      idCol, groupCol, "n_tokens", tokenBudget)

  /** [[packSequences]] over a PRECOMPUTED token-count column — the form
    * downstream of mixture sampling (where the count survives the sampler
    * and re-tokenizing exploded epoch copies would redo the work
    * copies-fold). Same contract: `idCol` unique per group, one shuffle on
    * `groupCol`, codegen'd running sum. Returns
    * (idCol, groupCol, tokensCol, seq_id).
    */
  /** Shared packing assignment: running token total per group (id order)
    * and the sequence id each doc's FIRST token lands in — the ONE
    * definition of the packing policy, so [[packCounts]] and
    * [[packedBoundaries]] can never desynchronize. Floor of the double
    * division is exact here: token totals sit far below 2^53, so both
    * engines compute the identical integer.
    */
  private def withCumAndSeqId(df: DataFrame, idCol: String, groupCol: String,
      tokensCol: String, tokenBudget: Long): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    val w = Window.partitionBy(groupCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(groupCol), col(tokensCol).cast("long").as(tokensCol))
      .withColumn("__cum", sum(tokensCol).over(w))
      .withColumn("seq_id",
        floor((col("__cum") - col(tokensCol)) / tokenBudget).cast("long"))
  }

  def packCounts(df: DataFrame, idCol: String, groupCol: String,
      tokensCol: String, tokenBudget: Long): DataFrame =
    withCumAndSeqId(df, idCol, groupCol, tokensCol, tokenBudget)
      .select(col(idCol), col(groupCol), col(tokensCol), col("seq_id"))

  /** Per-SEQUENCE boundary metadata for [[packCounts]] packing — what a
    * training reader needs to mask CROSS-DOCUMENT attention inside a packed
    * sequence: one row per (group, seq_id) with `n_docs` and `docs`, the
    * offset-ordered array of `(off, id, n_tokens)` document boundaries.
    * `off` is the document's first-token offset within its sequence
    * (`(cum − own) − seq_id·budget` ∈ [0, budget)); a document longer than
    * the remaining budget spans into following sequences — the boundary
    * row records it once, in the sequence where it STARTS, with its full
    * length (the packing policy's documented overflow shape, so `off +
    * n_tokens` may exceed the budget and the reader clips).
    *
    * Same distributed shape as the packing itself: ONE shuffle on
    * `groupCol` feeding both the running-sum window and the per-sequence
    * aggregate (the groupBy keys are a prefix-extension of the window
    * partitioning, so no second exchange); `sort_array` orders boundaries
    * without a sort step. Ordering is by the full `(off, id)` struct: a
    * zero-token document shares its `off` with the following document, so
    * offsets alone are NOT unique — the `id` field breaks the tie and
    * keeps the output deterministic.
    */
  def packedBoundaries(df: DataFrame, idCol: String, groupCol: String,
      tokensCol: String, tokenBudget: Long): DataFrame =
    withCumAndSeqId(df, idCol, groupCol, tokensCol, tokenBudget)
      .withColumn("off",
        col("__cum") - col(tokensCol) - col("seq_id") * tokenBudget)
      .groupBy(col(groupCol), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sort_array(collect_list(struct(col("off"), col(idCol).as("id"),
          col(tokensCol).as("n_tokens")))).as("docs"))
}
