package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{BpeCount, BpeIds, BpeKernel, BpeTable, BpeTokens}

/** Byte-pair-encoding subword tokenization (Sennrich et al. ACL'16) —
  * the model-true token surface a training pipeline packs, budgets, and
  * mixes by. Whitespace/regex counts (the engine's original token
  * surface) misestimate real sequence lengths by 20–40%; every public
  * pipeline (GPT-2's BPE, Llama's SentencePiece-BPE) packs by SUBWORD
  * counts. This operator provides: distributed training ([[fit]]),
  * model persistence ([[writeModel]]/[[readModel]]), and three fused
  * map-side encode columns ([[tokens]]/[[ids]]/[[tokenCount]]).
  *
  * Spark-first anatomy, sized for 100 TB:
  *  - [[fit]] never ships the corpus to the driver. ONE distributed
  *    word-histogram aggregate (map-side partial combine, key space =
  *    the corpus word DICTIONARY, which is heavy-tailed and bounded by
  *    `minCount`/`maxDictWords` with a LOUD cap) — then classic BPE
  *    merge training over the histogram driver-side, exactly how the
  *    public trainers work (HuggingFace/SentencePiece train from word
  *    counts, not the raw stream): O(numMerges · dictWords · wordLen)
  *    driver arithmetic on a KB–MB-scale dictionary.
  *  - Encoding is ONE codegen'd map-side projection per document
  *    ([[graft.functions.BpeKernel]]): no explode, no join, no
  *    shuffle; the model rides the plan as a single reference object
  *    with a per-task word memo. Counts feed [[Packing.packCounts]] /
  *    [[Sampling.mixtureByTokenBudget]] unchanged — they already take
  *    a precomputed count column.
  *  - Everything is deterministic (engine-exact): training tie-breaks
  *    by (count desc, left asc, right asc); encoding merges the single
  *    occurrence with the lowest (rank, position), recomputed after
  *    every merge — the HuggingFace `tokenizers` priority-queue order —
  *    so the DuckDB oracle replays the identical loop as a recursive
  *    CTE and hash-matches tokens, ids, and counts.
  *
  * Reference scope note: the reference engine (Streamiz) has no text
  * surface at all; this extends the training-data-pipeline axis
  * (SURVEY §2's LLM-pipeline mandate) like [[Dsir]]/[[Dedup]].
  */
object Bpe {

  val UnkToken = "<unk>"

  /** A fitted BPE model: ordered merge rules (rank = position), the id
    * vocabulary (`vocab(0)` is always [[UnkToken]]; base characters
    * then merge products), and the pre-tokenizer rule that feeds the
    * merge loop — encoding MUST split words exactly the way training
    * did, so the tag travels with the model (the [[Dsir.Model]] rule).
    */
  final case class Model(tokenizerTag: String, merges: Seq[(String, String)],
      vocab: Seq[String]) {
    require(vocab.nonEmpty && vocab.head == UnkToken,
      s"Bpe.Model: vocab(0) must be '$UnkToken' (the fixed unknown id 0), " +
        s"got ${vocab.headOption.getOrElse("<empty>")}")
    require(vocab.distinct.length == vocab.length,
      "Bpe.Model: vocab has duplicate tokens — ids would be ambiguous")
    require(merges.distinct.length == merges.length,
      "Bpe.Model: duplicate merge pair — only the first rank could ever " +
        "apply; the model is malformed")
    merges.foreach { case (l, r) =>
      require(l.nonEmpty && r.nonEmpty,
        "Bpe.Model: merge parts must be non-empty")
      require(!l.contains(BpeKernel.Sep) && !r.contains(BpeKernel.Sep),
        "Bpe.Model: merge parts must not contain U+0001 (the rank-key " +
          "separator)")
    }
    private val vocabSet = vocab.toSet
    merges.foreach { case (l, r) =>
      require(vocabSet.contains(l + r),
        s"Bpe.Model: merge product '${l + r}' missing from vocab — its " +
          "token could never be assigned an id")
    }

    /** Executable form (one plan reference object; built once). */
    @transient lazy val table: BpeTable = {
      val rk = new java.util.HashMap[String, Integer](merges.length * 2)
      merges.zipWithIndex.foreach { case ((l, r), i) =>
        rk.put(l + BpeKernel.Sep + r, Integer.valueOf(i))
      }
      val vb = new java.util.HashMap[String, java.lang.Long](vocab.length * 2)
      vocab.zipWithIndex.foreach { case (t, i) =>
        vb.put(t, java.lang.Long.valueOf(i.toLong))
      }
      new BpeTable(rk, vb)
    }
  }

  // ---- encode columns (fused map-side kernels) ----

  import org.apache.spark.sql.graft.ColumnBridge

  /** `array<string>` of subword tokens of `text` under `model`. */
  def tokens(text: Column, model: Model): Column =
    ColumnBridge.column(BpeTokens(ColumnBridge.expression(text),
      model.tokenizerTag, model.table))

  /** `array<bigint>` of vocabulary ids (unknown subword → 0). */
  def ids(text: Column, model: Model): Column =
    ColumnBridge.column(BpeIds(ColumnBridge.expression(text),
      model.tokenizerTag, model.table))

  /** `bigint` subword count — the packing/budget form (no token array
    * is materialized per row).
    */
  def tokenCount(text: Column, model: Model): Column =
    ColumnBridge.column(BpeCount(ColumnBridge.expression(text),
      model.tokenizerTag, model.table))

  // ---- training ----

  private[operators] def codePointsOf(word: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Apply one merge to a word's token sequence: ALL non-overlapping
    * occurrences, leftmost first (the Sennrich training convention).
    */
  private def applyMerge(toks: Array[String], l: String, r: String,
      product: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        out += product
        i += 2
      } else {
        out += toks(i)
        i += 1
      }
    }
    out.result()
  }

  /** Train a BPE model on a corpus: ONE distributed word-histogram pass,
    * then `numMerges` iterations of classic pair-count training over the
    * histogram on the driver. Deterministic: pair counts are exact
    * integers (sum order never matters) and the best pair tie-breaks by
    * (count desc, left asc, right asc).
    *
    * `maxDictWords` bounds the driver collect LOUDLY — the dictionary of
    * a deduplicated web corpus is millions of entries, not billions,
    * and `minWordCount` drops the hapax tail first (a word seen once
    * cannot influence any merge that matters at corpus scale). Note the
    * vocab consequence: base characters appearing ONLY in dropped rare
    * words are absent from the vocabulary, so they encode as stable
    * single-char tokens with id 0 (`<unk>`) — the standard trained-BPE
    * behavior for out-of-alphabet bytes.
    */
  def fit(docs: DataFrame, textCol: String, numMerges: Int,
      tokenizer: Tokenizer = Tokenizer.Ascii,
      minWordCount: Long = 1L, minPairCount: Long = 2L,
      maxDictWords: Int = 1 << 20): Model = {
    require(numMerges >= 0, s"Bpe.fit: numMerges must be >= 0, got $numMerges")
    require(minWordCount >= 1, s"Bpe.fit: minWordCount must be >= 1")
    require(minPairCount >= 1, s"Bpe.fit: minPairCount must be >= 1")
    require(maxDictWords > 0, s"Bpe.fit: maxDictWords must be > 0")
    val hist = docs
      .select(explode(tokenizer.column(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minWordCount)
      .limit(maxDictWords + 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    require(hist.length <= maxDictWords,
      s"Bpe.fit: corpus dictionary exceeds maxDictWords=$maxDictWords " +
        "after minWordCount filtering — raise minWordCount (drop the " +
        "rare-word tail) or maxDictWords (driver memory permitting)")

    var words: Array[(Array[String], Long)] =
      hist.map { case (w, c) => (codePointsOf(w).toArray, c) }
    val baseChars = words.iterator.flatMap(_._1).toSeq.distinct.sorted
    val merges = Seq.newBuilder[(String, String)]
    val products = Seq.newBuilder[String]
    val seenTokens = scala.collection.mutable.Set[String](baseChars: _*)
    var iter = 0
    var exhausted = false
    while (iter < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (toks, c) =>
        var i = 0
        while (i < toks.length - 1) {
          val k = (toks(i), toks(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      val best = counts.reduceOption { (a, b) =>
        val ((al, ar), ac) = a
        val ((bl, br), bc) = b
        if (ac != bc) { if (ac > bc) a else b }
        else if (al != bl) { if (al < bl) a else b }
        else if (ar <= br) a else b
      }
      best match {
        case Some(((l, r), c)) if c >= minPairCount =>
          val product = l + r
          merges += ((l, r))
          if (!seenTokens.contains(product)) {
            products += product
            seenTokens += product
          }
          words = words.map { case (toks, wc) =>
            (applyMerge(toks, l, r, product), wc)
          }
          iter += 1
        case _ => exhausted = true
      }
    }
    Model(tokenizer.tag, merges.result(),
      UnkToken +: (baseChars ++ products.result()))
  }

  // ---- model persistence (one tiny parquet + the shared meta file) ----

  private val MetaFileName = "_graft_bpe_model_meta.json"

  /** Persist a fitted model: `(kind, idx, left, right)` rows — kind
    * `m` = merge rule at rank idx, kind `v` = vocab token at id idx
    * (stored in `left`) — plus the shared meta artifact carrying the
    * pre-tokenizer rule. Encoding after [[readModel]] is bit-identical
    * to encoding with the in-memory model.
    */
  def writeModel(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    val mergeRows = model.merges.zipWithIndex.map { case ((l, r), i) =>
      ("m", i.toLong, l, r)
    }
    val vocabRows = model.vocab.zipWithIndex.map { case (t, i) =>
      ("v", i.toLong, t, "")
    }
    (mergeRows ++ vocabRows).toDF("kind", "idx", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
    IndexLifecycle.writeMeta(spark, path, MetaFileName,
      s"""{"tok": "${model.tokenizerTag}", """ +
        s""""n_merges": ${model.merges.length}, """ +
        s""""n_vocab": ${model.vocab.length}, "version": 1}""")
  }

  /** Load a persisted model; the tokenizer tag comes from the meta
    * (never a caller parameter — the model decides how text splits, or
    * token streams silently drift from the trained rule).
    */
  def readModel(spark: SparkSession, path: String): Model = {
    val txt = IndexLifecycle.requireMeta(spark, path, MetaFileName,
      "Bpe.readModel", "Bpe.writeModel")
    val tok = IndexLifecycle.strField(txt, "tok")
      .map(Tokenizer.fromTag(_, "Bpe.readModel"))
      .getOrElse(throw new IllegalArgumentException(
        s"Bpe.readModel: model meta at $path lacks a tokenizer tag: $txt"))
    val nMerges = IndexLifecycle.longField(txt, "n_merges")
      .getOrElse(throw new IllegalArgumentException(
        s"Bpe.readModel: malformed model meta at $path: $txt"))
    val nVocab = IndexLifecycle.longField(txt, "n_vocab")
      .getOrElse(throw new IllegalArgumentException(
        s"Bpe.readModel: malformed model meta at $path: $txt"))
    val rows = spark.read.parquet(path)
      .select("kind", "idx", "left", "right").collect()
    val merges = rows.filter(_.getString(0) == "m")
      .sortBy(_.getLong(1))
      .map(r => (r.getString(2), r.getString(3))).toSeq
    val vocab = rows.filter(_.getString(0) == "v")
      .sortBy(_.getLong(1))
      .map(_.getString(2)).toSeq
    require(merges.length == nMerges && vocab.length == nVocab,
      s"Bpe.readModel: $path has ${merges.length} merges/${vocab.length} " +
        s"vocab rows, meta says $nMerges/$nVocab — partial or corrupt write")
    Model(tok.tag, merges, vocab) // Model re-validates structure loudly
  }
}
