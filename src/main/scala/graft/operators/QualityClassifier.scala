package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.DsirScore

/** Learned quality-classifier INFERENCE — the stage the FineWeb-Edu /
  * Llama-era pipelines run over every document at corpus scale: apply a
  * pre-trained linear model over hashed n-gram features and gate on the
  * logit. Rules (Gopher/C4) and importance weights (DSIR) already exist
  * in this engine; this adds the learned-model APPLY step between them.
  *
  * The model is a hashed-feature linear scorer in integer micro-units:
  * `logit_q(doc) = bias_q + Σ_grams w_q(bucket(gram))`, with grams =
  * unigrams ∪ adjacent bigrams under the model's tokenizer rule and
  * bucket = md5-prefix hash mod `buckets` — EXACTLY the
  * [[graft.functions.DsirScoreKernel]] feature rule, deliberately: the
  * kernel IS a hashed linear model, so inference reuses the same fused
  * codegen'd expression (one map-side projection, zero shuffle, model
  * as a plan reference object) and the same engine-exact integer-sum
  * parity story. A fastText-style bag-of-ngrams classifier head is this
  * shape; so is a naive-Bayes log-odds model — which is why
  * [[fromDsir]] turns a fitted [[Dsir.Model]] (log-count-ratio of a
  * GOOD corpus vs a BAD corpus) directly into a classifier: the NB
  * log-odds baseline every curation team ships first.
  *
  * Scale shape: scoring is one codegen'd projection per document — no
  * explode, no join, no shuffle, no driver state beyond the ≤ 2^20
  * weight array riding the plan. Gating composes into any pipeline
  * position as a map-side filter.
  */
object QualityClassifier {

  /** A trained model: per-bucket weights and bias in integer micro-units
    * (`floor(1e6·w)` — integer per-gram contributions commute, so the
    * DuckDB oracle's unnest+sum recompute hash-matches), plus the
    * feature rule (tokenizer tag + bucket count) that training used.
    */
  final case class Model(buckets: Int, tokenizerTag: String,
      biasMicro: Long, wMicro: Array[Long]) {
    require(buckets > 0 && buckets <= (1 << 20),
      s"QualityClassifier.Model: buckets must be in (0, 2^20], got $buckets")
    require(wMicro.length == buckets,
      s"QualityClassifier.Model: ${wMicro.length} weights for $buckets buckets")
  }

  /** Naive-Bayes log-odds classifier from a fitted DSIR model: the
    * per-bucket log-likelihood-ratio of target-vs-raw IS the NB weight
    * vector, so `Dsir.fit(goodDocs, badDocs)` + this wrapper is the
    * complete training recipe for the baseline classifier.
    */
  def fromDsir(model: Dsir.Model, biasMicro: Long = 0L): Model =
    Model(model.buckets, model.tokenizerTag, biasMicro, model.lrMicro)

  /** Logit per document, integer micro-units — one codegen'd map-side
    * projection. NULL/empty text scores `biasMicro` (no grams, an empty
    * sum): an empty document is a legal corpus member whose evidence is
    * exactly nothing.
    */
  def score(df: DataFrame, textCol: String, model: Model,
      scoreCol: String = "clf_logit_q"): DataFrame = {
    require(!df.columns.contains(scoreCol),
      s"QualityClassifier.score: input already has a '$scoreCol' column; " +
        "rename it first")
    df.withColumn(scoreCol,
      lit(model.biasMicro) + coalesce(
        DsirScore.dsirScore(col(textCol), model.tokenizerTag, model.buckets,
          model.wMicro),
        lit(0L)))
  }

  /** [[score]] plus the keep flag (`logit_q >= thresholdMicro`) — the
    * audit form that keeps every row with its verdict visible.
    */
  def classify(df: DataFrame, textCol: String, model: Model,
      thresholdMicro: Long, scoreCol: String = "clf_logit_q",
      keepCol: String = "clf_keep"): DataFrame = {
    require(!df.columns.contains(keepCol),
      s"QualityClassifier.classify: input already has a '$keepCol' column; " +
        "rename it first")
    score(df, textCol, model, scoreCol)
      .withColumn(keepCol, (col(scoreCol) >= thresholdMicro).cast("int"))
  }

  /** The gate form curation pipelines compose: keep documents whose
    * logit clears the threshold; the score rides along for downstream
    * re-ranking. Pure map-side filter — composes into any pipeline
    * position without adding a shuffle.
    */
  def filterByScore(df: DataFrame, textCol: String, model: Model,
      thresholdMicro: Long, scoreCol: String = "clf_logit_q"): DataFrame =
    score(df, textCol, model, scoreCol)
      .where(col(scoreCol) >= thresholdMicro)

  /** Multi-class inference — the fastText-style language-ID / routing
    * stage (CCNet runs LID over every crawl document before anything
    * else): K per-class linear models over the SAME hashed-gram feature
    * rule, scored by ONE fused kernel pass
    * ([[graft.functions.DsirScoreMulti]] — each gram tokenizes and
    * hashes once and is charged to every class; K separate [[score]]
    * calls would re-tokenize the document K times). Output: the winning
    * label and its logit. Ties break to the FIRST model in `models`
    * (lowest index — the pinned rule both engines replay via
    * first-position-of-max / ordered CASE). NULL/empty text argmaxes
    * the biases alone (no grams, empty evidence — the [[score]] rule).
    *
    * Per-class models train independently (e.g. [[fromDsir]] one-vs-rest
    * per language) and persist individually via [[writeModel]]. Scale
    * shape: one map-side projection, zero shuffle; the K×buckets weight
    * matrix rides the plan as one reference object (K·buckets·8 bytes —
    * ~100 MB at the 200-language × 2^16-bucket fastText scale, a
    * broadcast-sized artifact; the bucket-major layout keeps the
    * per-gram reads contiguous at any size).
    */
  def classifyMulti(df: DataFrame, textCol: String,
      models: Seq[(String, Model)], labelCol: String = "clf_label",
      logitCol: String = "clf_logit_q"): DataFrame = {
    require(models.size >= 2,
      s"QualityClassifier.classifyMulti: need >= 2 classes, got ${models.size}")
    val labels = models.map(_._1)
    require(labels.distinct.size == labels.size,
      s"QualityClassifier.classifyMulti: duplicate labels in " +
        labels.mkString("[", ", ", "]"))
    val head = models.head._2
    models.foreach { case (l, m) =>
      require(m.buckets == head.buckets && m.tokenizerTag == head.tokenizerTag,
        s"QualityClassifier.classifyMulti: class '$l' has feature rule " +
          s"(${m.buckets}, ${m.tokenizerTag}) but '${labels.head}' has " +
          s"(${head.buckets}, ${head.tokenizerTag}) — all classes must " +
          "share ONE rule (one tokenize+hash pass scores them all)")
    }
    Seq(labelCol, logitCol, "__mc").foreach { c =>
      require(!df.columns.contains(c),
        s"QualityClassifier.classifyMulti: input already has a '$c' " +
          "column; rename it first")
    }
    val k = models.size
    // bucket-major (wFlat(b*k + c)) so the K weights a gram touches sit
    // contiguous — see the DsirScoreMultiKernel layout note
    val wFlat = new Array[Long](k * head.buckets)
    models.zipWithIndex.foreach { case ((_, m), c) =>
      var b = 0
      while (b < head.buckets) { wFlat(b * k + c) = m.wMicro(b); b += 1 }
    }
    val biases = models.map(_._2.biasMicro).toArray
    // alias-anchored (the round-18 fusion lesson): consumed thrice below
    val fused = coalesce(
      DsirScore.dsirScoreMulti(col(textCol), head.tokenizerTag, head.buckets,
        k, wFlat, biases),
      array(biases.toIndexedSeq.map(lit(_)): _*))
    df.withColumn("__mc", fused)
      .withColumn(logitCol, array_max(col("__mc")))
      .withColumn(labelCol, element_at(typedlit(labels),
        array_position(col("__mc"), col(logitCol)).cast("int")))
      .drop("__mc")
  }

  // ---- model persistence (one tiny parquet + the shared meta file) ----

  private val MetaFileName = "_graft_clf_model_meta.json"

  /** Persist a model: `(bucket, w_micro)` parquet + meta carrying the
    * feature rule and bias. Scoring after [[readModel]] is bit-identical
    * to scoring with the in-memory model.
    */
  def writeModel(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    model.wMicro.zipWithIndex
      .map { case (w, b) => (b, w) }.toSeq
      .toDF("bucket", "w_micro")
      .coalesce(1).write.mode("overwrite").parquet(path)
    IndexLifecycle.writeMeta(spark, path, MetaFileName,
      s"""{"buckets": ${model.buckets}, "tok": "${model.tokenizerTag}", """ +
        s""""bias_micro": ${model.biasMicro}, "version": 1}""")
  }

  /** Load a persisted model; feature rule comes from the meta (never a
    * caller parameter — the model decides how text is featurized).
    */
  def readModel(spark: SparkSession, path: String): Model = {
    val txt = IndexLifecycle.requireMeta(spark, path, MetaFileName,
      "QualityClassifier.readModel", "QualityClassifier.writeModel")
    val buckets = IndexLifecycle.longField(txt, "buckets").map(_.toInt)
      .getOrElse(throw new IllegalArgumentException(
        s"QualityClassifier.readModel: malformed meta at $path: $txt"))
    val tok = IndexLifecycle.strField(txt, "tok")
      .map(Tokenizer.fromTag(_, "QualityClassifier.readModel"))
      .getOrElse(throw new IllegalArgumentException(
        s"QualityClassifier.readModel: meta at $path lacks a tokenizer " +
          s"tag: $txt"))
    // loud like every sibling field: a silently-defaulted bias would
    // shift EVERY logit and mis-gate documents with no error signal
    val bias = IndexLifecycle.longField(txt, "bias_micro")
      .getOrElse(throw new IllegalArgumentException(
        s"QualityClassifier.readModel: meta at $path lacks bias_micro: $txt"))
    val rows = spark.read.parquet(path).select("bucket", "w_micro").collect()
    require(rows.length == buckets,
      s"QualityClassifier.readModel: $path has ${rows.length} bucket rows, " +
        s"meta says $buckets")
    val w = Array.fill(buckets)(0L)
    val seen = new java.util.BitSet(buckets)
    rows.foreach { r =>
      val i = r.getInt(0)
      require(i >= 0 && i < buckets,
        s"QualityClassifier.readModel: malformed model at $path — bucket " +
          s"index $i outside [0, $buckets)")
      require(!seen.get(i),
        s"QualityClassifier.readModel: malformed model at $path — " +
          s"duplicate bucket $i")
      seen.set(i)
      w(i) = r.getLong(1)
    }
    Model(buckets, tok.tag, bias, w)
  }
}
