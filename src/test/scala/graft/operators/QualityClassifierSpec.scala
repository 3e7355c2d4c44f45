package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[QualityClassifier]] hand fixtures: bias-only scoring on empty
  * evidence, the naive-Bayes bridge from a fitted DSIR model, gate vs
  * classify consistency, model roundtrip, and loud guards. Engine
  * parity of the scoring sum is the `q_quality_classifier` oracle's job.
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val model = QualityClassifier.Model(64, Tokenizer.Ascii.tag,
    biasMicro = 1000L, wMicro = Array.tabulate(64)(b => (b * 7 - 100).toLong))

  private def logit(text: Option[String]): Long =
    QualityClassifier.score(Seq(Tuple1(text)).toDF("t"), "t", model)
      .select("clf_logit_q").collect()(0).getLong(0)

  test("empty and NULL text score exactly the bias (no grams, empty sum)") {
    assert(logit(Some("")) === 1000L)
    assert(logit(None) === 1000L)
    assert(logit(Some("   ")) === 1000L) // tokenizer drops empties
  }

  test("score is bias + the DSIR kernel sum (the shared hashed-gram rule)") {
    val docs = Seq((1L, "table scan fast"), (2L, "window batch join"),
      (3L, "")).toDF("id", "t")
    val viaDsir = Dsir.score(docs, "t",
      Dsir.Model(model.buckets, model.tokenizerTag, 1.0, model.wMicro))
      .select(col("id"), (col("dsir_weight_q") + model.biasMicro).as("x"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaClf = QualityClassifier.score(docs, "t", model)
      .select("id", "clf_logit_q")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaClf === viaDsir)
  }

  test("fromDsir turns a fitted DSIR model into the NB log-odds classifier") {
    val good = Seq("table table scan", "table batch").toDF("text")
    val bad = Seq("noise junk noise", "junk spam").toDF("text")
    val clf = QualityClassifier.fromDsir(
      Dsir.fit(good, bad, "text", buckets = 128), biasMicro = 0L)
    val score = (t: String) =>
      QualityClassifier.score(Seq(Tuple1(t)).toDF("t"), "t", clf)
        .select("clf_logit_q").collect()(0).getLong(0)
    // good-corpus vocabulary scores above bad-corpus vocabulary
    assert(score("table scan") > score("noise junk"))
    assert(score("table scan") > 0L && score("noise junk") < 0L)
  }

  test("classify flags and filterByScore gate agree at the threshold") {
    val docs = Seq((1L, "table"), (2L, ""), (3L, "junkword")).toDF("id", "t")
    val flags = QualityClassifier.classify(docs, "t", model,
      thresholdMicro = 1000L)
      .select("id", "clf_logit_q", "clf_keep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    flags.foreach { case (_, lg, keep) =>
      assert((keep == 1) === (lg >= 1000L))
    }
    val kept = QualityClassifier.filterByScore(docs, "t", model,
      thresholdMicro = 1000L).select("id").collect().map(_.getLong(0)).toSet
    assert(kept === flags.filter(_._3 == 1).map(_._1).toSet)
  }

  test("model roundtrip is lossless and scores identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft_clf_spec")
      .toString + "/model"
    QualityClassifier.writeModel(spark, model, dir)
    val back = QualityClassifier.readModel(spark, dir)
    assert(back.buckets === model.buckets)
    assert(back.tokenizerTag === model.tokenizerTag)
    assert(back.biasMicro === model.biasMicro)
    assert(back.wMicro.toSeq === model.wMicro.toSeq)
    val t = Seq(Tuple1("table scan fast")).toDF("t")
    assert(QualityClassifier.score(t, "t", back).select("clf_logit_q")
      .collect()(0).getLong(0) ===
      QualityClassifier.score(t, "t", model).select("clf_logit_q")
        .collect()(0).getLong(0))
    // a meta missing bias_micro must FAIL, not silently shift every logit
    val metaPath = new java.io.File(dir, "_graft_clf_model_meta.json")
    val metaTxt = new String(
      java.nio.file.Files.readAllBytes(metaPath.toPath), "UTF-8")
    java.nio.file.Files.write(metaPath.toPath,
      metaTxt.replaceAll(""""bias_micro":\s*-?\d+,\s*""", "").getBytes("UTF-8"))
    // drop the Hadoop local-FS checksum sidecar the out-of-band edit broke
    new java.io.File(dir, "._graft_clf_model_meta.json.crc").delete()
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.readModel(spark, dir)
    }
    assert(e.getMessage.contains("bias_micro"))
  }

  test("guards stay loud: fresh columns, weight-length and bucket bounds") {
    val docs = Seq((1L, "x")).toDF("id", "t")
    intercept[IllegalArgumentException] {
      QualityClassifier.score(docs.withColumn("clf_logit_q", lit(1L)),
        "t", model)
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.classify(docs.withColumn("clf_keep", lit(1)),
        "t", model, 0L)
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.Model(64, "ascii", 0L, Array.fill(63)(0L))
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.Model((1 << 20) + 1, "ascii", 0L,
        Array.fill((1 << 20) + 1)(0L))
    }
  }

  private val multi = Seq(
    "a" -> model,
    "b" -> QualityClassifier.Model(64, Tokenizer.Ascii.tag, -500L,
      Array.tabulate(64)(b => (131 - b * 11).toLong)),
    "c" -> QualityClassifier.Model(64, Tokenizer.Ascii.tag, 2000L,
      Array.tabulate(64)(b => ((b * b) % 97 - 48).toLong)))

  test("classifyMulti: fused kernel agrees with K independent score() passes") {
    val docs = Seq((1L, "the table scan runs fast"), (2L, ""),
      (3L, "zip zap"), (4L, "a b c d e f g h i j k")).toDF("id", "t")
    val fused = QualityClassifier.classifyMulti(docs, "t", multi)
      .select("id", "clf_label", "clf_logit_q").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // reference: score each class independently, argmax with
    // lowest-index tie-break
    val perClass = multi.map { case (lbl, m) =>
      lbl -> QualityClassifier.score(docs, "t", m)
        .select("id", "clf_logit_q").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    docs.select("id").collect().map(_.getLong(0)).foreach { id =>
      val logits = perClass.map { case (lbl, byId) => (lbl, byId(id)) }
      val best = logits.maxBy(_._2)._2
      val expect = logits.find(_._2 == best).get
      assert(fused(id) === expect, s"doc $id")
    }
  }

  test("classifyMulti: ties break to the FIRST class; NULL text argmaxes the biases") {
    val docs = Seq((1L, "same same")).toDF("id", "t")
    val tied = QualityClassifier.classifyMulti(docs, "t",
      Seq("first" -> model, "second" -> model))
      .select("clf_label").collect()(0).getString(0)
    assert(tied === "first")
    val nullRow = QualityClassifier.classifyMulti(
      Seq[(Long, Option[String])]((9L, None)).toDF("id", "t"), "t", multi)
      .select("clf_label", "clf_logit_q").collect()(0)
    assert(nullRow.getString(0) === "c" && nullRow.getLong(1) === 2000L)
  }

  test("classifyMulti guards: class count, duplicate labels, rule mismatch, stale columns") {
    val docs = Seq((1L, "x")).toDF("id", "t")
    intercept[IllegalArgumentException] {
      QualityClassifier.classifyMulti(docs, "t", Seq("only" -> model))
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.classifyMulti(docs, "t",
        Seq("a" -> model, "a" -> multi(1)._2))
    }
    intercept[IllegalArgumentException] { // bucket-count mismatch
      QualityClassifier.classifyMulti(docs, "t", Seq("a" -> model,
        "b" -> QualityClassifier.Model(32, Tokenizer.Ascii.tag, 0L,
          Array.fill(32)(0L))))
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.classifyMulti(
        docs.withColumn("clf_label", lit("x")), "t", multi)
    }
  }
}
