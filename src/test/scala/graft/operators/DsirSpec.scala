package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR importance resampling ([[Dsir]], Xie et al. NeurIPS'23): the
  * fused scoring kernel against an explode/join column recompute, the
  * fit's smoothing arithmetic on a hand corpus, Gumbel-top-k draw
  * properties, and the model artifact roundtrip.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  // a corpus with ascii, non-ascii, empty, and single-token rows — every
  // tokenizer edge the kernel must agree on with the column pipeline
  private val corpus = docs(
    0L -> "the model trains on data",
    1L -> "das modell trainiert auf daten",
    2L -> "",
    3L -> "x",
    4L -> "the the the model",
    5L -> "Caffé crème — naïve 'quote'",
    6L -> "data data model model the")
    .unionByName(Seq(7L).toDF("doc_id")
      .withColumn("text", lit(null).cast("string"))) // NULL text: scores 0
  private val target = docs(
    10L -> "das modell lernt",
    11L -> "daten und modell",
    12L -> "auf daten trainiert")

  /** The kernel's value-oracle: grams exploded, bucketed with the SAME
    * hash, joined to the model table, summed per doc (zero-gram docs 0).
    */
  private def scoreByExplode(df: DataFrame, model: Dsir.Model): DataFrame = {
    val lr = model.lrMicro.zipWithIndex
      .map { case (v, b) => (b.toLong, v) }.toSeq.toDF("__b", "__lr")
    val grams = df.select(col("doc_id"),
        explode(Dsir.gramsCol(col("text"), Tokenizer.Ascii)).as("__g"))
      .select(col("doc_id"),
        pmod(graft.queries.TextQueries.hash32(col("__g")),
          lit(model.buckets.toLong)).as("__b"))
    df.select("doc_id").join(
        grams.join(lr, "__b").groupBy("doc_id")
          .agg(sum("__lr").as("w")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("w"), lit(0L)).as("dsir_weight_q"))
  }

  test("kernel score == explode/join recompute on every corpus shape") {
    val model = Dsir.fit(target, corpus, "text", buckets = 64)
    val kernel = Dsir.score(corpus, "text", model)
      .select("doc_id", "dsir_weight_q").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oracle = scoreByExplode(corpus, model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel === oracle)
    assert(kernel(2L) === 0L, "empty doc must score 0, not null")
    assert(kernel(7L) === 0L,
      "NULL text must score 0 like the empty doc — the kernel expression " +
        "is null-preserving, so a bare (uncoalesced) score would emit " +
        "NULL and diverge from the DuckDB mirror's coalesce(wq, 0)")
  }

  test("fitSplit: one tagged pass model-equals the two-frame fit (null tag rows excluded)") {
    val twoPass = Dsir.fit(target, corpus, "text", buckets = 64)
    // one frame: target rows tagged true, corpus rows false, plus an
    // extra row tagged NULL that must belong to NEITHER side
    val union = target.withColumn("__side", lit(true))
      .unionByName(corpus.withColumn("__side", lit(false)))
      .unionByName(docs(99L -> "the the the model data")
        .withColumn("__side", lit(null).cast("boolean")))
    val onePass = Dsir.fitSplit(union, col("__side"), "text", buckets = 64)
    assert(onePass.buckets === twoPass.buckets)
    assert(onePass.tokenizerTag === twoPass.tokenizerTag)
    assert(onePass.lrMicro.toSeq === twoPass.lrMicro.toSeq,
      "single tagged pass must produce the identical log-ratio table")
  }

  test("fit: hand-checked smoothing arithmetic on a 2-bucket toy") {
    // one gram total on each side, forced into knowable buckets by using
    // buckets = 1: every gram lands in bucket 0
    val m = Dsir.fit(docs(0L -> "aa"), docs(1L -> "bb"), "text", buckets = 1)
    // target: 1 gram, raw: 1 gram, alpha = 1, B = 1:
    // lr = ln((1+1)/(1+1)) - ln((1+1)/(1+1)) = 0
    assert(m.lrMicro.toSeq === Seq(0L))
    val m2 = Dsir.fit(docs(0L -> "aa aa"), docs(1L -> "bb"), "text", buckets = 1)
    // target: 3 grams (2 uni + 1 bi), raw 1: ln(4/4) - ln(2/2) = 0
    assert(m2.lrMicro.toSeq === Seq(0L))
  }

  test("fit favors target-only vocabulary and penalizes raw-only") {
    val model = Dsir.fit(target, corpus, "text", buckets = 4096)
    val scored = Dsir.score(corpus, "text", model)
      .select("doc_id", "dsir_weight_q").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shares its vocabulary with the target corpus; doc 0 is the
    // raw-typical English doc — the importance weight must separate them
    assert(scored(1L) > scored(0L))
  }

  test("resample: k rows, dense ranks, deterministic, seed-sensitive") {
    val model = Dsir.fit(target, corpus, "text", buckets = 256)
    val a = Dsir.resample(corpus, "doc_id", "text", model, k = 3, seed = 1L)
      .collect()
    assert(a.length === 3)
    assert(a.map(_.getAs[Int]("rank")).toSeq.sorted === Seq(1, 2, 3))
    val b = Dsir.resample(corpus, "doc_id", "text", model, k = 3, seed = 1L)
      .collect().map(_.toString).toSeq
    assert(a.map(_.toString).toSeq === b, "same seed must replay the draw")
    val c = Dsir.resample(corpus, "doc_id", "text", model, k = 3, seed = 2L)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    // with 7 docs and 3 draws, two seeds agreeing entirely would mean the
    // noise is not wired in (weights alone would pin one order)
    assert(c != a.map(_.getAs[Long]("doc_id")).toSeq ||
      Dsir.resample(corpus, "doc_id", "text", model, k = 3, seed = 3L)
        .collect().map(_.getAs[Long]("doc_id")).toSeq != c)
  }

  test("model roundtrip: write/read bit-identical, scoring equal") {
    val model = Dsir.fit(target, corpus, "text", buckets = 128)
    val dir = tempDir("dsir_model") + "/m"
    Dsir.writeModel(spark, model, dir)
    val back = Dsir.readModel(spark, dir)
    assert(back.buckets === model.buckets)
    assert(back.tokenizerTag === model.tokenizerTag)
    assert(back.alpha === model.alpha)
    assert(back.lrMicro.toSeq === model.lrMicro.toSeq)
    assert(Dsir.score(corpus, "text", back).collect().map(_.toString).sorted
      === Dsir.score(corpus, "text", model).collect().map(_.toString).sorted)
  }

  test("loud guards: weight column collision, non-model path, bad params") {
    val model = Dsir.fit(target, corpus, "text", buckets = 16)
    val already = Dsir.score(corpus, "text", model)
    intercept[IllegalArgumentException] {
      Dsir.score(already, "text", model)
    }
    intercept[IllegalArgumentException] {
      Dsir.readModel(spark, tempDir("dsir_nomodel"))
    }
    intercept[IllegalArgumentException] {
      Dsir.fit(target, corpus, "text", buckets = 0)
    }
    intercept[IllegalArgumentException] {
      Dsir.fit(target, corpus, "text", buckets = 16, alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      Dsir.resample(corpus, "doc_id", "text", model, k = 0)
    }
  }

  test("fitSampled: deterministic hash-rule sample, rank-stable vs the full fit") {
    // 400-doc raw corpus, two separable vocabularies: even ids English
    // (raw-typical), odd ids German (target-like). Big enough that a
    // half sample still estimates every discriminative bucket.
    val en = Vector("the", "model", "trains", "on", "data", "quality",
      "tokens", "filter")
    val de = Vector("das", "modell", "lernt", "auf", "daten", "qualitaet",
      "zeichen", "filter")
    val raw = (0L until 400L).map { i =>
      val v = if (i % 10 == 1) de else en // raw is 90% English
      val w = (0 until 6).map(j => v(((i + j * 7) % v.size).toInt))
      i -> w.mkString(" ")
    }
    val rawDf = docs(raw: _*)
    // target big enough that its gram mass dominates the Laplace floor
    // (Tt >> alpha·B) — a 2-doc target would drown in smoothing and no
    // fit, sampled or not, could separate the vocabularies
    val tgt = docs((1000L until 1060L).map { i =>
      val w = (0 until 6).map(j => de(((i + j * 5) % de.size).toInt))
      i -> w.mkString(" ")
    }: _*)

    val full = Dsir.fit(tgt, rawDf, "text", buckets = 256)
    val samp = Dsir.fitSampled(tgt, rawDf, "doc_id", "text", perMille = 500,
      buckets = 256)
    val samp2 = Dsir.fitSampled(tgt, rawDf, "doc_id", "text", perMille = 500,
      buckets = 256)
    assert(samp.lrMicro.toSeq === samp2.lrMicro.toSeq,
      "the hash-rule sample must make the fit replayable bit-for-bit")
    assert(Dsir.fitSampled(tgt, rawDf, "doc_id", "text", perMille = 1000,
      buckets = 256).lrMicro.toSeq === full.lrMicro.toSeq,
      "perMille = 1000 keeps every row — identical to the full fit")

    // rank stability, the property the draw depends on: both models
    // must score every target-vocabulary probe above every raw-typical
    // probe (pairwise separation preserved under sampling)
    val probes = docs(2000L -> "das modell lernt", 2001L -> "auf daten",
      2002L -> "the model trains", 2003L -> "on data quality")
    def scores(m: Dsir.Model): Map[Long, Long] =
      Dsir.score(probes, "text", m).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
    for (m <- Seq(full, samp); s = scores(m); d <- Seq(2000L, 2001L);
        e <- Seq(2002L, 2003L))
      assert(s(d) > s(e),
        s"model must rank target-like doc $d above raw-like $e: $s")

    intercept[IllegalArgumentException] {
      Dsir.fitSampled(tgt, rawDf, "doc_id", "text", perMille = 0)
    }
  }

  test("readModel refuses corrupt bucket rows loudly (duplicate, out-of-range)") {
    val model = Dsir.fit(target, corpus, "text", buckets = 8)
    val dir = tempDir("dsir_corrupt") + "/m"
    Dsir.writeModel(spark, model, dir)
    val good = spark.read.parquet(dir)
    // duplicate bucket: bucket 1's row relabeled 0 — same row count as
    // the meta, bucket 0 written twice, bucket 1 missing. Pre-guard this
    // silently left bucket 1 at lr=0 (wrong scores, no diagnostic).
    locally {
      val dup = good.where(col("bucket") === 1).withColumn("bucket", lit(0))
        .unionByName(good.where(col("bucket") =!= 1))
      dup.coalesce(1).write.mode("overwrite").parquet(dir + "_dup")
      copyModelMeta(dir, dir + "_dup")
      val e = intercept[IllegalArgumentException] {
        Dsir.readModel(spark, dir + "_dup")
      }
      assert(e.getMessage.contains("duplicate bucket"), e.getMessage)
    }
    // out-of-range index: pre-guard a raw ArrayIndexOutOfBoundsException
    locally {
      val oob = good.where(col("bucket") === 1).withColumn("bucket", lit(99))
        .unionByName(good.where(col("bucket") =!= 1))
      oob.coalesce(1).write.mode("overwrite").parquet(dir + "_oob")
      copyModelMeta(dir, dir + "_oob")
      val e = intercept[IllegalArgumentException] {
        Dsir.readModel(spark, dir + "_oob")
      }
      assert(e.getMessage.contains("outside [0, 8)"), e.getMessage)
    }
  }

  /** Copy the model meta file so a tampered-rows dir still parses as a
    * model (the corruption under test is the ROWS, not the meta).
    */
  private def copyModelMeta(from: String, to: String): Unit = {
    val name = "_graft_dsir_model_meta.json"
    val src = new java.io.File(from, name)
    assert(src.exists(), s"expected model meta at $src")
    java.nio.file.Files.copy(src.toPath,
      new java.io.File(to, name).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }
}
