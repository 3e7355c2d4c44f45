package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[NgramLm]] — stupid-backoff scoring down every path, with HAND-PINNED
  * integer micro values (ln2 = 0.6931471805599453 etc. are IEEE doubles;
  * the expected integers below are computed once by hand from them and
  * frozen, so a kernel regression can't hide behind a test that re-runs
  * the same formula).
  *
  * Fit corpus: ["the cat sat", "the cat sat", "the dog sat"], ascii rule,
  * n = 3, minCount = 2 → total = 9 tokens; pruned table =
  * { the:3, cat:2, sat:3, "the cat":2, "cat sat":2, "the cat sat":2 }
  * (every "dog" gram is a hapax and prunes out).
  */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fitDocs =
    Seq("the cat sat", "the cat sat", "the dog sat").toDF("text")

  private lazy val model =
    NgramLm.fit(fitDocs, "text", n = 3, minCount = 2L)

  private def scoreOf(text: String): Long =
    NgramLm.score(Seq(text).toDF("text"), "text", model)
      .head.getAs[Long]("lm_logprob_q")

  test("fit: pruned table, implicit orders, unpruned total") {
    assert(model.totalTokens == 9L)
    assert(model.n == 3 && model.tokenizerTag == "ascii")
    val m = model.grams.toMap
    assert(m == Map("the" -> 3L, "cat" -> 2L, "sat" -> 3L,
      "the cat" -> 2L, "cat sat" -> 2L, "the cat sat" -> 2L),
      s"unexpected table: $m")
  }

  test("full-order path + doc-start order ramp: 'the cat sat'") {
    // i=0 (o0=1): floor((ln3−ln9)·1e6) = −1098613
    // i=1 (o0=2): "the cat"/"the"  → floor((ln2−ln3)·1e6) = −405466
    // i=2 (o0=3): "the cat sat"/"the cat" → ln2−ln2 = 0
    assert(scoreOf("the cat sat") == -1098613L - 405466L + 0L)
  }

  test("OOV floor + one- and two-level backoff: 'dog cat sat'") {
    // i=0: "dog" pruned → OOV c=1: floor((0−ln9)·1e6) = −2197225
    // i=1 (o0=2): "dog cat" absent → 1·(−916291) + floor((ln2−ln9)·1e6)
    //   = −916291 − 1504078 = −2420369
    // i=2 (o0=3): "dog cat sat" absent → backoff to "cat sat"/"cat":
    //   1·(−916291) + 0
    assert(scoreOf("dog cat sat") == -2197225L - 2420369L - 916291L)
  }

  test("seen bigram absent, both unigrams seen: 'the the'") {
    // i=1 backs off to unigram "the": −916291 + (−1098613)
    assert(scoreOf("the the") == -1098613L - 916291L - 1098613L)
  }

  test("single token, empty, punctuation-only, NULL") {
    assert(scoreOf("sat") == -1098613L)
    assert(scoreOf("") == 0L)
    assert(scoreOf("!!! ???") == 0L) // ascii rule strips to zero tokens
    val r = NgramLm.score(Seq[Option[String]](None).toDF("text"), "text", model)
      .head
    assert(!r.isNullAt(r.fieldIndex("lm_logprob_q")) &&
      r.getAs[Long]("lm_logprob_q") == 0L,
      "NULL text must score 0 (the empty-doc contract), not NULL")
  }

  test("scoreWithNll: floor division by token count; zero-token doc -> NULL") {
    val out = NgramLm.scoreWithNll(
      Seq((1L, "the cat sat"), (2L, ""), (3L, "dog cat sat"))
        .toDF("id", "text"), "text", model)
      .select("id", "lm_logprob_q", "lm_nll_per_tok_q")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out(1L) == Some(1504079L / 3L)) // 501359, floor of 501359.67
    assert(out(2L) == None, "zero-token doc belongs to no distribution")
    assert(out(3L) == Some(5533885L / 3L))
    // NULL text follows the empty-doc contract through the FUSED kernel
    // too: score 0 (not NULL), nll NULL
    val nr = NgramLm.scoreWithNll(
      Seq[(Long, Option[String])]((9L, None)).toDF("id", "text"),
      "text", model).head
    assert(nr.getAs[Long]("lm_logprob_q") == 0L &&
      nr.isNullAt(nr.fieldIndex("lm_nll_per_tok_q")))
  }

  test("fused score+count kernel is identical to the unfused score on every shape") {
    val corpus = Seq("the cat sat", "", "dog cat sat", "sat", "!!! ???",
      "the the the cat cat sat dog unseen words here")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val unfused = NgramLm.score(corpus, "text", model)
      .select("id", "lm_logprob_q").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    NgramLm.scoreWithNll(corpus, "text", model)
      .select("id", "lm_logprob_q").collect().foreach { r =>
        assert(r.getLong(1) === unfused(r.getLong(0)),
          s"fused/unfused drift at id ${r.getLong(0)}")
      }
  }

  test("n=1 degenerates to the unigram model — no penalties ever") {
    val uni = NgramLm.fit(fitDocs, "text", n = 1, minCount = 2L)
    assert(uni.grams.toMap == Map("the" -> 3L, "cat" -> 2L, "sat" -> 3L))
    val s = NgramLm.score(Seq("cat dog").toDF("text"), "text", uni)
      .head.getAs[Long]("lm_logprob_q")
    // cat: floor((ln2−ln9)·1e6) = −1504078; dog OOV: −2197225, penalty 0
    assert(s == -1504078L - 2197225L)
  }

  test("model persistence roundtrip is bit-identical") {
    val dir = tempDir("graft_lm_spec")
    NgramLm.writeModel(spark, model, dir)
    val back = NgramLm.readModel(spark, dir)
    assert(back.tokenizerTag == model.tokenizerTag && back.n == model.n &&
      back.totalTokens == model.totalTokens &&
      back.grams.toMap == model.grams.toMap)
    val s = NgramLm.score(Seq("dog cat sat").toDF("text"), "text", back)
      .head.getAs[Long]("lm_logprob_q")
    assert(s == -2197225L - 2420369L - 916291L)
  }

  test("loud guards: maxEntries cap, empty corpus, stale column, bad model") {
    val capped = intercept[IllegalArgumentException] {
      NgramLm.fit(fitDocs, "text", n = 3, minCount = 1L, maxEntries = 3)
    }
    assert(capped.getMessage.contains("maxEntries"))
    val empty = intercept[IllegalArgumentException] {
      NgramLm.fit(Seq.empty[String].toDF("text"), "text", n = 2)
    }
    assert(empty.getMessage.contains("zero tokens") ||
      empty.getMessage.contains("totalTokens"))
    val stale = intercept[IllegalArgumentException] {
      NgramLm.score(Seq(("x", 1L)).toDF("text", "lm_logprob_q"), "text", model)
    }
    assert(stale.getMessage.contains("lm_logprob_q"))
    intercept[IllegalArgumentException] {
      NgramLm.Model("ascii", 3, 0L, Array(("a", 1L)))
    }
    intercept[IllegalArgumentException] {
      NgramLm.Model("ascii", 3, 5L, Array(("a", 1L), ("a", 2L))).table
    }
  }
}
