package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.BpeQueries

/** [[Bpe]] hand fixtures: training on the classic Sennrich-style corpus
  * with every merge derived by hand (including tie-breaks), the greedy
  * lowest-(rank, position) encode order, unknown-token ids, model
  * roundtrip, and the loud model guards. Engine parity of the encode
  * path is the `q_bpe_tokens`/`q_bpe_pack`/`q_bpe_mixture` oracles' job.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def enc(model: Bpe.Model, text: String): (Seq[String], Seq[Long]) = {
    val r = Seq(Tuple1(text)).toDF("t")
      .select(Bpe.tokens(col("t"), model).as("tk"),
        Bpe.ids(col("t"), model).as("id"),
        Bpe.tokenCount(col("t"), model).as("n"))
      .collect()(0)
    val toks = r.getSeq[String](0)
    val ids = r.getSeq[Long](1)
    assert(r.getLong(2) === toks.length.toLong) // count ≡ tokens length
    (toks, ids)
  }

  // low×3 lower×2 newest×4 widest×1 — hand-derived merge sequence:
  //   iter1: (w,e)=6 wins outright
  //   iter2: (l,o)=5 ties (s,t)=5, left-asc tie-break → (l,o)
  //   iter3: (s,t)=5
  //   iter4: (n,e)=(e,we)=(we,st)=4, left-asc → (e,we)
  private lazy val tiny: Bpe.Model = Bpe.fit(
    Seq("low low low lower lower", "newest newest newest newest widest")
      .toDF("text"),
    "text", numMerges = 4, minPairCount = 1L)

  test("fit learns the hand-derived merges with deterministic tie-breaks") {
    assert(tiny.merges === Seq("w" -> "e", "l" -> "o", "s" -> "t", "e" -> "we"))
    assert(tiny.vocab === Seq("<unk>", "d", "e", "i", "l", "n", "o", "r",
      "s", "t", "w", "we", "lo", "st", "ewe"))
  }

  test("encode follows lowest-(rank, position), not training segmentation") {
    // "lowest" was never a training word: (w,e)r0 → (l,o)r1 → (s,t)r2
    assert(enc(tiny, "lowest") === ((Seq("lo", "we", "st"), Seq(12L, 11L, 13L))))
    // "newest": after (w,e), rank 2 (s,t) fires BEFORE rank 3 (e,we)
    // even though (e,we) sits earlier in the word
    assert(enc(tiny, "newest")._1 === Seq("n", "ewe", "st"))
    // unknown characters stay single and map to <unk> = 0
    assert(enc(tiny, "xyz") === ((Seq("x", "y", "z"), Seq(0L, 0L, 0L))))
    // multi-word text concatenates per-word streams in order
    assert(enc(tiny, "low widest")._1 ===
      Seq("lo", "w", "w", "i", "d", "e", "st"))
    // empty text → empty stream, count 0 (legal zero-token doc)
    assert(enc(tiny, "") === ((Seq.empty[String], Seq.empty[Long])))
  }

  test("FixedModel exercises rank-beats-position and merged right sides") {
    // (e,r) rank 13 fires before (q,u) rank 22: q,u,er → qu,er → quer → query
    assert(enc(BpeQueries.FixedModel, "query")._1 === Seq("query"))
    // (s,t) 17 then (f,a) 29 then (fa,st) 30 — right side is a product
    assert(enc(BpeQueries.FixedModel, "fast")._1 === Seq("fast"))
    // (a,t) 18 → (b,at) 31 → (bat,c) → (batc,h)
    assert(enc(BpeQueries.FixedModel, "batch")._1 === Seq("batch"))
    // partial merges stop where no rule applies: d,a,ta ((t,a) rank 0
    // beats (a,t) rank 18 at the overlapping position)
    assert(enc(BpeQueries.FixedModel, "data")._1 === Seq("d", "a", "ta"))
  }

  test("fit stops at minPairCount and honors the dictionary cap loudly") {
    val one = Bpe.fit(Seq("ab cd").toDF("text"), "text", numMerges = 10,
      minPairCount = 2L)
    assert(one.merges.isEmpty) // best pair count 1 < 2: no merge learned
    intercept[IllegalArgumentException] {
      Bpe.fit(Seq("a b c d e f").toDF("text"), "text", numMerges = 1,
        maxDictWords = 3)
    }
  }

  test("model roundtrip is lossless; meta carries the tokenizer rule") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_spec")
      .toString + "/model"
    Bpe.writeModel(spark, tiny, dir)
    val back = Bpe.readModel(spark, dir)
    assert(back === tiny)
    assert(back.tokenizerTag === Tokenizer.Ascii.tag)
    assert(enc(back, "lowest") === enc(tiny, "lowest"))
  }

  test("model guards stay loud") {
    intercept[IllegalArgumentException] { // vocab(0) must be <unk>
      Bpe.Model("ascii", Seq("a" -> "b"), Seq("a", "b", "ab"))
    }
    intercept[IllegalArgumentException] { // duplicate vocab entry
      Bpe.Model("ascii", Seq.empty, Seq("<unk>", "a", "a"))
    }
    intercept[IllegalArgumentException] { // merge product missing from vocab
      Bpe.Model("ascii", Seq("a" -> "b"), Seq("<unk>", "a", "b"))
    }
    intercept[IllegalArgumentException] { // duplicate merge pair
      Bpe.Model("ascii", Seq("a" -> "b", "a" -> "b"),
        Seq("<unk>", "a", "b", "ab"))
    }
  }

  test("NULL text stays NULL through all three encode columns") {
    val r = Seq(Tuple1(Option.empty[String])).toDF("t")
      .select(Bpe.tokens(col("t"), tiny).as("tk"),
        Bpe.ids(col("t"), tiny).as("id"),
        Bpe.tokenCount(col("t"), tiny).as("n"))
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }
}
