package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Tokenizer rules ([[Tokenizer]]): segmentation contracts, the index-meta
  * tag roundtrip (appends must tokenize like the base build), and the
  * unknown-tag refusal.
  */
class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  private def toksOf(t: Tokenizer, s: String): Seq[String] =
    Seq(s).toDF("x").select(t.column(col("x"))).collect()
      .head.getSeq[String](0)

  test("the three rules segment as documented") {
    val messy = "Héllo, wörld!  foo_bar 42x"
    assert(toksOf(Tokenizer.House, messy) ===
      Seq("Héllo,", "wörld!", "foo_bar", "42x"))
    assert(toksOf(Tokenizer.Ascii, messy) ===
      Seq("h", "llo", "w", "rld", "foo", "bar", "42x"))
    assert(toksOf(Tokenizer.Unicode(casefold = true), messy) ===
      Seq("héllo", "wörld", "foo", "bar", "42x"))
    assert(toksOf(Tokenizer.Unicode(casefold = false), messy) ===
      Seq("Héllo", "wörld", "foo", "bar", "42x"))
    // empties drop under every rule; House keeps the ",," NON-empty token
    // (it only splits on spaces — that is its contract)
    assert(toksOf(Tokenizer.House, "  ,,  ") === Seq(",,"))
    Seq[Tokenizer](Tokenizer.Ascii, Tokenizer.Unicode())
      .foreach(t => assert(toksOf(t, "  ,,  ") === Seq.empty, t.tag))
  }

  test("tags roundtrip; unknown tags are refused loudly") {
    Seq[Tokenizer](Tokenizer.House, Tokenizer.Ascii,
        Tokenizer.Unicode(casefold = true), Tokenizer.Unicode(casefold = false))
      .foreach(t => assert(Tokenizer.fromTag(t.tag, "spec") === t))
    val e = intercept[IllegalArgumentException](
      Tokenizer.fromTag("bpe9000", "spec"))
    assert(e.getMessage.contains("unknown tokenizer tag"))
  }

  test("appends tokenize with the BASE build's rule, resolved from meta") {
    val idx = java.nio.file.Files.createTempDirectory("tokidx").toString + "/idx"
    val docs = Seq((0L, "Spark, spark."), (1L, "SPARK!")).toDF("doc_id", "text")
    Retrieval.writeTextIndex(docs.where($"doc_id" === 0), "doc_id", "text",
      idx, nBuckets = 2, tokenizer = Tokenizer.Unicode(casefold = true))
    Retrieval.appendToTextIndex(docs.where($"doc_id" === 1), "doc_id", "text", idx)
    // under the house rule doc 1's token would be "SPARK!" and never match
    val got = Retrieval.bm25AgainstIndex(spark, idx, Seq("spark"), 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(0L, 1L))
  }
}
