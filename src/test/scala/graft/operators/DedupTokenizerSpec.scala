package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tokenizer threading through the dedup/fingerprint family: the rule is
  * a parameter at BUILD time, a persisted meta tag afterwards — appends,
  * probes, and streaming ingests resolve it from the index and can never
  * drift ([[Retrieval]]'s tokenizer-tag pattern, applied to
  * [[Dedup.writeSignatureIndex]] and friends). The oracle entry
  * `q_dedup_minhash_unicode` locks write+probe cross-engine; this spec
  * locks the RESOLUTION paths (append, probe-side signatures) and the
  * SpanDedup threading the oracle doesn't reach.
  */
class DedupTokenizerSpec extends SparkSpec {
  import spark.implicits._

  // accented text: the ascii rule treats 'á'/'ñ' as separators (splitting
  // words), the unicode rule keeps them — so the two rules shingle these
  // docs differently and any path that silently falls back to ascii
  // produces different signatures
  // docs 1, 2, 4 share EXACT accented text (pairing is deterministic:
  // identical signatures, agreement 32/32) — the drift detection is
  // cross-representation: an append or probe that silently fell back to
  // ascii would band-hash DIFFERENT minima than the unicode side and the
  // identical docs would stop pairing (test 1 proves the sigs differ)
  private val accented = "el niño corre rápido por la calle grande hacia el parque"
  private val docs = Seq(
    (1L, accented),
    (2L, accented),
    (3L, "completely unrelated text with no shared shingles at all here"),
    (4L, accented)
  ).toDF("doc_id", "text")

  private val uni = Tokenizer.Unicode(casefold = true)

  test("minhash signatures differ between ascii and unicode on accented text (the rule is load-bearing)") {
    val a = Dedup.minhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val u = Dedup.minhashSignatures(docs, "doc_id", "text", uni)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(a.keySet == u.keySet)
    assert(a(1L) != u(1L),
      "ascii and unicode must shingle accented text differently")
  }

  test("appendToSignatureIndex resolves the UNICODE rule from the index meta — appended docs pair with probes") {
    val idx = tempDir("sigidx_uni") + "/idx"
    // base: docs 1, 3 under the unicode rule
    Dedup.writeSignatureIndex(docs.filter($"doc_id" === 1 || $"doc_id" === 3),
      "doc_id", "text", idx, tokenizer = uni)
    // append doc 2 WITHOUT passing a tokenizer — must come from the meta
    Dedup.appendToSignatureIndex(docs.filter($"doc_id" === 2),
      "doc_id", "text", idx)
    // probe doc 4: near-dups are 1 (base) and 2 (appended); matches must
    // agree with the direct in-memory unicode computation over the union
    val got = Dedup.dedupAgainstIndex(docs.filter($"doc_id" === 4),
        "doc_id", "text", idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val direct = Dedup.nearDuplicates(docs.filter($"doc_id" =!= 3),
        "doc_id", "text", tokenizer = uni)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .collect { case (a, b, n) if a == 4L => (a, b, n)
                 case (a, b, n) if b == 4L => (b, a, n) }.toSet
    assert(got.nonEmpty, "probe must find the indexed near-dups")
    assert(got === direct,
      s"index probe must equal the direct unicode pipeline: $got vs $direct")
    // the appended doc IS found — proving the append tokenized with the
    // index's rule, not the ascii default
    assert(got.exists(_._2 == 2L),
      "the appended doc must be findable (append resolved the meta rule)")
  }

  test("an ascii-built index and a unicode-built index store different signatures for the same accented doc") {
    val a = tempDir("sigidx_a") + "/idx"
    val u = tempDir("sigidx_u") + "/idx"
    val one = docs.filter($"doc_id" === 1)
    Dedup.writeSignatureIndex(one, "doc_id", "text", a)
    Dedup.writeSignatureIndex(one, "doc_id", "text", u, tokenizer = uni)
    def sigRow(p: String): Seq[Any] =
      spark.read.parquet(p).where($"band" === 0)
        .select((0 until 32).map(j => col(s"m$j")): _*)
        .collect().head.toSeq
    assert(sigRow(a) != sigRow(u),
      "the persisted signatures must reflect the build-time rule")
  }

  test("SpanDedup threads the tokenizer: unicode keeps accented tokens in clean_text") {
    // accented words live in the UNIQUE prefixes (the surviving text), the
    // duplicated span is plain ascii — so the cut is identical under both
    // rules but the remainder's tokenization is not
    val shared = "the quick brown fox jumps over the lazy dog again"
    val spanDocs = Seq(
      (1L, s"único número $shared"),
      (2L, s"séptimo octavo $shared")
    ).toDF("doc_id", "text")
    val cleaned = SpanDedup.removeDuplicateSpans(spanDocs, "doc_id", "text",
        n = 5, minDocs = 2, tokenizer = uni)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned(1L) == "único número" && cleaned(2L) == "séptimo octavo",
      s"unicode must keep the accented prefixes intact and cut the shared span: $cleaned")
    // the ascii rule splits the accented prefixes ('único' -> 'nico'), so
    // the same pipeline yields a different remainder — the rule is live
    val asciiClean = SpanDedup.removeDuplicateSpans(spanDocs, "doc_id",
        "text", n = 5, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(asciiClean(1L) == "nico n mero",
      s"ascii must have split the accented prefix: $asciiClean")
  }
}
