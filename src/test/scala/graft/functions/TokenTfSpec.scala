package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[TokenTf]] must be value-exact to the explode/groupBy pipeline it
  * replaces in the inverted-index build (`explode(tokens)` →
  * `groupBy(doc_id, dl, term).count`) — the BM25 oracle entries ride on
  * that parity. Checked per tokenizer tag on the real corpus plus the
  * edge shapes (NULL text, empty, separator-only, unicode, repeats).
  */
class TokenTfSpec extends SparkSpec {
  import spark.implicits._

  private def tokCol(tag: String) =
    graft.operators.Tokenizer.fromTag(tag, "TokenTfSpec")
      .column(col("text"))

  /** (doc_id, term, tf, dl) via the OLD explode/groupBy pipeline. */
  private def oldForm(df: DataFrame, tag: String): DataFrame =
    df.select(col("doc_id"), tokCol(tag).as("__w"))
      .select(col("doc_id"), size(col("__w")).cast("long").as("dl"),
        explode(col("__w")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .select("doc_id", "term", "tf", "dl")

  /** The same rows via the fused kernel. */
  private def newForm(df: DataFrame, tag: String): DataFrame =
    df.select(col("doc_id"),
        TokenTf.tokenTf(col("text"), tag).as("__t"))
      .select(col("doc_id"), col("__t.dl").as("dl"),
        explode(col("__t.tfs")).as("__p"))
      .select(col("doc_id"), col("__p.term").as("term"),
        col("__p.tf").as("tf"), col("dl"))

  private def assertParity(df: DataFrame, tag: String): Unit = {
    val old = oldForm(df, tag).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val neu = newForm(df, tag).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(neu === old, s"tokenizer tag '$tag'")
  }

  test("parity with explode/groupBy on the real corpus, all tokenizer tags") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    Seq("house", "ascii", "unicode_cf", "unicode").foreach(assertParity(docs, _))
  }

  test("edge shapes: empty, separator-only, repeats, punctuation, unicode") {
    val df = Seq(
      (1L, ""), // zero tokens
      (2L, "   "), // separator-only
      (3L, "a a a b b c"), // repeats
      (4L, "Hash, JOIN; spark... hash!"), // case + punctuation
      (5L, "déjà vu déjà Σπάρτη"), // non-ASCII letters
      (6L, " leading and trailing "),
      (7L, "single")
    ).toDF("doc_id", "text")
    Seq("house", "ascii", "unicode_cf", "unicode").foreach(assertParity(df, _))
  }

  test("NULL text yields a NULL struct (row drops out of the explode)") {
    val df = Seq((1L, Option("a b")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      TokenTf.tokenTf(col("text"), "house").as("__t"))
    assert(out.where(col("__t").isNull).select("doc_id")
      .collect().map(_.getLong(0)).toSeq === Seq(2L))
    // and the exploded form drops the row, like explode(NULL array)
    assert(newForm(df, "house").select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("zero tokens is (0, []), not NULL — the doc still counts in stats") {
    val df = Seq((1L, "")).toDF("doc_id", "text")
    val r = df.select(TokenTf.tokenTf(col("text"), "house").as("__t"))
      .select(col("__t.dl"), size(col("__t.tfs"))).collect().head
    assert(r.getLong(0) === 0L && r.getInt(1) === 0)
  }

  test("tf entries are first-occurrence ordered and counts sum to dl") {
    val df = Seq((1L, "b a b c a b")).toDF("doc_id", "text")
    val r = df.select(TokenTf.tokenTf(col("text"), "house").as("__t"))
      .select(col("__t.dl").as("dl"),
        col("__t.tfs").as("tfs")).collect().head
    assert(r.getLong(0) === 6L)
    val entries = r.getSeq[org.apache.spark.sql.Row](1)
      .map(e => (e.getString(0), e.getLong(1)))
    assert(entries === Seq(("b", 3L), ("a", 2L), ("c", 1L)))
  }
}
