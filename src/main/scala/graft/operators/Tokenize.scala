package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable tokenization for the text operators (BM25, TF-IDF, n-grams).
  * Each rule is a pure column expression with a DuckDB mirror (`duckSql`)
  * so every oracle stays bit-exact, and a stable `tag` the inverted index
  * persists in its meta — appends and streaming ingests MUST tokenize the
  * way the base index was built, so they resolve the rule from the meta
  * rather than trusting a caller parameter.
  *
  * Three rules cover the corpus shapes this engine meets:
  *  - [[Tokenizer.House]] — split on single spaces, drop empties. The
  *    original retrieval contract; byte-identical to every pre-existing
  *    oracle entry, and the right rule for pre-normalized corpora.
  *  - [[Tokenizer.Ascii]] — lower-case, split on non-[a-z0-9] runs. The
  *    dedup/fingerprint rule (`TextQueries.tokensCol`), kept as its own
  *    named rule so retrieval and dedup can share one index when wanted.
  *  - [[Tokenizer.Unicode]] — split on non-letter/digit runs by Unicode
  *    category (`\\p{L}\\p{N}`), optional casefold. What a real multilingual
  *    corpus needs: punctuation detaches, scripts beyond ASCII tokenize,
  *    and the regex dialect stays in RE2 ∩ Java so DuckDB mirrors exactly.
  */
sealed trait Tokenizer {
  /** Tokens of a text column, as `array<string>` with no empty entries. */
  def column(text: Column): Column
  /** The SAME rule in DuckDB SQL over expression `c`. */
  def duckSql(c: String): String
  /** Stable id persisted in index meta. */
  def tag: String
}

object Tokenizer {

  case object House extends Tokenizer {
    def column(text: Column): Column = filter(split(text, " "), _ =!= "")
    def duckSql(c: String): String =
      s"list_filter(string_split($c, ' '), x -> x <> '')"
    def tag: String = "house"
  }

  case object Ascii extends Tokenizer {
    def column(text: Column): Column =
      filter(split(regexp_replace(lower(text), "[^a-z0-9]+", " "), " "),
        _ =!= "")
    def duckSql(c: String): String =
      s"list_filter(string_split(regexp_replace(lower($c), '[^a-z0-9]+', " +
        "' ', 'g'), ' '), x -> x <> '')"
    def tag: String = "ascii"
  }

  /** Unicode-category word segmentation. With `casefold` both engines
    * lower-case before splitting; non-ASCII case pairs agree on the
    * common ground (both are Unicode-aware simple case maps) — corpora
    * leaning on locale-sensitive folds (Turkish dotless-ı) should
    * pre-normalize upstream.
    */
  final case class Unicode(casefold: Boolean = true) extends Tokenizer {
    def column(text: Column): Column = {
      val t = if (casefold) lower(text) else text
      filter(split(t, "[^\\p{L}\\p{N}]+"), _ =!= "")
    }
    def duckSql(c: String): String = {
      val t = if (casefold) s"lower($c)" else c
      s"list_filter(regexp_split_to_array($t, '[^\\p{L}\\p{N}]+'), " +
        "x -> x <> '')"
    }
    def tag: String = if (casefold) "unicode_cf" else "unicode"
  }

  /** Resolve a persisted tag back to its rule (index meta roundtrip). */
  def fromTag(tag: String, op: String): Tokenizer = tag match {
    case "house" => House
    case "ascii" => Ascii
    case "unicode_cf" => Unicode(casefold = true)
    case "unicode" => Unicode(casefold = false)
    case other => throw new IllegalArgumentException(
      s"$op: unknown tokenizer tag '$other' in index meta — this build " +
        "knows house/ascii/unicode_cf/unicode; upgrade the library or " +
        "rebuild the index")
  }
}
