package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the stage a crawl pipeline runs BEFORE any
  * text filter (trafilatura/jusText territory; CommonCrawl WET files
  * are exactly this output). The engine's quality/dedup/PII family all
  * assume extracted text; this closes the gap from raw markup to that
  * surface.
  *
  * SYNTACTIC extractor, deliberately: a streaming-regex pipeline in the
  * Java-regex ∩ RE2 common subset (no backrefs, no lookaround, and the
  * explicit `[ \t\n\r\f]` whitespace class — `\s` means different byte
  * sets in the two engines), so the DuckDB oracle replays the SAME
  * pattern bytes step for step and the output hash-matches. That rules
  * out a real DOM parse — and buys exactly what the corpus pipelines
  * need: deterministic, schema-free, one codegen'd map-side projection
  * per document, zero shuffle at any scale.
  *
  * Extraction rules, in FIXED order (each one regexp_replace, mirrored
  * verbatim by [[extractTextSql]]):
  *   1. `<script>…</script>`, `<style>…</style>` dropped WITH content
  *      (case-insensitive, attribute-tolerant, non-greedy bodies);
  *      HTML comments `<!-- … -->` dropped;
  *   2. block-level open/close tags ([[BlockTags]]) become a newline —
  *      line structure survives for the line-based filters (C4,
  *      CCNet strip-lines);
  *   3. every remaining tag `<…>` becomes a single space;
  *   4. the predefined entities `&lt; &gt; &quot; &#39; &nbsp; &amp;`
  *      decode via plain (non-regex) replaces, `&amp;` LAST so
  *      `&amp;lt;` decodes to the literal `&lt;`, not `<` — the
  *      standard double-decode trap; other escapes pass through;
  *   5. whitespace normalizes: space/tab runs collapse to one space,
  *      spaces around newlines trim, newline RUNS collapse to one (a
  *      run of adjacent block boundaries is one line break — empty
  *      lines are pure noise to the downstream line-based filters),
  *      outer space/newlines trim.
  *
  * What it does NOT do (documented contract, not accident): no charset
  * sniffing (decode upstream), no hex/general numeric entities, no
  * boilerplate REMOVAL (that is [[Boilerplate]]'s cross-document job
  * downstream), no main-content heuristics. NULL html → NULL out.
  */
object Html {

  /** Whitespace class in the Java ∩ RE2 subset (`\s` is NOT: Java's
    * includes `\x0B`, RE2's does not).
    */
  private val W = "[ \\t\\n\\r\\f]"

  /** Block-level tags that imply a line break around their content. */
  val BlockTags: Seq[String] = Seq(
    "p", "div", "br", "li", "tr", "h1", "h2", "h3", "h4", "h5", "h6",
    "table", "ul", "ol", "blockquote", "section", "article", "header",
    "footer", "title")

  // ONE definition of every pattern: the same bytes go to Spark's Java
  // regex engine and (single-quote-escaped) into the DuckDB literal.
  private def containerRe(tag: String): String =
    s"(?is)<$tag($W[^>]*)?>.*?</$tag$W*>"
  private val ScriptRe = containerRe("script")
  private val StyleRe = containerRe("style")
  private val CommentRe = "(?s)<!--.*?-->"
  private val BlockTagRe: String =
    s"(?i)</?(${BlockTags.mkString("|")})($W[^>]*)?/?>"
  private val AnyTagRe = "<[^>]*>"
  // `href` must be preceded by whitespace (or follow `<a ` directly):
  // a bare greedy `[^>]*href` backtracks onto the LAST "href" substring
  // in the tag, so `<a href="a" data-href="b">` extracted "b" and
  // `<a data-href="x">` (no real href) extracted the phantom "x". RE2
  // has no lookbehind, so the guard is the optional greedy
  // `(?:[^>]*$W)?` — on backtrack it can only end at whitespace, which
  // excludes the tail of an attribute NAME like data-href.
  private val HrefRe: String =
    s"(?i)<a$W(?:[^>]*$W)?href$W*=$W*[\"']?([^\"' \\t\\n\\r\\f>]+)"
  private val TitleRe: String = s"(?is)<title($W[^>]*)?>(.*?)</title$W*>"
  private val SpaceRunRe = "[ \\t]+"
  private val NlPadRe = " ?\\n ?"
  private val NlRunRe = "\\n{2,}"

  /** Ordered entity decodes — plain string replaces on BOTH engines
    * (`&amp;` last; see object doc).
    */
  private val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&")

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The extraction pipeline as a column expression (rules in the
    * object doc). One map-side chain of codegen'd regexp_replace calls.
    */
  def extractText(html: Column): Column = {
    val noScript = regexp_replace(html, ScriptRe, " ")
    val noStyle = regexp_replace(noScript, StyleRe, " ")
    val noComment = regexp_replace(noStyle, CommentRe, " ")
    val blocks = regexp_replace(noComment, BlockTagRe, "\n")
    val noTags = regexp_replace(blocks, AnyTagRe, " ")
    val decoded = Entities.foldLeft(noTags) { case (c, (e, ch)) =>
      replace(c, lit(e), lit(ch))
    }
    val ws1 = regexp_replace(decoded, SpaceRunRe, " ")
    val ws2 = regexp_replace(ws1, NlPadRe, "\n")
    val ws3 = regexp_replace(ws2, NlRunRe, "\n")
    trim(ws3, " \n")
  }

  /** The SAME pipeline in DuckDB SQL over expression `c`, built from
    * the same pattern constants so the two can never drift (the
    * [[Tokenizer]] pattern). Dialect notes: DuckDB string literals take
    * backslashes VERBATIM (the emitted `\t`/`\n` are already RE2
    * escapes — no doubling), and the replacement newline is the
    * `chr(10)` EXPRESSION (RE2 replacements have no `\n` escape).
    */
  def extractTextSql(c: String): String = {
    def rr(expr: String, re: String, rep: String): String =
      s"regexp_replace($expr, ${sqlLit(re)}, $rep, 'g')"
    val noScript = rr(c, ScriptRe, "' '")
    val noStyle = rr(noScript, StyleRe, "' '")
    val noComment = rr(noStyle, CommentRe, "' '")
    val blocks = rr(noComment, BlockTagRe, "chr(10)")
    val noTags = rr(blocks, AnyTagRe, "' '")
    val decoded = Entities.foldLeft(noTags) { case (e, (ent, ch)) =>
      s"replace($e, ${sqlLit(ent)}, ${sqlLit(ch)})"
    }
    val ws1 = rr(decoded, SpaceRunRe, "' '")
    val ws2 = rr(ws1, NlPadRe, "chr(10)")
    val ws3 = rr(ws2, NlRunRe, "chr(10)")
    s"trim($ws3, ' ' || chr(10))"
  }

  /** All href targets of `<a …>` tags, in document order, as
    * `array<string>` — the feed for [[Urls.canonicalUrl]]/
    * [[Urls.dedupByUrl]] and any link-graph derivation. Accepts
    * quoted and unquoted attribute values; entity-decodes `&amp;`
    * inside URLs (the one entity that legally appears there).
    */
  def extractLinks(html: Column): Column =
    transform(regexp_extract_all(html, lit(HrefRe), lit(1)),
      u => replace(u, lit("&amp;"), lit("&")))

  /** `extractLinks` in DuckDB SQL over expression `c`. */
  def extractLinksSql(c: String): String =
    s"list_transform(regexp_extract_all($c, ${sqlLit(HrefRe)}, 1), " +
      "u -> replace(u, '&amp;', '&'))"

  /** The `<title>` content (first occurrence), entity-decoded and
    * whitespace-normalized; empty string when absent (NULL only for
    * NULL html) — a metadata column every crawl schema carries.
    */
  def extractTitle(html: Column): Column =
    trim(regexp_replace(
      Entities.foldLeft(regexp_extract(html, TitleRe, 2)) {
        case (c, (e, ch)) => replace(c, lit(e), lit(ch))
      }, "[ \\t\\n\\r\\f]+", " "))

  /** `extractTitle` in DuckDB SQL over expression `c`. */
  def extractTitleSql(c: String): String = {
    val decoded = Entities.foldLeft(
      s"regexp_extract($c, ${sqlLit(TitleRe)}, 2)") {
      case (e, (ent, ch)) => s"replace($e, ${sqlLit(ent)}, ${sqlLit(ch)})"
    }
    s"trim(regexp_replace($decoded, '[ \\t\\n\\r\\f]+', ' ', 'g'))"
  }
}
