package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Html]] hand fixtures, one per extraction rule: container removal
  * (including a bare `<` inside a script body), comments, block-tag
  * newlines, entity decode order (the `&amp;lt;` double-decode trap),
  * whitespace normalization, href extraction shapes, title, and the
  * NULL contract. Engine parity of the full pipeline is the
  * `q_html_extract`/`q_html_links` oracles' job.
  */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def text(h: String): Option[String] =
    Option(Seq(Option(h)).toDF("h")
      .select(Html.extractText(col("h"))).collect()(0).getString(0))

  private def title(h: String): String =
    Seq(Tuple1(h)).toDF("h")
      .select(Html.extractTitle(col("h"))).collect()(0).getString(0)

  private def links(h: String): Seq[String] =
    Seq(Tuple1(h)).toDF("h")
      .select(Html.extractLinks(col("h"))).collect()(0).getSeq[String](0)

  test("script/style bodies die with their tags; a bare < inside survives removal") {
    assert(text("a<script>if (x < 3) { f(\"</b>\") }</script>b")
      === Some("a b"))
    assert(text("a<STYLE type=\"css\">p { x: 1 }</style>b") === Some("a b"))
    assert(text("a<!-- note <p> inside -->b") === Some("a b"))
  }

  test("block tags become newlines; inline tags become spaces") {
    assert(text("<h1>Head</h1><p>one</p><p>two</p>")
      === Some("Head\none\ntwo"))
    assert(text("x<br/>y") === Some("x\ny"))
    assert(text("a <b>bold</b> c") === Some("a bold c"))
    // runs of adjacent block boundaries are ONE line break; no empty
    // lines survive (they are pure noise to the line-based filters)
    assert(text("<p>a</p><p></p><p></p><p>b</p>") === Some("a\nb"))
  }

  test("entity decode order: &amp; last, so &amp;lt; stays literal") {
    assert(text("x &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;y")
      === Some("x <tag> \"q\" 's' y"))
    assert(text("a &amp;lt;kept&amp;gt; b") === Some("a &lt;kept&gt; b"))
    assert(text("fish &amp; chips") === Some("fish & chips"))
    // undecoded escapes pass through untouched
    assert(text("a &#x27; b") === Some("a &#x27; b"))
  }

  test("whitespace normalizes; outer space and newlines trim") {
    assert(text("  a   b\t c  ") === Some("a b c"))
    assert(text("<p> padded </p>") === Some("padded"))
  }

  test("href extraction: quoted, single-quoted, unquoted, &amp; decode, order") {
    assert(links("<a href=\"http://a/x?p=1&amp;q=2\">1</a>" +
      "<a href='http://b/'>2</a><a href=/rel/c>3</a>")
      === Seq("http://a/x?p=1&q=2", "http://b/", "/rel/c"))
    assert(links("no links here") === Seq.empty)
    // attribute order tolerated; non-anchor tags ignored
    assert(links("<a class=\"x\" href=\"u1\">t</a><link href=\"u2\">")
      === Seq("u1"))
    // attribute NAMES merely ending in "href" must not match: the real
    // href wins regardless of order, and a tag with ONLY data-href
    // yields no link (the pre-fix pattern extracted "b" and a phantom
    // "x" here via greedy backtrack onto the data-href substring)
    assert(links("<a href=\"a\" data-href=\"b\">t</a>") === Seq("a"))
    assert(links("<a data-href=\"b\" href=\"a\">t</a>") === Seq("a"))
    assert(links("<a data-href=\"x\">t</a>") === Seq.empty)
  }

  test("title: first occurrence, entities decoded, whitespace folded, absent -> empty") {
    assert(title("<title>A &amp; B</title><title>second</title>") === "A & B")
    assert(title("<TITLE lang=\"en\">multi\n  line</TITLE>") === "multi line")
    assert(title("<p>no title</p>") === "")
  }

  test("NULL html stays NULL; empty html extracts to empty") {
    assert(text(null) === None)
    assert(text("") === Some(""))
  }
}
