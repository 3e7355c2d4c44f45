package graft.operators

import java.util.regex.Pattern

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property lock for the curation-filter family (Gopher rules, C4
  * cleaning, boilerplate-prefix strip, overlap-fraction decontamination):
  * on RANDOM corpora — including NULL text, empty strings, unicode
  * (accents, CJK, astral-plane emoji), tabs, newlines, punctuation — each
  * operator's output must equal an independent driver-side scalar
  * implementation of the documented semantics. The DuckDB oracle locks
  * these operators on the shipped ASCII corpus; this spec locks the edge
  * classes that corpus never exercises.
  *
  * The scalar reference deliberately mirrors SPARK's primitive semantics
  * where they are the documented contract:
  *  - `length()` counts CODE POINTS (Java String.length counts UTF-16
  *    units — an emoji word would diverge without codePointCount);
  *  - `trim()` strips the SPACE character only (Java String.trim strips
  *    all control chars ≤ U+0020 — a tab-indented bullet would diverge);
  *  - `split(re)` keeps trailing empty strings (limit −1), then filters;
  *  - `array_intersect` dedupes (stop-word count = DISTINCT stops).
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  // ---- scalar reference primitives (Spark semantics, see class doc) ----

  private def spTrim(s: String): String = {
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    s.substring(b, e)
  }
  private def nChars(s: String): Long = s.codePointCount(0, s.length).toLong
  private def splitKeep(s: String, re: String): Array[String] =
    Pattern.compile(re).split(s, -1)
  private def words(t: String): Array[String] =
    splitKeep(t, "\\s+").filter(_.nonEmpty)
  private def lines(t: String): Array[String] = splitKeep(t, "\n")
  private def find(re: String, s: String): Boolean =
    Pattern.compile(re).matcher(s).find()
  private def countMatches(re: String, s: String): Long = {
    val m = Pattern.compile(re).matcher(s)
    var c = 0L; while (m.find()) c += 1; c
  }
  private def tokens(t: String): Array[String] =
    if (t == null) null
    else t.toLowerCase(java.util.Locale.ROOT).replaceAll("[^a-z0-9]+", " ")
      .split(" ", -1).filter(_.nonEmpty)
  private def grams(toks: Array[String], n: Int): Array[String] =
    if (toks == null || toks.length < n) Array.empty
    else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" ")).toArray

  private val Stop = Set("the", "be", "to", "of", "and", "that", "have", "with")

  private def gopherRef(t: String): (Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean) = {
    if (t == null) return (false, false, false, false, false, false, false)
    val w = words(t); val ls = lines(t)
    val nW = w.length.toLong; val nL = ls.length.toLong
    val sumLen = w.map(nChars).sum
    val bullets = ls.count(l => find("^[-*•]", spTrim(l))).toLong
    val ellLines = ls.count(l => find("\\.\\.\\.\\s*$", l)).toLong
    val hashes = countMatches("#", t)
    val ellipses = countMatches("\\.\\.\\.", t)
    val alphaW = w.count(x => find("[A-Za-z]", x)).toLong
    val stops = w.map(_.toLowerCase(java.util.Locale.ROOT)).toSet.intersect(Stop).size.toLong
    (nW >= 50L && nW <= 100000L,
      3L * nW <= sumLen && sumLen <= 10L * nW,
      hashes * 10L <= nW && ellipses * 10L <= nW,
      bullets * 10L <= nL * 9L,
      ellLines * 10L <= nL * 3L,
      alphaW * 5L >= nW * 4L,
      stops >= 2L)
  }

  private def c4Ref(t: String): (String, Long, Long, Boolean) = {
    if (t == null) return ("", 0L, 0L, false)
    val kept = lines(t).filter { l =>
      find("[.!?\"]\\s*$", l) &&
        words(spTrim(l)).length >= 5 &&
        !l.toLowerCase(java.util.Locale.ROOT).contains("javascript")
    }
    (kept.mkString("\n"), kept.length.toLong, lines(t).length.toLong,
      t.toLowerCase(java.util.Locale.ROOT).contains("lorem ipsum") || t.contains("{"))
  }

  // ---- corpus generator ----

  private val vocab = Array("the", "data", "spark", "row", "batch", "агг",
    "值", "naïve", "café", "x9", "ému", "zz", "Fast", "TABLE", "émigré")
  private val decor = Array("", "...", "#", "##", "\n", "\n- ", "\n* ",
    "\t", "  ", "! ", "? ", ". ", "\"", "{", "javascript", "Lorem Ipsum",
    "😀", "数据流", "...\n", " .")

  private def genDoc(rnd: scala.util.Random): String = {
    if (rnd.nextInt(20) == 0) return null
    if (rnd.nextInt(20) == 1) return ""
    val n = rnd.nextInt(120)
    val sb = new StringBuilder
    for (_ <- 0 until n) {
      sb.append(vocab(rnd.nextInt(vocab.length)))
      sb.append(if (rnd.nextInt(6) == 0) decor(rnd.nextInt(decor.length)) else " ")
    }
    sb.toString
  }

  test("random corpora: gopher flags and C4 outputs equal the scalar reference") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 6) {
      val docs = (0 until 50).map(i => (i.toLong, genDoc(rnd)))
      val df = docs.toDF("doc_id", "text")
      val g = QualityFilters.gopherFlags(df, "text")
        .select("doc_id", "g_word_count", "g_mean_word_len", "g_symbol_ratio",
          "g_bullet_lines", "g_ellipsis_lines", "g_alpha_words", "g_stop_words")
        .collect().map(r => r.getLong(0) ->
          (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
            r.getBoolean(5), r.getBoolean(6), r.getBoolean(7))).toMap
      for ((id, t) <- docs) {
        assert(g(id) === gopherRef(t),
          s"[trial $trial] gopher flags diverge for doc $id: ${Option(t).map(_.take(120))}")
      }
      val c = QualityFilters.c4CleanLines(df, "text")
        .select("doc_id", "c4_text", "c4_lines_kept", "c4_lines_total", "c4_page_drop")
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
      for ((id, t) <- docs) {
        assert(c(id) === c4Ref(t),
          s"[trial $trial] c4 diverges for doc $id: ${Option(t).map(_.take(120))}")
      }
    }
  }

  test("random corpora: boilerplate strip equals the scalar reference") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 6) {
      val k = 1 + rnd.nextInt(3)
      val minDf = 2 + rnd.nextInt(2)
      val docs = (0 until 60).map { i =>
        (i.toLong, s"src${rnd.nextInt(4)}", genDoc(rnd))
      }
      val df = docs.toDF("doc_id", "source", "text")
      // scalar reference
      val toksOf = docs.map { case (id, _, t) => id -> tokens(t) }.toMap
      val prefixOf = docs.map { case (id, src, _) =>
        val tk = toksOf(id)
        id -> (if (tk != null && tk.length >= k) Some(tk.take(k).mkString(" ")) else None)
      }.toMap
      // .toSeq first: collect on a Map producing pairs would rebuild a
      // MAP keyed by src, silently dropping all but one prefix per source
      val freq = docs.groupBy(d => (d._2, prefixOf(d._1))).toSeq
        .collect { case ((src, Some(p)), ds) if ds.size >= minDf => (src, p) }
        .toSet
      val out = Boilerplate.stripFrequentPrefixes(df, "doc_id", "text",
          "source", k, minDf.toLong)
        .select("doc_id", "is_boilerplate", "text_clean")
        .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
      for ((id, src, t) <- docs) {
        val tk = toksOf(id)
        val isBp = prefixOf(id).exists(p => freq((src, p)))
        val clean =
          if (tk == null) ""
          else if (isBp) tk.drop(k).mkString(" ")
          else tk.mkString(" ")
        assert(out(id) === ((isBp, clean)),
          s"[trial $trial k=$k minDf=$minDf] boilerplate diverges for doc $id " +
            s"(${Option(t).map(_.take(100))}): got ${out(id)}, want ($isBp, $clean)")
      }
    }
  }

  test("random corpora: overlapStats equals the scalar reference (incl. 0/0 docs)") {
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 6) {
      val n = 2 + rnd.nextInt(3)
      val corpus = (0 until 40).map(i => (i.toLong, genDoc(rnd)))
      val bench = (100 until 110).map(i => (i.toLong, genDoc(rnd)))
      val benchGrams = bench.flatMap { case (_, t) => grams(tokens(t), n) }.toSet
      val stats = Decontaminate.overlapStats(
          corpus.toDF("doc_id", "text"), bench.toDF("doc_id", "text"),
          "doc_id", "text", n)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(stats.keySet === corpus.map(_._1).toSet,
        s"[trial $trial] every corpus doc must appear, incl. gram-less ones")
      for ((id, t) <- corpus) {
        val g = grams(tokens(t), n).distinct
        val want = (g.length.toLong, g.count(benchGrams).toLong)
        assert(stats(id) === want,
          s"[trial $trial n=$n] overlap diverges for doc $id " +
            s"(${Option(t).map(_.take(100))}): got ${stats(id)}, want $want")
      }
    }
  }
}
