package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property lock for [[ImageDedup.dHashTextCol]]: the pure-Catalyst
  * column form must match a scalar reference on RANDOM strings including
  * the unicode hazards that distinguish engine string semantics — CJK,
  * combining marks, and astral-plane emoji (surrogate pairs, where
  * code-point and UTF-16-unit indexing diverge).
  *
  * The scalar reference pins SPARK's semantics deliberately (the
  * CurationPropertySpec lesson): `length`/`substr`/`ascii` operate on
  * CODE POINTS, so the reference samples via `codePointCount` /
  * `offsetByCodePoints`, never `String.length`/`charAt`.
  */
class ImageDedupPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Scalar mirror of dHashTextCol: code-point pixel at
    * floor(i·n/72), gradient bits, 16-hex packing.
    */
  private def refHash(s: String): String = {
    if (s == null) return ImageDedup.ZeroHash
    val n = s.codePointCount(0, s.length)
    if (n < 1) return ImageDedup.ZeroHash
    val grid = Array.tabulate(72) { i =>
      val cp = s.codePointAt(s.offsetByCodePoints(0, ((i.toLong * n) / 72).toInt))
      cp.toLong
    }
    ImageDedup.hexOf(ImageDedup.dHashBytesFromGrid(grid))
  }

  test("dHashTextCol matches the code-point scalar reference on random unicode corpora") {
    val alphabets = Seq(
      "abcdefgh ",                 // plain ASCII
      "àéîöü çñ",                  // latin + combining-free accents
      "αβγδε ωψ",                  // greek
      "日本語漢字テスト",           // CJK
      "😀🎉🚀🌍🔥",                 // astral plane (surrogate pairs)
      "a😀b漢c é\t\n"              // mixed with whitespace controls
    )
    val rnd = new scala.util.Random(42)
    val texts: Seq[String] = (Seq("", "x") ++ (1 to 60).map { _ =>
      val alpha = alphabets(rnd.nextInt(alphabets.length))
      val cps = alpha.codePoints().toArray
      val len = 1 + rnd.nextInt(200)
      new String((0 until len).flatMap(_ =>
        Character.toChars(cps(rnd.nextInt(cps.length)))).toArray)
    }) :+ null
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select(col("id"), ImageDedup.dHashTextCol(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === refHash(t),
        s"text #$i ${Option(t).map(_.take(30))}")
    }
  }
}
