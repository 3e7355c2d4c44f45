package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property lock for [[Audio.energyHashTextCol]]: the pure-Catalyst
  * pooled-sample column form must match a scalar reference on random
  * strings including the unicode hazards (CJK, astral-plane surrogate
  * pairs) — the [[ImageDedupPropertySpec]] method applied to the audio
  * surrogate. The reference pins Spark's CODE-POINT string semantics
  * (`codePointCount`/`offsetByCodePoints`, never `charAt`).
  */
class AudioPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Scalar mirror of energyHashTextCol: window j = sum of the 4 code
    * points at floor((4j+m)·n/288), gradient bits, 16-hex packing.
    */
  private def refHash(s: String): String = {
    if (s == null) return ImageDedup.ZeroHash
    val n = s.codePointCount(0, s.length)
    if (n < 1) return ImageDedup.ZeroHash
    val grid = Array.tabulate(Audio.Windows) { j =>
      (0 until Audio.SamplesPerWindow).map { m =>
        val i = (j * Audio.SamplesPerWindow + m).toLong
        s.codePointAt(s.offsetByCodePoints(0,
          ((i * n) / (Audio.Windows * Audio.SamplesPerWindow)).toInt)).toLong
      }.sum
    }
    ImageDedup.hexOf(ImageDedup.dHashBytesFromGrid(grid))
  }

  test("energyHashTextCol matches the pooled code-point scalar reference") {
    val alphabets = Seq(
      "abcdefgh ", "àéîöü çñ", "αβγδε ωψ",
      "日本語漢字テスト", "😀🎉🚀🌍🔥", "a😀b漢c é\t\n")
    val rnd = new scala.util.Random(7)
    val texts: Seq[String] = (Seq("", "x", "ab") ++ (1 to 60).map { _ =>
      val alpha = alphabets(rnd.nextInt(alphabets.length))
      val cps = alpha.codePoints().toArray
      val len = 1 + rnd.nextInt(200)
      new String((0 until len).flatMap(_ =>
        Character.toChars(cps(rnd.nextInt(cps.length)))).toArray)
    }) :+ null
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select(col("id"), Audio.energyHashTextCol(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === refHash(t),
        s"text #$i ${Option(t).map(_.take(30))}")
    }
  }
}
