package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALE.md measurement: substring-span dedup under a 100-fold duplicated
  * corpus (every sf0.1 document gains 99 exact twins with offset ids — the
  * crawl-mirror shape). The claim under test: the exact-content collapse
  * keeps the gram stages sized by DISTINCT content, so the 100× corpus
  * costs ~the 1× gram work plus the fan-out join, while the naive path
  * explodes 100× the grams and 100× the hit rows. Usage:
  * `sbt "Test/runMain graft.SpanStressTimer <sfDir> <factor>"`.
  */
object SpanStressTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(100)
    val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Tables.documentsBalanced(spark, sfDir).select("doc_id", "text")
    // factor× corpus: identical text, offset ids, persisted as parquet so
    // scans (and the double tokenize) are as real as the bench's
    val dupDir = SparkSpec.tempDir("span_stress") // removed at JVM exit
    base.select(explode(sequence(lit(0), lit(factor - 1))).as("__k"),
        col("doc_id"), col("text"))
      .select((col("doc_id") + col("__k") * 10000000L).as("doc_id"), col("text"))
      .write.mode("overwrite").parquet(dupDir)
    val corpus = Tables.balanced(spark.read.parquet(dupDir))
    println(s"[spanstress] corpus docs: ${corpus.count()} (${factor}x)")

    def time(label: String, collapse: Boolean, reps: Int): Unit = {
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = graft.operators.SpanDedup
          .duplicateTokenSpans(corpus, "doc_id", "text", collapseExact = collapse)
          .count()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[spanstress] $label rep: span rows=$n wall=$s%.1f s")
        s
      }
      println(f"[spanstress] $label min=${secs.min}%.1f s")
    }
    // 1x reference first (both paths cheap), then the stressed corpus
    def time1x(label: String, collapse: Boolean): Unit = {
      val t0 = System.nanoTime()
      val n = graft.operators.SpanDedup
        .duplicateTokenSpans(base, "doc_id", "text", collapseExact = collapse)
        .count()
      println(f"[spanstress] 1x $label: span rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    time1x("collapsed", collapse = true)
    time1x("naive", collapse = false)
    time(s"${factor}x collapsed", collapse = true, reps = 2)
    time(s"${factor}x naive", collapse = false, reps = 1)
    spark.stop()
  }
}
