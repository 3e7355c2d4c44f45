package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCALE.md measurement for the round-10 additions — Gopher rules, C4
  * cleaning, boilerplate-prefix strip, overlap-fraction decontamination,
  * temperature mixture — on the established 10× duplicated-content
  * replication recipe (ids offset per copy, text IDENTICAL: every row
  * gains R−1 exact twins, the adversarial duplication case; the
  * decontamination BENCHMARK slice replicates too, so its gram set grows
  * with the corpus).
  * `sbt "Test/runMain graft.Round11ScaleTimer <sfDir> <R>"` — run with
  * R=1 then R=10 and compare.
  */
object Round11ScaleTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rep = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Boilerplate, Decontaminate, QualityFilters, Sampling}

    def replicate(base: DataFrame, idCol: String): DataFrame =
      (0 until rep).map { r =>
        base.withColumn(idCol, col(idCol) * rep + r)
      }.reduce(_ unionAll _)

    val docs = replicate(Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text"), "doc_id")

    def time(name: String)(thunk: => Long): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = thunk
        (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"[r11scale] $name R=$rep min=${runs.map(_._1).min}%.2f s " +
        f"rows=${runs.head._2} " +
        runs.map(r => f"${r._1}%.2f").mkString("reps=[", ", ", "]"))
    }

    time("gopher_flags") {
      QualityFilters.gopherFlags(docs, "text")
        .write.format("noop").mode("overwrite").save()
      docs.count()
    }
    time("c4_clean") {
      QualityFilters.c4CleanLines(docs, "text")
        .write.format("noop").mode("overwrite").save()
      docs.count()
    }
    time("boilerplate_strip") {
      Boilerplate.stripFrequentPrefixes(docs, "doc_id", "text", "source",
          k = 2, minDf = 2L)
        .write.format("noop").mode("overwrite").save()
      docs.count()
    }
    locally {
      // replicated benchmark: the gram set itself is R× denser — the
      // adversarial direction for the broadcast side
      val bench = docs.filter(col("doc_id") % 100 === 0)
      val corpus = docs.filter(col("doc_id") % 100 =!= 0)
      time("overlap_stats") {
        Decontaminate.overlapStats(corpus, bench, "doc_id", "text", n = 3)
          .write.format("noop").mode("overwrite").save()
        corpus.count()
      }
    }
    time("temperature_mixture") {
      val dt = docs.select(col("doc_id"), col("source"),
        size(graft.queries.TextQueries.tokensCol(col("text")))
          .cast("long").as("n_tokens"))
      val totals = Sampling.domainTokenTotals(dt, col("source"), col("n_tokens"))
      Sampling.mixtureByTokenBudget(dt, col("source"), col("doc_id"),
          col("n_tokens"), Sampling.sqrtTemperatureWeightsPpm(totals),
          budgetTokens = 5000L, precomputedTotals = Some(totals.toMap))
        .write.format("noop").mode("overwrite").save()
      dt.count()
    }
    spark.stop()
  }
}
