package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCALE.md measurement for the round-10 additions — Gopher rules, C4
  * cleaning, boilerplate-prefix strip, overlap-fraction decontamination,
  * temperature mixture — on the established 10× duplicated-content
  * replication recipe (ids offset per copy via doc_id·R+r, text
  * IDENTICAL: every row gains R−1 exact twins, the adversarial
  * duplication case). For the decontamination row: under the id remap
  * the `% 100 == 0` benchmark slice selects (r = 0, id % 10 == 0) —
  * i.e. a 10×-LARGER set of DISTINCT texts, each of which also has 9
  * exact twins sitting in the corpus side (rows with guaranteed 100%
  * overlap) — the gram set grows ~R× and the corpus carries planted
  * full-overlap hits, which is the adversarial direction even though the
  * bench rows themselves are not twinned.
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

    // row count computed ONCE, outside every timed region — an in-loop
    // count() would add a second full corpus scan to each measurement
    val nDocs = docs.count()
    def time(name: String, rows: Long = nDocs)(thunk: => Unit): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        thunk
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[r11scale] $name R=$rep min=${runs.min}%.2f s rows=$rows " +
        runs.map(r => f"$r%.2f").mkString("reps=[", ", ", "]"))
    }

    time("gopher_flags") {
      QualityFilters.gopherFlags(docs, "text")
        .write.format("noop").mode("overwrite").save()
    }
    time("c4_clean") {
      QualityFilters.c4CleanLines(docs, "text")
        .write.format("noop").mode("overwrite").save()
    }
    time("boilerplate_strip") {
      Boilerplate.stripFrequentPrefixes(docs, "doc_id", "text", "source",
          k = 2, minDf = 2L)
        .write.format("noop").mode("overwrite").save()
    }
    locally {
      // see the scaladoc: bench = a 10×-larger distinct slice whose
      // texts also have 9 corpus twins — gram set grows ~R×, corpus
      // carries planted 100%-overlap rows
      val bench = docs.filter(col("doc_id") % 100 === 0)
      val corpus = docs.filter(col("doc_id") % 100 =!= 0)
      val nCorpus = corpus.count()
      time("overlap_stats", rows = nCorpus) {
        Decontaminate.overlapStats(corpus, bench, "doc_id", "text", n = 3)
          .write.format("noop").mode("overwrite").save()
      }
    }
    time("strip_lines") {
      Boilerplate.stripFrequentLines(docs, "doc_id", "text", "source",
          minDf = 2L)
        .write.format("noop").mode("overwrite").save()
    }
    time("bigram_rarity") {
      QualityFilters.bigramRarity(docs, "doc_id", "text", rareMax = 1L)
        .write.format("noop").mode("overwrite").save()
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
    }
    spark.stop()
  }
}
