package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCALE.md measurement for the round-12 additions on the established 10×
  * duplicated-content replication recipe (ids offset per copy via
  * doc_id·R+r, text IDENTICAL — every row gains R−1 exact twins). For
  * image dedup this is the adversarial direction: every replicated doc's
  * dHash collides exactly, so every band bucket's duplicate groups grow
  * R× and the verified pair set grows ~R²× inside each cluster (bounded
  * by the hot-bucket star guard at production settings).
  * `sbt "Test/runMain graft.Round12ScaleTimer <sfDir> <R>"` — run with
  * R=1 then R=10 and compare.
  */
object Round12ScaleTimer {
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
    import graft.operators.ImageDedup

    def replicate(base: DataFrame, idCol: String): DataFrame =
      (0 until rep).map { r =>
        base.withColumn(idCol, col(idCol) * rep + r)
      }.reduce(_ unionAll _)

    val docs = replicate(Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text"), "doc_id")
    val nDocs = docs.count()
    def time(name: String, rows: Long = nDocs)(thunk: => Unit): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        thunk
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[r12scale] $name R=$rep min=${runs.min}%.2f s rows=$rows " +
        runs.map(r => f"$r%.2f").mkString("reps=[", ", ", "]"))
    }

    // production settings: guarded hot-bucket threshold (the star guard is
    // exactly what absorbs the R× bucket growth), default maxHamming
    val hashed = docs.select(col("doc_id"),
      ImageDedup.dHashTextCol(col("text")).as("dhash"))
    time("image_dedup_clusters") {
      ImageDedup.imageClusters(hashed, "doc_id", "dhash")
        .write.format("noop").mode("overwrite").save()
    }

    // 64-bit SimHash text clustering on the same Hamming stack: under
    // duplication every replicated doc's signature is identical, so the
    // exact-hash pre-collapse bounds pair volume by distinct signatures
    time("simhash64_cluster") {
      val hashed = graft.operators.Dedup.simhash64(docs, "doc_id", "text")
      ImageDedup.imageClusters(hashed, "doc_id", "simhash64", maxHamming = 3)
        .write.format("noop").mode("overwrite").save()
    }

    // incremental image-index probe: corpus indexed once, a ~1% batch
    // probed against it — the pruned-scan shape whose cost must track the
    // BATCH, not the corpus
    locally {
      val hashed = docs.select(col("doc_id"),
        ImageDedup.dHashTextCol(col("text")).as("dhash"))
      val corpus = hashed.filter(col("doc_id") % 100 =!= 0)
      val batch = hashed.filter(col("doc_id") % 100 === 0)
      val dir = java.nio.file.Files
        .createTempDirectory("graft_imgidx_scale").toString + "/idx"
      ImageDedup.writeImageHashIndex(corpus, "doc_id", "dhash", dir)
      time("image_index_probe") {
        ImageDedup.dedupAgainstImageIndex(batch, "doc_id", "dhash", dir)
          .write.format("noop").mode("overwrite").save()
      }
      // the big-corpus layout: one-byte band values saturate their
      // 256-value domain under heavy duplication (every probe key
      // matches ~N/256 index rows); two-byte bands keep the probe
      // tracking the batch — at Manku's Hamming ≤ 3 radius
      val dir16 = java.nio.file.Files
        .createTempDirectory("graft_imgidx_scale16").toString + "/idx"
      ImageDedup.writeImageHashIndex(corpus, "doc_id", "dhash", dir16,
        bandBits = 16)
      time("image_index_probe_16bit") {
        ImageDedup.dedupAgainstImageIndex(batch, "doc_id", "dhash", dir16,
            maxHamming = 3)
          .write.format("noop").mode("overwrite").save()
      }
    }

    // staged-materialization crossover: the one-plan pipeline replays its
    // map-side cleaning subtree ~4×; the staged form pays two scratch
    // parquet round-trips instead. R = 1 only: replication blows the
    // in-pipeline benchmark slice up 10× (10× more DISTINCT bench texts
    // over a ~40-word vocabulary), its 3-gram set then covers essentially
    // every corpus doc past the 20% threshold, and the pipeline correctly
    // drops the whole corpus — a degenerate input, not a timing subject.
    // Vary the SF instead (the crossover table in SCALE.md).
    if (rep > 1) return
    time("pipeline3_oneplan") {
      graft.queries.CompositeQueries.curationPipeline3(docs, stagedDir = None)
        .write.format("noop").mode("overwrite").save()
    }
    def rmRec(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(rmRec)
      f.delete(): Unit
    }
    time("pipeline3_staged") {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_pipe3_scale").toString
      try
        graft.queries.CompositeQueries
          .curationPipeline3(docs, stagedDir = Some(dir))
          .write.format("noop").mode("overwrite").save()
      finally rmRec(new java.io.File(dir))
    }
    time("pipeline4_oneplan") {
      graft.queries.CompositeQueries.curationPipeline4(docs, stagedDir = None)
        .write.format("noop").mode("overwrite").save()
    }
    time("pipeline4_staged") {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_pipe4_scale").toString
      try
        graft.queries.CompositeQueries
          .curationPipeline4(docs, stagedDir = Some(dir))
          .write.format("noop").mode("overwrite").save()
      finally rmRec(new java.io.File(dir))
    }
  }
}
