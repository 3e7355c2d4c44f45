package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCALE.md measurement for the round-9 additions — JL projection,
  * shuffleShard, packedBoundaries, incremental sem-index — on the
  * established 10× duplicated-content replication recipe (ids offset per
  * copy, text/vectors IDENTICAL: every row gains R−1 exact twins, the
  * adversarial duplication case).
  * `sbt "Test/runMain graft.Round9ScaleTimer <sfDir> <R>"` — run with R=1
  * then R=10 and compare.
  */
object Round9ScaleTimer {
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
    import graft.operators.{Packing, Sampling, Similarity}

    def replicate(base: DataFrame, idCol: String): DataFrame =
      (0 until rep).map { r =>
        base.withColumn(idCol, col(idCol) * rep + r)
      }.reduce(_ unionAll _)

    val docs = replicate(Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text"), "doc_id")
    val emb = replicate(Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding"), "vec_id")

    def time(name: String)(thunk: => Long): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = thunk
        (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"[r9scale] $name R=$rep min=${runs.map(_._1).min}%.2f s " +
        f"rows=${runs.head._2} " +
        runs.map(r => f"${r._1}%.2f").mkString("reps=[", ", ", "]"))
    }

    time("jl_project") { // q_embed_project shape: every projected coordinate
      emb.select(col("vec_id"),
          posexplode(Similarity.projectJL(col("embedding"), 8)))
        .write.format("noop").mode("overwrite").save()
      emb.count()
    }
    time("jl_serve") { // materialized-projCol serving shape
      val mat = emb.withColumn("proj", Similarity.projectJL(col("embedding"), 16))
      val q = Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") === 0).select("embedding")
        .collect().head.getAs[Seq[Float]](0).toArray
      Similarity.bruteForceTopKProjected(mat, "vec_id", "embedding", q,
        k = 10, outDim = 16, overfetch = 16, projCol = "proj").count()
    }
    time("shuffle_shard") {
      Sampling.shuffleShard(docs, col("doc_id"), nShards = 4, seed = "e1")
        .write.format("noop").mode("overwrite").save()
      docs.count()
    }
    time("packed_boundaries") {
      Packing.packedBoundaries(
          docs.select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("long").as("n_tokens")),
          "doc_id", "source", "n_tokens", tokenBudget = 2048L)
        .write.format("noop").mode("overwrite").save()
      docs.count()
    }
    locally { // incremental sem-index: build + probe + append legs
      val cents = Similarity.collectCentroids(
        Tables.embeddings(spark, sfDir).filter(col("vec_id") < 8),
        "vec_id", "embedding")
      val corpus = emb.filter(col("vec_id") >= 8 * rep)
      val batch = Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") >= 8 && col("vec_id") % 97 === 0)
        .select((col("vec_id") + 100000000L).as("vec_id"), col("embedding"))
      val idx = SparkSpec.tempDir("r9scale_semidx") + s"/idx_$rep"
      time("semidx_build") {
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sessionState.newHadoopConf())
        fs.delete(new org.apache.hadoop.fs.Path(idx), true)
        Similarity.writeSemIndex(corpus, "vec_id", "embedding", cents, idx)
        corpus.count()
      }
      time("semidx_probe") {
        Similarity.semDedupAgainstIndex(batch, "vec_id", "embedding", idx, 0.99).count()
      }
      time("semidx_append") {
        Similarity.appendToSemIndex(batch, "vec_id", "embedding", idx)
        batch.count()
      }
    }
    spark.stop()
  }
}
