package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALE.md measurement for the block-max WAND probe: plain index probe
  * vs WAND-pruned probe at R× corpus replication. Replicas get new doc
  * ids AND `r` extra filler tokens (longer docs score lower under BM25's
  * length normalization), so the replicated corpus has the score skew a
  * real web corpus has — top-n quality concentrates in a slice of the
  * doc-id space and block bounds can discriminate. Every run asserts the
  * two probes return identical rows before timing is reported.
  * `sbt "Test/runMain graft.Round13WandScaleTimer <sfDir> <R>"`.
  */
object Round13WandScaleTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rep = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Retrieval

    // "dup" is the corpus's one selective term (df ≈ 5%; everything else
    // in the 31-term synthetic vocabulary sits at ~77% df with saturated
    // tf — a uniform corpus where NO block-bound scheme can discriminate).
    // A query mixing a selective term with a common one is the realistic
    // WAND case: the selective term's idf dominates, so blocks without a
    // competitive "dup" posting bound below θ.
    val query = Seq("dup", "spark", "join")
    // replica r occupies a CONTIGUOUS doc-id range and carries 16·r filler
    // tokens (avg base dl ≈ 54): BM25's length normalization puts padded
    // replicas strictly below the originals, modeling the real skew block
    // pruning exploits — quality correlates with doc-id locality (crawl
    // snapshots, source-ordered ingests). Replica 0 is byte-identical to
    // the base corpus; interleaved ids (the r12 timer's scheme) would put
    // an original in every block and make every bound tie — the documented
    // WAND-adversarial case, handled by the maxSurvivors fallback.
    // Replicas beyond the base also DROP the selective term ("dup" →
    // "dupx"): rare terms concentrate in doc-id ranges in real corpora
    // (crawl increments, source-ordered ingests — the reason production
    // engines reorder doc ids before building block-max indexes), and
    // that concentration is exactly what block bounds exploit. Replica 0
    // is byte-identical to the base corpus, so the top-n answer set is
    // unchanged by replication.
    val docs = (0 until rep)
      .map(r => Tables.documents(spark, sfDir).select("doc_id", "text")
        .withColumn("doc_id", col("doc_id") + lit(r.toLong * (1L << 20)))
        .withColumn("text",
          if (r == 0) col("text")
          else concat(regexp_replace(col("text"), "\\bdup\\b", "dupx"),
            lit(" pad" * (16 * r)))))
      .reduce(_ unionAll _)

    val idx = s"${System.getProperty("java.io.tmpdir")}/r13wand_idx_$rep" +
      "_" + ProcessHandle.current().pid()
    Retrieval.writeTextIndex(docs, "doc_id", "text", idx, blockSize = 128L)

    val plainRows = Retrieval.bm25AgainstIndex(spark, idx, query, 20)
      .collect().map(_.toSeq).toSeq
    val (wandDf, plan) = Retrieval.bm25WandWithPlan(spark, idx, query, 20,
      collectStats = true)
    val wandRows = wandDf.collect().map(_.toSeq).toSeq
    require(plainRows == wandRows,
      s"WAND != plain at R=$rep:\n$plainRows\nvs\n$wandRows")

    // the scale claim in rows, free of fixed job overhead: postings the
    // final scoring job reads, pruned vs plain
    val posts = spark.read.parquet(idx)
      .where(col("term").isNotNull && col("term").isin(query: _*))
    val totalPosts = posts.count()
    val scanned = plan.survivors match {
      case Some(ids) => posts.where(
        call_function("div",
          col("doc_id") - pmod(col("doc_id"), lit(plan.blockSize)),
          lit(plan.blockSize)).isInCollection(ids)).count()
      case None => totalPosts
    }
    println(s"[r13wand] R=$rep blocks=${plan.totalBlocks} " +
      s"survivors=${plan.survivors.map(_.size).getOrElse(-1)} " +
      s"seedBlocks=${plan.seedBlocks} theta=${plan.theta} " +
      s"postings_total=$totalPosts postings_scanned=$scanned")

    def time(name: String)(thunk: => Unit): Unit = {
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); thunk; (System.nanoTime() - t0) / 1e9
      }
      println(f"[r13wand] $name R=$rep min=${runs.min}%.2f s " +
        runs.map(r => f"$r%.2f").mkString("reps=[", ", ", "]"))
    }

    time("plain_probe") {
      Retrieval.bm25AgainstIndex(spark, idx, query, 20)
        .write.format("noop").mode("overwrite").save()
    }
    time("wand_probe") {
      Retrieval.bm25WandAgainstIndex(spark, idx, query, 20)
        .write.format("noop").mode("overwrite").save()
    }
  }
}
