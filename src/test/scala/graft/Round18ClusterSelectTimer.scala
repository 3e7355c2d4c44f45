package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 SCALE measurement: the embedding-cluster selection pair
  * ([[graft.operators.Sampling.clusterBalancedCap]] /
  * [[graft.operators.Sampling.clusterPrototypeDrop]]) at salted volume —
  * (a) the k-means train cost that produces the centroids, (b) wall +
  * shuffle records for each selector, probing the plan claim the
  * PlanSpec locks: the balanced cap's `WindowGroupLimit` runs map-side
  * BEFORE the exchange, so its shuffle carries at most
  * `k·cap·mapPartitions` rows however big the corpus gets, while the
  * prototype drop (whose filter needs the cluster SIZE, unknowable
  * map-side) must shuffle the corpus once — the structural cost gap
  * between the two selectors at 100 TB.
  *
  * `sbt "Test/runMain graft.Round18ClusterSelectTimer <sfDir> <R>"`
  */
object Round18ClusterSelectTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val r = args.lift(1).map(_.toInt).getOrElse(250)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Sampling, Similarity}

    val shufRecs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          shufRecs.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten): Unit
        }
    })
    def phase[A](name: String)(f: => A): A = {
      val s0 = shufRecs.get(); val t0 = System.nanoTime()
      val a = f
      println(f"[r18cs] R=$r $name%-26s wall=${(System.nanoTime() - t0) / 1e9}%6.1fs " +
        f"shuf_rec=${shufRecs.get() - s0}%10d")
      a
    }

    val base = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    // R replicas, ids disjoint; a small deterministic per-replica nudge on
    // one coordinate keeps the replicas from being byte-identical (ties
    // everywhere would make the rank windows degenerate)
    val corpus = (0 until r).map { k =>
      base.select((col("vec_id") + lit(k.toLong * (1L << 32))).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === (k % 64), x + lit(0.001f * (k % 7)))
            .otherwise(x)).as("embedding"))
    }.reduce(_ unionAll _)
      // 32 fat map partitions (~15k rows each): the salted union's
      // natural ~250 thin partitions hold only ~31 rows per cluster —
      // below any useful cap, so the partial WindowGroupLimit would have
      // nothing to prune and the measurement would say nothing about the
      // 100 TB regime (where map partitions dwarf k·cap)
      .repartition(32).localCheckpoint(true)
    val n = corpus.count()
    println(s"[r18cs] R=$r corpus vectors=$n dim=64")

    val k = 64
    val cents = phase("kmeans train (base only)") {
      val seeds = Similarity.kmeansSeedParallel(base, "vec_id", "embedding",
        k, rounds = 3, seed = 18L)
      Similarity.kmeansFit(base, "vec_id", "embedding", seeds, iters = 5)
    }

    // cap chosen so the map-side group-limit bound k*cap*maps (64*100*32
    // = 204,800) sits well BELOW the corpus — the pruning is visible in
    // shuf_rec, not just claimed
    val kept = phase("clusterBalancedCap cap=100") {
      Sampling.clusterBalancedCap(corpus, "vec_id", "embedding", cents, 100)
        .count()
    }
    val diverse = phase("clusterPrototypeDrop 30%") {
      Sampling.clusterPrototypeDrop(corpus, "vec_id", "embedding", cents,
        dropPpm = 300000L).count()
    }
    // reference: the assignment alone (map-side, zero shuffle)
    val assigned = phase("ivfAssign only") {
      Similarity.ivfAssign(corpus, "vec_id", "embedding", cents)
        .agg(sum("centroid_id")).collect()(0)
    }
    println(s"[r18cs] R=$r kept(cap)=$kept kept(diverse)=$diverse " +
      s"assignedSum=${assigned.get(0)}")
    spark.stop()
  }
}
