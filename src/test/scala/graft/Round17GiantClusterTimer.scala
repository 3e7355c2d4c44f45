package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALE.md measurement for the LSH star guard at GIANT cluster width
  * (round 17, r16 brief #4): the `hotBucketThreshold` C(1024, 2) bound
  * was argued past R=100× (~100-wide clusters) but never driven. This
  * timer plants ONE `W`-wide near-duplicate cluster (shared 40-token
  * base, unique tail per doc — exact pre-collapse cannot shortcut it)
  * into the sf corpus and drives the full `nearDuplicates` →
  * `connectedComponents` → `dedupNear` path, reporting candidate-pair
  * count vs the threshold math (star: ~bands·(W−1) + spill; unguarded:
  * C(W,2) ≈ 50M at W=10⁴) and the end-to-end walls. A second leg at
  * W=10³ runs with the guard effectively OFF (threshold 10⁶) so the
  * quadratic blowup the guard prevents is itself measured, at a width
  * where materializing C(W,2) is still feasible.
  *
  * `sbt "Test/runMain graft.Round17GiantClusterTimer <sfDir> <W>"`
  */
object Round17GiantClusterTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val width = args.lift(1).map(_.toInt).getOrElse(10000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.Dedup

    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    def planted(w: Int) = {
      val organic = Tables.documentsBalanced(spark, sfDir)
        .select(col("doc_id") + lit(1L << 30) as "doc_id", col("text"))
      (0L until w.toLong).map(i => (i, s"$base tail$i"))
        .toDF("doc_id", "text").unionAll(organic)
    }

    def t[A](f: => A): (A, Double) = {
      val s = System.nanoTime(); val a = f
      (a, (System.nanoTime() - s) / 1e9)
    }

    def leg(w: Int, thr: Int, label: String): Unit = {
      val docs = planted(w).localCheckpoint(true)
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
      val (nCand, tCand) = t(
        Dedup.lshCandidates(sigs, "doc_id", hotBucketThreshold = thr).count())
      val (pairs, tVerify) = t {
        val p = Dedup.nearDuplicates(docs, "doc_id", "text",
          minAgreeFraction = 0.5, hotBucketThreshold = thr)
        (p, p.count())
      }
      val (clusterSize, tCc) = t {
        Dedup.connectedComponents(pairs._1, docs, "doc_id")
          .groupBy("rep").count().orderBy(col("count").desc)
          .limit(1).collect()(0).getLong(1)
      }
      val (nKept, tDedup) = t(
        Dedup.dedupNear(docs, "doc_id", "text", minAgreeFraction = 0.5,
          hotBucketThreshold = thr).count())
      println(f"[r17giant] $label W=$w thr=$thr cand=$nCand " +
        f"(star bound ~${8L * (w - 1)}, unguarded C(W,2)=${w.toLong * (w - 1) / 2}) " +
        f"verified=${pairs._2} giant_cluster=$clusterSize kept=$nKept " +
        f"walls: cand=$tCand%.1f verify=$tVerify%.1f cc=$tCc%.1f dedup=$tDedup%.1f s")
    }

    leg(width, 1024, "guard-on")
    leg(1000, 1000000, "guard-off") // C(1000,2) = 499.5k pairs, measurable
    // same width, guard ENGAGED (1000 < the default 1024 threshold, so
    // the default leg would silently stay quadratic-in-bucket)
    leg(1000, 64, "guard-on-tight")
    spark.stop()
  }
}
