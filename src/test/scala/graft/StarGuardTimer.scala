package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-question micro-bench for SCALE.md's 100× stress: MinHash near-dup
  * pairs on a duplicated corpus with the star guard OFF (default threshold
  * 1024 — buckets of 100 twins stay quadratic-per-bucket) vs ON (threshold
  * 64 — every twin bucket star-links), plus the activation count: how many
  * (band, bucket) runs exceed the threshold. Usage:
  * `sbt "Test/runMain graft.StarGuardTimer <sfDir> <threshold>"`.
  */
object StarGuardTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf0.1_x100")
    val threshold = args.lift(1).map(_.toInt).getOrElse(64)
    val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documentsBalanced(spark, sfDir)

    // activation count: (band, bucket) groups whose DISTINCT id count
    // exceeds the threshold — each is one star-guard activation
    val sigs = graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text")
      .localCheckpoint(true)
    val bandHashes = array((0 until 8).map { b =>
      md5(concat_ws(",", (0 until 4).map(r => col(s"m${b * 4 + r}")): _*))
    }: _*)
    val buckets = sigs.select(col("doc_id"), posexplode(bandHashes).as(Seq("band", "bh")))
      .groupBy("band", "bh").agg(countDistinct("doc_id").as("n"))
    val hot = buckets.filter(col("n") > threshold).count()
    val total = buckets.count()
    println(s"[starguard] threshold=$threshold hot_buckets=$hot of $total")

    def time(label: String, thr: Int): Unit = {
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup.nearDuplicates(docs, "doc_id", "text",
        minAgreeFraction = 0.5, hotBucketThreshold = thr)
      val n = pairs.count()
      println(f"[starguard] $label pairs=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    time(s"guard-on(thr=$threshold)", threshold)
    time("default(thr=1024)", 1024)
    spark.stop()
  }
}
