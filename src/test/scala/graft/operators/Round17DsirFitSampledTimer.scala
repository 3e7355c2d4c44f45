package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALE.md measurement for [[Dsir.fitSampled]] (round 17, r16 brief
  * #6): fit cost and weight stability of the hash-sampled fit vs the
  * full two-scan fit at R× salted replication of the sf0.1 English
  * slice (raw side; target = the German slice — the
  * `Round16DsirScaleTimer` corpus recipe). Reported per R:
  * full-fit wall, sampled-fit wall at perMille ∈ {100, 10}, and two
  * stability metrics against the full fit's weights — max |Δweight| in
  * micro-units over buckets the full fit considers discriminative
  * (|lr| ≥ 0.1 in log-units), and the Gumbel-draw overlap: |top-1000 ∩
  * top-1000| / 1000 under the same seed, the metric that decides
  * whether a sampled fit changes WHAT the pipeline keeps.
  *
  * `sbt "Test/runMain graft.operators.Round17DsirFitSampledTimer <sfDir> <R>"`
  */
object Round17DsirFitSampledTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rep = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.Tables

    val base = Tables.documents(spark, sfDir).select("doc_id", "text", "lang")
    val target = base.where(col("lang") === "de").select("doc_id", "text")
    val rawBase = base.where(col("lang") === "en").select("doc_id", "text")
    // salted replication: replica r shifts ids and perturbs text with a
    // replica-tagged suffix so gram counts grow ~linearly without being
    // literal copies of one shard
    val raw = (0 until rep)
      .map(r => rawBase
        .withColumn("doc_id", col("doc_id") + lit(r.toLong * (1L << 22)))
        .withColumn("text",
          if (r == 0) col("text") else concat(col("text"), lit(s" s$r"))))
      .reduce(_ unionAll _)
    raw.write.format("noop").mode("overwrite").save() // warm

    def t[A](f: => A): (A, Double) = {
      val s = System.nanoTime(); val a = f
      (a, (System.nanoTime() - s) / 1e9)
    }
    val (full, tFull) = t(Dsir.fit(target, raw, "text"))
    def drawIds(m: Dsir.Model): Set[Long] =
      Dsir.resample(raw, "doc_id", "text", m, k = 1000, seed = 17L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val fullDraw = drawIds(full)
    val disc = full.lrMicro.zipWithIndex.filter(x => math.abs(x._1) >= 100000)
    for (pm <- Seq(100, 10)) {
      val (m, tS) = t(Dsir.fitSampled(target, raw, "doc_id", "text", pm))
      val maxD = if (disc.isEmpty) -1L
        else disc.map { case (w, b) => math.abs(m.lrMicro(b) - w) }.max
      val overlap = drawIds(m).intersect(fullDraw).size / 1000.0
      println(f"[r17dsirfit] R=$rep pm=$pm full=$tFull%.2f s sampled=$tS%.2f s " +
        f"disc_buckets=${disc.length} max_dw_micro=$maxD " +
        f"draw_overlap=$overlap%.3f")
    }
    spark.stop()
  }
}
