package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SCALE.md measurement for the DSIR family ([[Dsir]]): fit cost and
  * scoring cost at 1×/10×/100× corpus replication (salted replicas, the
  * kernel-timer scheme), the fused scoring kernel vs the explode/join
  * column recompute (DsirSpec's parity oracle), and the resample draw.
  * Fit is expected LINEAR in corpus (two scans, B-bounded aggregate);
  * scoring is a map-side projection whose advantage should hold or grow.
  * `sbt "Test/runMain graft.operators.Round16DsirScaleTimer <sfDir> <reps> <R...>"`.
  */
object Round16DsirScaleTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val rs = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
      else Seq(1, 10, 100)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timeMin(f: () => Unit): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.min

    def force(df: DataFrame): Unit = {
      df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("__h"))
        .agg(expr("bit_xor(__h)")).collect(); ()
    }

    // the DsirSpec parity oracle: explode grams, join the model table,
    // sum per doc — what scoring costs WITHOUT the fused kernel
    def scoreByExplode(df: DataFrame, model: Dsir.Model): DataFrame = {
      import spark.implicits._
      val lr = model.lrMicro.zipWithIndex
        .map { case (v, b) => (b.toLong, v) }.toSeq.toDF("__b", "__lr")
      val grams = df.select(col("doc_id"),
          explode(Dsir.gramsCol(col("text"), Tokenizer.Ascii)).as("__g"))
        .select(col("doc_id"),
          pmod(graft.queries.TextQueries.hash32(col("__g")),
            lit(model.buckets.toLong)).as("__b"))
      df.select("doc_id").join(
          grams.join(lr, "__b").groupBy("doc_id").agg(sum("__lr").as("w")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("w"), lit(0L)).as("dsir_weight_q"))
    }

    println("| R | raw docs | fit s (min-of-reps) | score kernel s | score explode/join s | ratio | resample top-1k s |")
    println("|---|---|---|---|---|---|---|")
    rs.foreach { r =>
      val src = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"), col("lang"))
      val rep = (0 until r).map { i =>
        src.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          concat(lit(s"copysalt$i "), col("text")).as("text"), col("lang"))
      }.reduce(_ unionByName _)
      val dir = java.nio.file.Files.createTempDirectory(s"r16d_$r").toString + "/docs"
      rep.repartition(32).write.mode("overwrite").parquet(dir)
      val docs = spark.read.parquet(dir)
      val target = docs.filter(col("lang") === "de")
      val raw = docs.filter(col("lang") === "en").localCheckpoint()
      val n = raw.count()
      var model: Dsir.Model = null
      val tFit = timeMin(() => {
        model = Dsir.fit(target, raw, "text")
      })
      val tK = timeMin(() => force(Dsir.score(raw, "text", model)
        .select("doc_id", "dsir_weight_q")))
      val tE = timeMin(() => force(scoreByExplode(raw, model)))
      val tR = timeMin(() => {
        Dsir.resample(raw, "doc_id", "text", model, k = 1000).count(); ()
      })
      println(f"| $r | $n | $tFit%.2f | $tK%.2f | $tE%.2f | ${tK / tE}%.2f | $tR%.2f |")
    }
    spark.stop()
  }
}
