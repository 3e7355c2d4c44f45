package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-question micro-bench behind the flagBloom probe choice: UDF-per-row
  * early-exit vs native exists(BloomFilterMightContain(xxhash64(g))) — both
  * short-circuit on the first hit; the native one re-enters the HOF lambda
  * per gram, the UDF one crosses the serde boundary once per row. Usage:
  * `sbt "Test/runMain graft.BloomProbeTimer <sfDir> <reps>"`.
  * The number it prints is recorded in [[graft.operators.Decontaminate
  * .flagBloom]]'s probe comment.
  */
object BloomProbeTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val reps = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.ColumnBridge
    import graft.queries.TextQueries

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").cache()
    docs.count()
    val bench = docs.filter(col("doc_id") % 17 === 0)
    val n = 5

    // shared filter: native long build over xxhash64(gram), as in flagBloom
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(100000L, 0.001)
    val bfBytes = graft.operators.Decontaminate.ngramSet(bench, "text", n)
      .select(ColumnBridge.column(new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col("g"))),
        Literal(100000L), Literal(numBits)).toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val bf = org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(bfBytes))
    val bfBc = spark.sparkContext.broadcast(bf)
    val anyHitUdf = udf((grams: Seq[String]) =>
      grams != null && grams.exists { g =>
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(g)
        bfBc.value.mightContainLong(
          org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L))
      })
    def nativeHit(grams: org.apache.spark.sql.Column) =
      exists(grams, g => ColumnBridge.column(BloomFilterMightContain(
        ColumnBridge.expression(lit(bfBytes)),
        ColumnBridge.expression(xxhash64(g)))))

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save() // warmup
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[bloomprobe] $label min=${times.min}%.3f total=${times.sum}%.3f s ($reps reps)")
    }
    val grams = TextQueries.ngramsCol(col("text"), n)
    time("udf-early-exit") {
      docs.withColumn("contaminated", anyHitUdf(grams))
    }
    time("native-exists") {
      docs.withColumn("contaminated", nativeHit(grams))
    }
    spark.stop()
  }
}
