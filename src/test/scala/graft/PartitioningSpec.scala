package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Partitioned-layout output and partition pruning: a corpus written
  * `partitionBy(lang)` (the standard layout for a multi-language training
  * corpus) must let a language-filtered read skip every other partition's
  * files at PLANNING time — `PartitionFilters` on the scan, not a post-scan
  * filter. At 100 TB with ~30 languages that is a 30× scan reduction before
  * a single byte is read.
  */
class PartitioningSpec extends SparkSpec {

  test("partitionBy write + filtered read prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft_partitioned").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val langs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("lang=")).map(_.getName)
    assert(langs.length > 1, s"need several partitions, got ${langs.toSeq}")

    val one = spark.read.parquet(dir).filter(col("lang") === "en")
      .select("doc_id", "n_chars")
    val p = one.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // pruning happens in the scan's partition filters...
    assert(p.contains("PartitionFilters: [isnotnull(lang"), p.take(1500))
    // ...so no row-level filter on lang remains in the plan
    assert(!p.contains("Filter ("), "lang filter must be partition-pruned, not row-filtered:\n" + p.take(1500))
    // and the scan's SELECTED (post-pruning) file set is only lang=en
    val files = one.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.flatMap(_.selectedPartitions.toPartitionArray.map(_.urlEncodedPath))
    assert(files.nonEmpty && files.forall(_.contains("lang=en")),
      s"scan must touch only lang=en files: ${files.take(3).toSeq}")

    // correctness: the pruned read equals the unpartitioned filter
    val expected = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("lang") === "en").count()
    assert(one.count() === expected)
  }
}
