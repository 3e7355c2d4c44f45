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

  test("ivfWrite + ivfSearchTopK reads only the nprobe probed cells' files") {
    import graft.operators.Similarity
    import spark.implicits._
    // four well-separated axis clusters -> four populated cells
    val rnd = new scala.util.Random(11)
    def onAxis(axis: Int): Array[Float] = {
      val v = Array.fill(8)((rnd.nextFloat() - 0.5f) * 0.1f)
      v(axis) = 1f + rnd.nextFloat() * 0.1f; v
    }
    val corpus = (0 until 48).map(i => (i.toLong, onAxis(i % 4)))
      .toDF("vec_id", "embedding")
    val cents = (0 until 4).map { a =>
      val v = new Array[Float](8); v(a) = 1f; (a, v)
    }
    val dir = Files.createTempDirectory("graft_ivf").toString
    Similarity.ivfWrite(
      Similarity.ivfAssign(corpus, "vec_id", "embedding", cents), dir)
    val cells = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("centroid_id=")).map(_.getName)
    assert(cells.length === 4, s"expected 4 cell dirs, got ${cells.toSeq}")

    val query = onAxis(2)
    val topk = Similarity.ivfSearchTopK(Similarity.ivfRead(spark, dir),
      "vec_id", "embedding", cents, query, k = 5, nprobe = 2)
    // the cell filter must be a partition filter on the scan, and the
    // SELECTED file set must span at most nprobe cells — the probed ones
    val p = topk.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("PartitionFilters: [centroid_id"), p.take(1500))
    val files = topk.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.flatMap(_.selectedPartitions.toPartitionArray.map(_.urlEncodedPath))
    val touched = files.flatMap(
      _.split("/").find(_.startsWith("centroid_id="))).distinct
    assert(files.nonEmpty && touched.length <= 2,
      s"scan must touch <= nprobe cells, got $touched")
    assert(touched.contains("centroid_id=2"), s"probed cells miss cell 2: $touched")

    // correctness: pruned serving read answers exactly like the in-memory
    // assigned DataFrame
    val direct = Similarity.ivfSearchTopK(
        Similarity.ivfAssign(corpus, "vec_id", "embedding", cents),
        "vec_id", "embedding", cents, query, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val served = topk.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served === direct)

    // the BATCH serving path prunes too: its static probed-cell IN filter
    // restricts the persisted scan to the union of both queries' cells
    val qdf = Seq(100L -> onAxis(1), 101L -> onAxis(2)).toSeq.toDF("qid", "qvec")
    val batch = Similarity.ivfJoinTopK(Similarity.ivfRead(spark, dir), qdf,
      "vec_id", "embedding", "qid", "qvec", cents, k = 5, nprobe = 2)
    // sparkPlan (pre-AQE) exposes the scan directly; AQE only re-plans
    // exchanges, never partition pruning
    val bfiles = batch.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.flatMap(_.selectedPartitions.toPartitionArray.map(_.urlEncodedPath))
    val btouched = bfiles.flatMap(
      _.split("/").find(_.startsWith("centroid_id="))).distinct
    assert(bfiles.nonEmpty && btouched.length <= 4,
      s"batch scan must touch only the probed cells' union, got $btouched")
    assert(btouched.contains("centroid_id=1") && btouched.contains("centroid_id=2"),
      s"probed cells miss the query axes: $btouched")

    // self-contained serving: centroids persisted INSIDE the index under
    // _centroids are invisible to the data read and reload identically
    Similarity.ivfWriteWithCentroids(
      Similarity.ivfAssign(corpus, "vec_id", "embedding", cents), cents, dir)
    val reloaded = Similarity.ivfReadCentroids(spark, dir)
    assert(reloaded.sortBy(_._1).map { case (c, v) => (c, v.toSeq) } ===
      cents.sortBy(_._1).map { case (c, v) => (c, v.toSeq) })
    assert(!Similarity.ivfRead(spark, dir).columns.contains("cvec"),
      "centroid rows must not leak into the index data read")
    val servedAgain = Similarity.ivfSearchTopK(Similarity.ivfRead(spark, dir),
        "vec_id", "embedding", reloaded, query, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(servedAgain === direct)
  }
}
