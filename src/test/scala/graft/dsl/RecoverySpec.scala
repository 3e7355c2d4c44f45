package graft.dsl

import java.nio.file.Files

import graft.SparkSpec

/** Exactly-once state: a stateful query stopped and restarted from its
  * checkpoint resumes with state intact and without double-counting — the
  * analog of the reference's EOS offset+state commit
  * (StreamTask.cs:92-110; here: Spark's checkpoint commit log).
  */
class RecoverySpec extends SparkSpec {
  import spark.implicits._

  test("stateful count survives a query restart from checkpoint") {
    val inDir = Files.createTempDirectory("graft_in").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString

    def writeChunk(rows: Seq[(String, Long)], name: String): Unit =
      rows.toDF("key", "v").write.parquet(s"$inDir/$name")

    // file-source stream: each subdirectory write is a new microbatch input
    writeChunk(Seq(("a", 1L), ("a", 2L), ("b", 1L)), "chunk1")

    val schema = "key string, v long"
    def startQuery() = {
      val src = spark.readStream.schema(schema).option("pathGlobFilter", "*.parquet")
        .parquet(s"$inDir/*")
        .as[(String, Long)]
        .map { case (k, v) => KV(k, v, new java.sql.Timestamp(v)) }
      new KStream(src).groupByKey.aggregate(() => 0L)((_, _, acc) => acc + 1L)
        .changelog
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        // foreachBatch sink: supports checkpoint recovery (memory sink doesn't)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Upsert[String, Long]], _: Long) =>
          RecoverySpec.sink.synchronized {
            RecoverySpec.sink ++= batch.collect()
          }
          ()
        }
        .start()
    }

    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    writeChunk(Seq(("a", 3L), ("c", 1L)), "chunk2")
    val q2 = startQuery() // same checkpoint: must resume, not reprocess chunk1
    q2.processAllAvailable()
    q2.stop()

    val rows = RecoverySpec.sink.toSeq
    val latest = rows.groupBy(_.key).map { case (k, us) =>
      k -> us.maxBy(_.ts.getTime).value.get
    }
    // a: 2 (chunk1) + 1 (chunk2) = 3 — state recovered, chunk1 not re-read
    assert(latest("a") === 3L)
    assert(latest("c") === 1L)
  }
}

object RecoverySpec {
  val sink: scala.collection.mutable.ArrayBuffer[Upsert[String, Long]] =
    scala.collection.mutable.ArrayBuffer.empty
}
