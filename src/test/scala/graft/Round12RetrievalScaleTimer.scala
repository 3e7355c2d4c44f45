package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCALE.md measurement for BM25 retrieval: one-shot corpus ranking vs
  * the persisted inverted index probe, under 10× document replication
  * (new doc ids, same text — every replica matches the query, the
  * adversarial direction for posting volume). The probe's claim: cost
  * is |postings of the query terms| read from pruned bucket partitions,
  * never a corpus scan/tokenize. `sbt "Test/runMain
  * graft.Round12RetrievalScaleTimer <sfDir> <R>"`.
  */
object Round12RetrievalScaleTimer {
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

    val query = Seq("hash", "join", "spark", "window")
    val docs = (0 until rep)
      .map(r => Tables.documents(spark, sfDir).select("doc_id", "text")
        .withColumn("doc_id", col("doc_id") * rep + r))
      .reduce(_ unionAll _)

    def time(name: String)(thunk: => Unit): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); thunk; (System.nanoTime() - t0) / 1e9
      }
      println(f"[r12retr] $name R=$rep min=${runs.min}%.2f s " +
        runs.map(r => f"$r%.2f").mkString("reps=[", ", ", "]"))
    }

    time("bm25_oneshot") {
      Retrieval.bm25Rank(docs, "doc_id", "text", query, 20)
        .write.format("noop").mode("overwrite").save()
    }
    val idx = s"${System.getProperty("java.io.tmpdir")}/r12retr_idx_$rep" +
      "_" + ProcessHandle.current().pid()
    time("index_build") {
      Retrieval.writeTextIndex(docs, "doc_id", "text", idx)
    }
    time("index_probe") {
      Retrieval.bm25AgainstIndex(spark, idx, query, 20)
        .write.format("noop").mode("overwrite").save()
    }
  }
}
