package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Proof of the SCALE.md claim that bucketing both fact tables on the join
  * key removes the fact-fact shuffle entirely: write lineitem and orders
  * bucketed by order key, join them, and assert the plan has NO Exchange —
  * the join reads co-located buckets directly. At 100 TB this is the
  * difference between shuffling two fact tables per query and shuffling
  * them once at ingest.
  */
class BucketingSpec extends SparkSpec {

  test("fact-fact join over bucketed tables plans with zero Exchanges") {
    val dir = "/root/testdata/sf0.001"
    // external tables with explicit temp paths: the (static) warehouse dir
    // is never written to
    val wh = Files.createTempDirectory("graft_bucketing").toString
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").option("path", s"$wh/li_b").saveAsTable("li_b")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").option("path", s"$wh/ord_b").saveAsTable("ord_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid broadcast so the test exercises the co-located shuffle-free
      // path a 100 TB fact-fact join would take (neither side broadcastable)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
      val p = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("SortMergeJoin"), p.take(1500))
      // the ONLY Exchange node allowed is the final tiny groupBy(priority) —
      // the join reads co-located buckets with no shuffle on either side
      // (count "(n) Exchange" detail headers = physical Exchange nodes)
      assert("\\(\\d+\\) Exchange".r.findAllIn(p).size == 1,
        "bucketed join must not shuffle either side:\n" + p.take(2000))
      // and it still computes the right thing
      val viaBuckets = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val direct = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaBuckets === direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
