package graft.dsl

import graft.SparkSpec

/** Stateless operator semantics (reference suites:
  * KStreamFilterTests / KStreamMapTests / KStreamFlatMapTests /
  * KStreamSelectKeyTests / KStreamBranchTests — SURVEY §5).
  */
class KStreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def stream(rows: (String, String, Long)*): KStream[String, String] =
    new KStream(rows.map { case (k, v, t) => KV(k, v, ts(t)) }.toDS())

  test("filter keeps matching, filterNot inverts") {
    val s = stream(("a", "1", 1), ("b", "22", 2), ("c", "333", 3))
    assert(s.filter((_, v) => v.length >= 2).ds.collect().map(_.key).sorted
      === Array("b", "c"))
    assert(s.filterNot((_, v) => v.length >= 2).ds.collect().map(_.key)
      === Array("a"))
  }

  test("map re-keys and re-values; ts preserved") {
    val out = stream(("a", "x", 5)).map((k, v) => (v, k)).ds.collect().head
    assert(out.key === "x" && out.value === "a" && out.ts === ts(5))
  }

  test("mapValues preserves key") {
    val out = stream(("a", "x", 1)).mapValues(_.toUpperCase).ds.collect().head
    assert(out.key === "a" && out.value === "X")
  }

  test("flatMapValues explodes values under same key") {
    val out = stream(("k", "a b", 1)).flatMapValues(_.split(" ").toSeq)
      .ds.collect().map(_.value).sorted
    assert(out === Array("a", "b"))
  }

  test("flatMap can re-key each output") {
    val out = stream(("k", "a b", 1))
      .flatMap((_, v) => v.split(" ").map(w => (w, 1)).toSeq)
      .ds.collect().map(r => (r.key, r.value)).sortBy(_._1)
    assert(out === Array(("a", 1), ("b", 1)))
  }

  test("selectKey changes only the key") {
    val out = stream(("a", "xyz", 1)).selectKey((_, v) => v.length).ds.collect().head
    assert(out.key === 3 && out.value === "xyz")
  }

  test("branch: ordered predicates, first match wins, no record twice") {
    val s = stream(("a", "1", 1), ("b", "12", 2), ("c", "123", 3))
    val Seq(short, medium) = s.branch(
      (_, v) => v.length <= 1,
      (_, v) => v.length <= 2)
    assert(short.ds.collect().map(_.key) === Array("a"))
    assert(medium.ds.collect().map(_.key) === Array("b")) // "a" consumed by branch 0
  }

  test("merge unions two streams") {
    val m = stream(("a", "1", 1)).merge(stream(("b", "2", 2)))
    assert(m.ds.collect().map(_.key).sorted === Array("a", "b"))
  }

  test("groupByKey count / reduce / aggregate (batch facade)") {
    val s = stream(("a", "1", 1), ("a", "2", 2), ("b", "5", 3))
    val counts = s.groupByKey.count.changelog.collect()
      .map(u => u.key -> u.value.get).toMap
    assert(counts === Map("a" -> 2L, "b" -> 1L))

    val sums = s.mapValues(_.toInt).groupByKey
      .aggregate(() => 0)((_, v, acc) => acc + v)
      .changelog.collect().map(u => u.key -> u.value.get).toMap
    assert(sums === Map("a" -> 3, "b" -> 5))

    // reduce folds in event-time order
    val reduced = s.groupByKey.reduce(_ + "," + _)
      .changelog.collect().map(u => u.key -> u.value.get).toMap
    assert(reduced === Map("a" -> "1,2", "b" -> "5"))
  }

  test("stateful ops drop null-key records; stateless ops pass them through") {
    // reference rule: KStreamReduceProcessor.cs:20-24 (drop) vs stateless pass
    val s = new KStream(Seq(
      KV(null.asInstanceOf[String], "x", ts(1)), KV("a", "y", ts(2))).toDS())
    assert(s.mapValues(_.toUpperCase).ds.count() === 2) // stateless keeps null key
    val counts = s.groupByKey.count.changelog.collect().map(_.key)
    assert(counts.toSeq === Seq("a")) // stateful drops it
  }

  test("aggregate result timestamp is the max input ts") {
    val s = stream(("a", "1", 7), ("a", "2", 3))
    val up = s.groupByKey.count.changelog.collect().head
    assert(up.ts === ts(7))
  }

  test("invalid-timestamp policies: Fail aborts, LogAndSkip drops, UseRecordMetadata falls back") {
    // the extractor yields the (negative) value for key "bad"; it must not
    // close over the spec class (not serializable), hence the raw lambda
    val s = stream(("ok", "5", 5), ("bad", "-1", 99))
    val extract = (_: String, v: String) => new java.sql.Timestamp(v.toLong)

    // default policy = Fail (the reference's FailOnInvalidTimestamp)
    val failing = s.withTimestamp(extract)
    val ex = intercept[org.apache.spark.SparkException] { failing.ds.collect() }
    assert(ex.getMessage.contains("Invalid") ||
      Option(ex.getCause).exists(_.getMessage.contains("Invalid")))

    // LogAndSkip drops only the invalid record
    val kept = s.withTimestamp(extract, InvalidTimestampPolicy.LogAndSkip)
      .ds.collect()
    assert(kept.map(_.key).toSeq === Seq("ok") && kept.head.ts === ts(5))

    // UseRecordMetadata keeps the record with its original (source) ts
    val fallback = s.withTimestamp(extract, InvalidTimestampPolicy.UseRecordMetadata)
      .ds.collect().map(r => r.key -> r.ts).toMap
    assert(fallback === Map("ok" -> ts(5), "bad" -> ts(99)))
  }

  test("repartition hash-partitions by key without changing contents") {
    val s = stream(("a", "1", 1), ("b", "2", 2), ("a", "3", 3))
    val rep = s.repartition(8)
    assert(rep.ds.rdd.getNumPartitions === 8)
    // same-key rows co-locate (hash partitioning on the key column)
    val parts = rep.ds.rdd.mapPartitionsWithIndex { (i, it) =>
      it.map(r => r.key -> i) }.collect().groupBy(_._1)
    assert(parts("a").map(_._2).distinct.length === 1)
    assert(rep.ds.collect().map(_.value).sorted === Array("1", "2", "3"))
  }
}
