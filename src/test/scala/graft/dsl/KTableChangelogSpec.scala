package graft.dsl

import graft.SparkSpec

/** Changelog semantics — the reference's hardest behaviors (SURVEY §7.4):
  * upsert-by-key materialization, tombstones, KTable.GroupBy Change
  * emission, KGroupedTable add/subtract aggregation with
  * subtractor-null-deletes (KGroupedTableAggTests / KTableFilterTests
  * analogs).
  */
class KTableChangelogSpec extends SparkSpec {
  import spark.implicits._

  private def changelog(rows: (String, Option[String], Long)*): KTable[String, String] =
    new KTable(rows.map { case (k, v, t) => Upsert(k, v, ts(t)) }.toDS())

  private def view(t: KTable[String, String]): Map[String, String] =
    t.view.collect().toMap

  test("table materialization: latest value per key wins") {
    val s = new KStream(Seq(
      KV("a", "v1", ts(1)), KV("a", "v2", ts(5)), KV("b", "w", ts(2)),
      KV("a", "old", ts(3))).toDS())
    val latest = s.toTable.view.collect().toMap
    assert(latest === Map("a" -> "v2", "b" -> "w"))
  }

  test("tombstone deletes the key from the view") {
    val t = changelog(("a", Some("x"), 1), ("a", None, 2), ("b", Some("y"), 3))
    assert(view(t) === Map("b" -> "y"))
  }

  test("KTable.filter: failing rows become tombstones") {
    val t = changelog(("a", Some("keep"), 1), ("b", Some("drop-me"), 2))
      .filter((_, v) => !v.startsWith("drop"))
    assert(view(t) === Map("a" -> "keep"))
  }

  test("KTable.mapValues transforms the view") {
    val t = changelog(("a", Some("x"), 1)).mapValues(_.toUpperCase)
    assert(t.view.collect().toMap === Map("a" -> "X"))
  }

  test("KGroupedTable.count: +1 on add, -1 on subtract (update moves the key)") {
    // user table keyed by user -> group by region; a moves region r1 -> r2
    val t = changelog(
      ("u1", Some("r1"), 1), ("u2", Some("r1"), 2), ("u1", Some("r2"), 3))
    val counts = t.groupBy((k, region) => (region, k)).count
      .view.collect().toMap
    assert(counts === Map("r1" -> 1L, "r2" -> 1L))
  }

  test("KGroupedTable.count: tombstone subtracts only") {
    val t = changelog(("u1", Some("r1"), 1), ("u2", Some("r1"), 2), ("u1", None, 3))
    val counts = t.groupBy((k, region) => (region, k)).count.view.collect().toMap
    assert(counts === Map("r1" -> 1L))
  }

  test("KGroupedTable.aggregate: adder + subtractor over value updates") {
    // sum of per-user amounts per region, with an amount update for u1
    val t = new KTable(Seq(
      Upsert("u1", Some(("r1", 10)), ts(1)),
      Upsert("u2", Some(("r1", 5)), ts(2)),
      Upsert("u1", Some(("r1", 7)), ts(3))).toDS())
    val sums = t.groupBy((k, v) => (v._1, v._2))
      .aggregate(() => 0)((_, v, acc) => acc + v)((_, v, acc) => acc - v)
      .view.collect().toMap
    assert(sums === Map("r1" -> 12)) // 10 + 5 - 10 + 7
  }

  test("KGroupedTable.reduce adder/subtractor") {
    val t = new KTable(Seq(
      Upsert("u1", Some(("r1", 10)), ts(1)),
      Upsert("u2", Some(("r1", 5)), ts(2)),
      Upsert[String, (String, Int)]("u2", None, ts(3))).toDS())
    val sums = t.groupBy((k, v) => (v._1, v._2))
      .reduce(_ + _, _ - _)
      .view.collect().toMap
    assert(sums === Map("r1" -> 10)) // 10 + 5 - 5
  }

  test("KTable.toStream emits updates, drops tombstones") {
    val t = changelog(("a", Some("1"), 1), ("a", None, 2), ("b", Some("2"), 3))
    val out = t.toStream.ds.collect().map(r => (r.key, r.value)).sorted
    assert(out === Array(("a", "1"), ("b", "2")))
  }
}
