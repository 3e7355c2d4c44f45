package graft.dsl

import graft.SparkSpec

/** Join semantics (KStreamKStreamJoinTests / KStreamKTableJoinTests /
  * KTableKTableJoinTests / GlobalKTableJoinTests analogs — SURVEY §2.5).
  */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def stream(rows: (String, String, Long)*): KStream[String, String] =
    new KStream(rows.map { case (k, v, t) => KV(k, v, ts(t)) }.toDS())

  test("stream-stream windowed inner join matches within [ts-before, ts+after]") {
    // reference flow: KStreamKStreamJoinTests.cs:18-52
    val left = stream(("test", "test", 1000))
    val right = stream(("test", "coucou", 1500), ("test", "late", 9999))
    val out = left.join(right, JoinWindows.of(1000))((v1, v2) => s"$v2-$v1")
      .ds.collect()
    assert(out.map(_.value).toSeq === Seq("coucou-test"))
    // result ts = max of the two inputs (KStreamKStreamJoinProcessor.cs:58-61)
    assert(out.head.ts === ts(1500))
  }

  test("stream-stream left join emits joiner(v, None) for unmatched left") {
    val left = stream(("a", "l1", 1000), ("b", "l2", 1000))
    val right = stream(("a", "r1", 1200))
    val out = left.leftJoin(right, JoinWindows.of(500))((v, o) => s"$v/${o.getOrElse("null")}")
      .ds.collect().map(_.value).sorted
    assert(out === Array("l1/r1", "l2/null"))
  }

  test("stream-stream outer join emits both unmatched sides") {
    val left = stream(("a", "l", 1000))
    val right = stream(("b", "r", 1000))
    val out = stream(("a", "l", 1000)).outerJoin(right, JoinWindows.of(500)) {
      (l, r) => s"${l.getOrElse("-")}/${r.getOrElse("-")}"
    }.ds.collect().map(r => (r.key, r.value)).sorted
    assert(out === Array(("a", "l/-"), ("b", "-/r")))
  }

  test("stream-table join: stream-side driven, no output on table update") {
    val table = new KTable(Seq(
      Upsert("k", Some("t1"), ts(100)),
      Upsert("k", Some("t2"), ts(300))).toDS())
    val s = stream(("k", "s1", 200), ("k", "s2", 400), ("x", "s3", 500))
    val out = s.join(table)((v, t) => s"$v@$t").ds.collect()
      .map(r => r.value).sorted
    // s1 at ts 200 sees t1; s2 at 400 sees t2; x has no table row -> dropped
    assert(out === Array("s1@t1", "s2@t2"))
  }

  test("stream-table left join keeps unmatched stream records") {
    val table = new KTable(Seq(Upsert("k", Some("t"), ts(100))).toDS())
    val s = stream(("k", "a", 200), ("y", "b", 200))
    val out = s.leftJoin(table)((v, t) => s"$v@${t.getOrElse("null")}")
      .ds.collect().map(_.value).sorted
    assert(out === Array("a@t", "b@null"))
  }

  test("table-table inner join: latest values join; missing side -> tombstone") {
    val l = new KTable(Seq(
      Upsert("k", Some("l1"), ts(1)), Upsert("z", Some("lz"), ts(2))).toDS())
    val r = new KTable(Seq(Upsert("k", Some("r1"), ts(3))).toDS())
    val joined = l.join(r)((a, b) => s"$a+$b").view.collect().toMap
    assert(joined === Map("k" -> "l1+r1"))
  }

  test("table-table left join: right side optional") {
    val l = new KTable(Seq(
      Upsert("k", Some("l1"), ts(1)), Upsert("z", Some("lz"), ts(2))).toDS())
    val r = new KTable(Seq(Upsert("k", Some("r1"), ts(3))).toDS())
    val joined = l.leftJoin(r)((a, b) => s"$a+${b.getOrElse("null")}")
      .view.collect().toMap
    assert(joined === Map("k" -> "l1+r1", "z" -> "lz+null"))
  }

  test("table-table outer join: removed only when both sides null") {
    val l = new KTable(Seq(
      Upsert[String, String]("k", Some("l1"), ts(1)), Upsert[String, String]("k", None, ts(5))).toDS())
    val r = new KTable(Seq(
      Upsert("k", Some("r1"), ts(3)), Upsert("w", Some("rw"), ts(4))).toDS())
    val joined = l.outerJoin(r) { (a, b) =>
      s"${a.getOrElse("-")}/${b.getOrElse("-")}"
    }.view.collect().toMap
    // k: left tombstoned at ts5 but right still present -> "-/r1"
    assert(joined === Map("k" -> "-/r1", "w" -> "-/rw"))
  }

  test("fk join: result keyed by left key, looked up via fk(value)") {
    // orders (key=orderkey, value=(custkey, price)) fk-join customers
    val orders = new KTable(Seq(
      Upsert("o1", Some(("c1", 10)), ts(1)),
      Upsert("o2", Some(("c2", 20)), ts(2)),
      Upsert("o3", Some(("c1", 30)), ts(3)),
      Upsert("o4", Some(("cX", 40)), ts(4))).toDS()) // dangling fk
    val cust = new KTable(Seq(
      Upsert("c1", Some("alice"), ts(1)),
      Upsert("c2", Some("bob"), ts(2))).toDS())
    val out = orders.fkJoin(cust)(_._1)((o, name) => s"$name:${o._2}")
      .view.collect().toMap
    assert(out === Map("o1" -> "alice:10", "o2" -> "bob:20", "o3" -> "alice:30"))
  }

  test("fk left join keeps dangling references with None") {
    val orders = new KTable(Seq(
      Upsert("o1", Some(("c1", 10)), ts(1)),
      Upsert("o4", Some(("cX", 40)), ts(4))).toDS())
    val cust = new KTable(Seq(Upsert("c1", Some("alice"), ts(1))).toDS())
    val out = orders.fkLeftJoin(cust)(_._1)(
      (o, n) => s"${n.getOrElse("?")}:${o._2}").view.collect().toMap
    assert(out === Map("o1" -> "alice:10", "o4" -> "?:40"))
  }

  test("fk join follows an fk change to the new referenced row") {
    // o1 moves c1 -> c2: the batch view must show only the new reference
    val orders = new KTable(Seq(
      Upsert("o1", Some(("c1", 10)), ts(1)),
      Upsert("o1", Some(("c2", 10)), ts(5))).toDS())
    val cust = new KTable(Seq(
      Upsert("c1", Some("alice"), ts(1)),
      Upsert("c2", Some("bob"), ts(2))).toDS())
    val out = orders.fkJoin(cust)(_._1)((o, name) => name).view.collect().toMap
    assert(out === Map("o1" -> "bob"))
  }

  test("global-table join uses the key mapper (foreign key)") {
    val dim = new GlobalKTable(Seq((1, "NATION_1"), (2, "NATION_2")).toDS())
    val s = stream(("c1", "1", 10), ("c2", "2", 20), ("c3", "99", 30))
    val out = s.join(dim, (_: String, v: String) => v.toInt)((v, n) => n)
      .ds.collect().map(r => (r.key, r.value)).sorted
    assert(out === Array(("c1", "NATION_1"), ("c2", "NATION_2")))
    val left = s.leftJoin(dim, (_: String, v: String) => v.toInt)(
      (v, n) => n.getOrElse("?")).ds.collect().map(_.value).sorted
    assert(left === Array("?", "NATION_1", "NATION_2"))
  }
}
