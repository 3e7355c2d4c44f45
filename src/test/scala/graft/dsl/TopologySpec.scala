package graft.dsl

import graft.SparkSpec

/** `Topology.Describe()` rendering (`TopologyDescription.cs:34-120`): the
  * reference's `Topologies:` / `Sub-topology:` / node / `-->` / `<--`
  * shape over the Catalyst plan.
  */
class TopologySpec extends SparkSpec {
  import spark.implicits._

  test("describe renders sources, processors, and edge lines in the reference shape") {
    val s = new KStream(Seq(
      KV("a", 1, new java.sql.Timestamp(1L)),
      KV("b", 2, new java.sql.Timestamp(2L))).toDS())
      .filter((_, v) => v > 0)
      .mapValues(_ * 10)
    val d = s.describe
    val lines = d.linesIterator.toSeq
    assert(lines.head === "Topologies:")
    assert(lines(1) === "   Sub-topology: 0")
    assert(lines.exists(_.matches("""    Source: \w+-\d{10} \(topics: \[.*\]\)""")), d)
    assert(lines.count(_.matches("""    Processor: \w+-\d{10} \(stores: \[\]\)""")) >= 2, d)
    assert(lines.exists(_.trim.startsWith("--> ")), d)
    assert(lines.exists(_.trim.startsWith("<-- ")), d)
    // the terminal node has no successor
    assert(lines.exists(_.trim == "--> none"), d)
    // a join topology renders BOTH sources feeding the join processor
    val t1 = Seq(("a", 1)).toDF("k", "x")
    val t2 = Seq(("a", 2)).toDF("k", "y")
    val dj = Topology.describe(t1.join(t2, "k"))
    assert(dj.linesIterator.count(_.trim.startsWith("Source: ")) === 2, dj)
    val joinPred = dj.linesIterator.toSeq
      .filter(_.trim.startsWith("<-- ")).last
    assert(joinPred.contains(", "), s"join must list two predecessors: $dj")
  }
}
