package graft.dsl

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}

/** `Topology.Describe()` (`core/Stream/Topology.cs:32`,
  * `core/Stream/Internal/TopologyDescription.cs:34-120`): the reference
  * renders its processor graph as `Topologies:` / `Sub-topology: N` blocks
  * of `Source:` / `Processor:` / `Sink:` nodes with `-->`/`<--`
  * successor/predecessor lines. In this engine the topology IS the
  * Catalyst logical plan, so `describe` renders that plan in the same
  * textual shape — leaf relations as `Source:` nodes (their "topic" the
  * relation's name), interior operators as `Processor:` nodes named
  * `<Operator>-<index>` in the reference's zero-padded style, the root as
  * the terminal node. One sub-topology: Kafka Streams splits
  * sub-topologies at repartition topics, whose Spark analog — exchange
  * boundaries — exists only in the PHYSICAL plan (`Explain` /
  * `df.explain("formatted")` is the authoritative execution view; this is
  * the familiar-looking schema of the dataflow).
  */
object Topology {

  private final case class Node(name: String, kind: String, detail: String,
      children: Seq[Int])

  def describe(ds: Dataset[_]): String = {
    val nodes = scala.collection.mutable.ArrayBuffer[Node]()
    def walk(p: LogicalPlan): Int = {
      val childIdx = p.children.map(walk)
      val idx = nodes.length
      val opName = p.nodeName
      p match {
        case leaf: LeafNode =>
          val topic = leaf.toString.linesIterator.next()
            .replaceAll("^[A-Za-z0-9_]+ ", "").trim match {
              case "" => opName
              case s => s
            }
          nodes += Node(f"$opName-$idx%010d", "Source",
            s"(topics: [${compact(topic)}])", childIdx)
        case _ =>
          nodes += Node(f"$opName-$idx%010d", "Processor", "(stores: [])",
            childIdx)
      }
      idx
    }
    val rootIdx = walk(ds.queryExecution.logical)

    val successor = Array.fill(nodes.length)(Seq.empty[Int])
    nodes.zipWithIndex.foreach { case (n, i) =>
      n.children.foreach(c => successor(c) = successor(c) :+ i)
    }
    def names(xs: Seq[Int]): String =
      if (xs.isEmpty) "none" else xs.map(nodes(_).name).mkString(", ")

    val sb = new StringBuilder
    sb.append("Topologies:\n")
    sb.append("   Sub-topology: 0\n")
    nodes.zipWithIndex.foreach { case (n, i) =>
      sb.append(s"    ${n.kind}: ${n.name} ${n.detail}\n")
      sb.append(s"      --> ${names(successor(i))}\n")
      if (n.kind != "Source")
        sb.append(s"      <-- ${names(n.children)}\n")
    }
    assert(rootIdx == nodes.length - 1) // root renders last by construction
    sb.toString
  }

  private def compact(s: String): String =
    if (s.length <= 60) s else s.take(57) + "..."
}
