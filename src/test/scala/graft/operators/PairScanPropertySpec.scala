package graft.operators

import graft.SparkSpec

/** Randomized equivalence: the streaming sorted-run pair scanner
  * ([[Lsh.scanRuns]]) against in-memory brute-force references, across many
  * seeded-random bucket multisets — duplicate rows, singleton buckets, hot
  * buckets straddling the threshold, and the unbounded opt-out all occur by
  * construction. Deterministic seed: failures reproduce.
  */
class PairScanPropertySpec extends SparkSpec {
  import spark.implicits._

  private def bruteCandidates(rows: Seq[(String, Long)],
      threshold: Int): Set[(Long, Long)] =
    rows.groupBy(_._1).values.flatMap { grp =>
      val ids = grp.map(_._2).distinct.sorted
      if (threshold > 0 && ids.size > threshold)
        ids.tail.map(i => (ids.head, i)) // star on the min id
      else
        for { i <- ids.indices; j <- i + 1 until ids.size }
          yield (ids(i), ids(j))
    }.toSet

  test("candidatePairs matches brute force on 25 random bucket multisets") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 25) {
      val n = 1 + rnd.nextInt(40)
      val rows = Seq.fill(n)((s"b${rnd.nextInt(6)}", rnd.nextInt(12).toLong))
      val threshold = rnd.nextInt(5) // 0 = unbounded all-pairs
      val got = Lsh.candidatePairs(rows.toDF("bh", "id"), "id", Seq("bh"), threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === bruteCandidates(rows, threshold),
        s"trial $trial threshold=$threshold rows=$rows")
    }
  }

  private def bruteJaccard(rows: Seq[(Long, String, String)],
      maxDf: Int): Set[(Long, Long, Long, Long)] = {
    val kept = rows.distinct
      .groupBy(r => (r._2, r._3))
      .filter { case (_, rs) => rs.map(_._1).distinct.size <= maxDf }
      .values.flatten.toSeq
    val docSets = kept.groupBy(_._1)
      .map { case (d, rs) => d -> rs.map(r => (r._2, r._3)).toSet }
    (for {
      a <- docSets.keys; b <- docSets.keys if a < b
      i = (docSets(a) & docSets(b)).size if i > 0
      u = docSets(a).size + docSets(b).size - i
      if i * 10 >= u
    } yield (a, b, i.toLong, u.toLong)).toSet
  }

  test("ngramJaccardPairsOf matches brute force on 25 random shingle sets") {
    import graft.queries.TextQueries
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 25) {
      val n = 1 + rnd.nextInt(60)
      val rows = Seq.fill(n)((rnd.nextInt(8).toLong,
        s"src${rnd.nextInt(2)}", s"sh${rnd.nextInt(10)}"))
      val maxDf = 1 + rnd.nextInt(5)
      val got = TextQueries
        .ngramJaccardPairsOf(rows.toDF("doc_id", "source", "s"), maxDf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got === bruteJaccard(rows, maxDf),
        s"trial $trial maxDf=$maxDf rows=$rows")
    }
  }

  test("packSequences invariants hold on 15 random corpora") {
    import graft.operators.Packing
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 15) {
      val budget = 1 + rnd.nextInt(20)
      val rows = (0 until 1 + rnd.nextInt(40)).map { i =>
        (i.toLong, s"g${rnd.nextInt(3)}",
          Seq.fill(1 + rnd.nextInt(8))("t").mkString(" "))
      }
      val out = Packing
        .packSequences(rows.toDF("doc_id", "source", "text"),
          "doc_id", "text", "source", budget.toLong)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // every doc appears exactly once, nothing dropped
      assert(out.map(_._1).sorted === rows.map(_._1).toArray)
      for ((grp, docs) <- out.groupBy(_._2)) {
        val byId = docs.sortBy(_._1)
        // seq ids are non-decreasing in doc order and start at 0
        assert(byId.head._4 === 0L, s"trial $trial group $grp")
        assert(byId.sliding(2).forall {
          case Array(a, b) => b._4 >= a._4; case _ => true })
        // a pack only exceeds the budget via its FIRST doc (an overweight
        // doc gets its own pack; the greedy fill never overshoots mid-pack)
        for ((_, members) <- byId.groupBy(_._4)) {
          val tokens = members.sortBy(_._1).map(_._3)
          val fills = tokens.scanLeft(0L)(_ + _).tail
          assert(fills.init.forall(_ < budget + tokens.max),
            s"trial $trial group $grp overfilled: $tokens budget=$budget")
        }
      }
    }
  }

  test("hash sampling is invariant to partitioning and repeated runs") {
    import graft.operators.Sampling
    graft.functions.Md5Prefix32.register(spark)
    val rows = (0 until 500).map(i => (i.toLong, s"v$i"))
    val df = rows.toDF("id", "v")
    def ids(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      Sampling.hashSample(d, org.apache.spark.sql.functions.col("id"), perMille = 200)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val base = ids(df)
    assert(base.nonEmpty && base.size < 500)
    assert(ids(df.repartition(17)) === base) // layout-independent
    assert(ids(df.coalesce(1)) === base)
    assert(ids(df) === base)                 // run-to-run deterministic
  }

  test("connectedComponents matches driver-side union-find on 20 random graphs") {
    import graft.operators.Dedup
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 20) {
      val nNodes = 2 + rnd.nextInt(40)
      val nEdges = rnd.nextInt(50)
      val nodes = (0L until nNodes).toSeq
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter { case (a, b) => a != b }
      // brute force: path-compressed union-find, then min id per root
      val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      val minOfRoot = nodes.groupBy(find).map { case (r, ms) => r -> ms.min }
      val want = nodes.map(n => n -> minOfRoot(find(n))).toMap
      // both execution paths must match the reference: the driver
      // union-find fast path (default threshold) AND the distributed
      // star-contraction loop (threshold 0)
      for (threshold <- Seq(Dedup.SmallGraphMaxEdges, 0L)) {
        val pairsDf =
          if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("ida", "idb")
          else edges.toDF("ida", "idb")
        val got = Dedup.connectedComponents(pairsDf, nodes.toDF("doc_id"),
          "doc_id", smallGraphMaxEdges = threshold)
        val gotMap = got.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(gotMap === want,
          s"trial $trial threshold=$threshold nodes=$nNodes edges=$edges")
      }
    }
  }
}
