package graft.operators

import graft.SparkSpec

/** Randomized equivalence: [[Temporal.asofJoin]] (all three directions ×
  * tolerance on/off) against a brute-force scalar reference, across seeded
  * random keyed timelines — duplicate timestamps on both sides, payload
  * ties at the winning instant, NULL timestamps, keys present on only one
  * side, and empty sides all occur by construction. Deterministic seed:
  * failures reproduce.
  */
class TemporalPropertySpec extends SparkSpec {
  import spark.implicits._

  /** The documented contract, restated imperatively: per direction the
    * winning candidate timestamp, then the greatest payload among rows
    * sharing it; a winner farther than the tolerance is discarded;
    * nearest takes the closer side, equidistant → backward.
    */
  private def reference(left: Seq[(Long, Option[Long], Option[Long])],
      right: Seq[(Long, Option[Long], Option[Long])], dir: String,
      tol: Option[Long]): Map[Long, Option[Long]] =
    left.map { case (id, kOpt, tOpt) =>
      // a NULL key or NULL timestamp on EITHER side matches nothing
      val out = (kOpt, tOpt) match {
        case (None, _) | (_, None) => None
        case (Some(k), Some(t)) =>
          val live = right.collect { case (qid, Some(`k`), Some(qt)) => (qt, qid) }
          val back = {
            val c = live.filter(_._1 <= t)
            if (c.isEmpty) None
            else {
              val wt = c.map(_._1).max
              Some((wt, c.filter(_._1 == wt).map(_._2).max))
            }
          }
          val fwd = {
            val c = live.filter(_._1 >= t)
            if (c.isEmpty) None
            else {
              val wt = c.map(_._1).min
              Some((wt, c.filter(_._1 == wt).map(_._2).max))
            }
          }
          def gate(c: Option[(Long, Long)]) = c.filter { case (qt, _) =>
            tol.forall(x => math.abs(qt - t) <= x)
          }
          val (b, f) = (gate(back), gate(fwd))
          dir match {
            case "backward" => b
            case "forward"  => f
            case "nearest" => (b, f) match {
              case (None, x) => x
              case (x, None) => x
              case (Some((bt, _)), Some((ft, _))) =>
                if (math.abs(ft - t) < math.abs(bt - t)) f else b
            }
          }
      }
      id -> out.map(_._2)
    }.toMap

  /** Brute-force islands: sort live intervals by start, sweep with a
    * running max-end, split when the gap exceeds the tolerance.
    */
  private def bruteIslands(rows: Seq[(Long, Option[Long], Option[Long])],
      gap: Long): Set[(Long, Long, Long, Long)] =
    rows.collect { case (k, Some(s), Some(e)) if e >= s => (k, s, e) }
      .groupBy(_._1).flatMap { case (k, grp) =>
        val sorted = grp.map(g => (g._2, g._3)).sortBy(identity)
        val islands = sorted.foldLeft(List.empty[(Long, Long, Long)]) {
          case (acc, (s, e)) => acc match {
            case (is, ie, n) :: rest if s <= ie + gap =>
              (is, math.max(ie, e), n + 1) :: rest
            case _ => (s, e, 1L) :: acc
          }
        }
        islands.map { case (s, e, n) => (k, s, e, n) }
      }.toSet

  test("mergeIntervals matches brute force over 40 random interval sets") {
    val rnd = new scala.util.Random(777)
    for (trial <- 1 to 40) {
      val n = rnd.nextInt(25)
      def coord(): Option[Long] =
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(20).toLong)
      // duplicates, points (s == e), inverted, and NULL ends by construction
      val rows = Seq.fill(n) {
        val s = coord()
        val e = if (rnd.nextInt(4) == 0) s else coord()
        (1L + rnd.nextInt(2), s, e)
      }
      val gap = rnd.nextInt(4).toLong
      val got = Temporal.mergeIntervals(rows.toDF("key", "s", "e"),
          Seq("key"), "s", "e", gapToleranceMs = gap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got === bruteIslands(rows, gap), s"trial $trial gap=$gap rows=$rows")
    }
  }

  /** Brute interp resample: bucket floor, max per bucket, dense span,
    * floor-division interpolation between surrounding observations.
    */
  private def bruteInterp(rows: Seq[(Long, Option[Long], Long)],
      w: Long): Map[(Long, Long), Option[Long]] = {
    def fd(a: Long, b: Long) = Math.floorDiv(a, b)
    rows.collect { case (k, Some(t), v) => (k, w * fd(t, w), v) }
      .groupBy(_._1).flatMap { case (k, grp) =>
        val sparse = grp.groupBy(_._2).map { case (b, g) => b -> g.map(_._3).max }
        val (b0, b1) = (sparse.keys.min, sparse.keys.max)
        val obs = sparse.keys.toSeq.sorted
        (b0 to b1 by w).map { b =>
          val v: Option[Long] = sparse.get(b).orElse {
            val prev = obs.filter(_ < b).lastOption
            val next = obs.find(_ > b)
            (prev, next) match {
              case (Some(p), Some(nx)) =>
                val (pv, nv) = (sparse(p), sparse(nx))
                Some(pv + fd((nv - pv) * ((b - p) / w), (nx - p) / w))
              case _ => None
            }
          }
          (k, b) -> v
        }
      }
  }

  test("resample interp matches brute force over 30 random series") {
    val rnd = new scala.util.Random(555)
    for (trial <- 1 to 30) {
      val n = 1 + rnd.nextInt(15)
      val w = 1L + rnd.nextInt(5)
      val rows = Seq.fill(n)((1L + rnd.nextInt(2),
        if (rnd.nextInt(10) == 0) Option.empty[Long]
        else Some(rnd.nextInt(40).toLong - 10), // negative timelines too
        rnd.nextInt(100).toLong - 50))          // negative deltas too
      if (rows.exists(_._2.isDefined)) {
        val got = Temporal.resample(rows.toDF("key", "t", "v"),
            Seq("key"), "t", w,
            Seq(org.apache.spark.sql.functions.max(
              org.apache.spark.sql.functions.col("v")).as("mv")),
            fill = "interp")
          .collect().map(r => (r.getLong(0), r.getLong(1)) ->
            (if (r.isNullAt(2)) Option.empty[Long] else Some(r.getLong(2))))
          .toMap
        assert(got === bruteInterp(rows, w), s"trial $trial w=$w rows=$rows")
      }
    }
  }

  test("asofJoin matches brute force over 60 random timelines x 3 directions x tolerance") {
    val rnd = new scala.util.Random(2026)
    for (trial <- 1 to 60) {
      val nl = rnd.nextInt(12)
      val nr = rnd.nextInt(12)
      def ts(): Option[Long] =
        if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(30).toLong)
      def key(): Option[Long] = // NULL keys on BOTH sides, by construction
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(3).toLong)
      val left = (0 until nl).map(i => (i.toLong, key(), ts()))
      val right = (0 until nr).map(i => (100L + i, key(), ts()))
      val tol = if (rnd.nextBoolean()) Some(rnd.nextInt(10).toLong) else None
      val dir = Seq("backward", "forward", "nearest")(trial % 3)

      val got = Temporal.asofJoin(
          left.toDF("id", "key", "t"), right.toDF("qid", "key", "qt"),
          Seq("key"), "t", "qt", Seq("qid"),
          toleranceMs = tol, direction = dir)
        .select("id", "asof_qid").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) Option.empty[Long] else Some(r.getLong(1))))
        .toMap
      val exp = reference(left, right, dir, tol)
      assert(got === exp,
        s"trial $trial dir=$dir tol=$tol\nleft=$left\nright=$right")
    }
  }
}
