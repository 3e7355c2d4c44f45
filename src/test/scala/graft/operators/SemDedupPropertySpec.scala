package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property lock for the SemDeDup family: on random corpora, the operator's
  * flags must equal a driver-side brute-force evaluation of the documented
  * policy (nearest-centroid argmax with lowest-cid ties, within-cell
  * dominated-by-earlier EXISTS), for both collapse modes; and semDedupBy
  * must keep exactly one member per brute-force connected component.
  */
class SemDedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private def assign(v: Array[Float], cents: Seq[(Int, Array[Float])]): Int = {
    var best = -1; var bestCos = -2.0
    cents.sortBy(_._1).foreach { case (cid, c) =>
      val cs = cosine(v, c)
      if (cs > bestCos) { best = cid; bestCos = cs }
    }
    best
  }

  test("random corpora: flags equal the brute-force policy in both collapse modes") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 12) {
      val dim = 4 + rnd.nextInt(4)
      val k = 1 + rnd.nextInt(3)
      val n = 8 + rnd.nextInt(24)
      val tau = 0.3 + rnd.nextDouble() * 0.5
      val cents = (0 until k).map(c =>
        c -> Array.fill(dim)((rnd.nextFloat() - 0.5f) * 2f))
      // duplicate-heavy: draw from a small pool so exact twins occur; the
      // pool always contains the ZERO vector, so zero-norm twins (cosine
      // 0/0 = NaN — Java says unpairable, Spark's NaN-is-largest ordering
      // would say duplicate without the exceedsTau guard) are exercised
      val pool = Seq.fill(3 + rnd.nextInt(5))(
        Array.fill(dim)((rnd.nextFloat() - 0.5f) * 2f)) :+
        Array.fill(dim)(0f)
      val rows = (0 until n).map { i =>
        val v = if (rnd.nextBoolean()) pool(rnd.nextInt(pool.size))
          else Array.fill(dim)((rnd.nextFloat() - 0.5f) * 2f)
        (i.toLong, v)
      }
      // brute-force reference: EXISTS earlier same-cell row with cos > tau
      val cells = rows.map { case (id, v) => id -> assign(v, cents) }.toMap
      val expect = rows.map { case (id, v) =>
        id -> rows.exists { case (id2, v2) =>
          id2 < id && cells(id2) == cells(id) && cosine(v2, v) > tau
        }
      }.toMap
      val df = rows.toDF("id", "vec")
      for (collapse <- Seq(true, false)) {
        val got = Similarity.semDedupFlag(df, "id", "vec", cents, tau,
            collapseExact = collapse, dim = dim)
          .select("id", "is_semdup").collect()
          .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
        assert(got === expect,
          s"trial $trial collapse=$collapse tau=$tau k=$k n=$n: $got vs $expect")
      }
      // survivor-policy form: one survivor per brute-force component
      val pairs = for {
        (id1, v1) <- rows; (id2, v2) <- rows
        if id1 < id2 && cells(id1) == cells(id2) && cosine(v1, v2) > tau
      } yield (id1, id2)
      val parent = scala.collection.mutable.Map(rows.map(_._1 -> -1L): _*)
      def find(x: Long): Long = if (parent(x) < 0) x else {
        val r = find(parent(x)); parent(x) = r; r
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val comps = rows.map(_._1).groupBy(find)
      for (collapse <- Seq(true, false)) {
        val survivors = Similarity.semDedupBy(df, "id", "vec", cents, tau,
            keepBy = col("id"), dim = dim, collapseExact = collapse)
          .select("id").collect().map(_.getLong(0)).toSet
        assert(survivors.size === comps.size,
          s"trial $trial collapse=$collapse: one survivor per component")
        comps.foreach { case (_, members) =>
          // keepBy = id -> the MAX id of each component must be the one kept
          assert(survivors.contains(members.max),
            s"trial $trial collapse=$collapse: component $members must keep ${members.max}")
        }
      }
    }
  }
}
