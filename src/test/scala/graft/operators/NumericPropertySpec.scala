package graft.operators

import graft.SparkSpec

/** Randomized invariants for the numeric pipeline operators: int8
  * quantization's reconstruction bound and the k-means step's sufficient
  * statistics against in-memory brute force. Deterministic seed: failures
  * reproduce.
  */
class NumericPropertySpec extends SparkSpec {
  import spark.implicits._

  test("int8 quantization reconstructs within half a quantization step") {
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 50).map { i =>
      val dim = 1 + rnd.nextInt(16)
      (i.toLong, Array.fill(dim)((rnd.nextFloat() - 0.5f) * rnd.nextInt(100)))
    }
    val out = Similarity.quantizeInt8(vecs.toDF("vec_id", "embedding"), "embedding")
      .select("vec_id", "q_scale", "q_vec").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Int](2))).toList
    val byId = vecs.toMap
    for ((id, scale, qv) <- out) {
      val orig = byId(id)
      assert(qv.length === orig.length)
      assert(qv.forall(v => v >= -127 && v <= 127), s"vec $id out of range: $qv")
      if (scale > 0) {
        // dequantized element within half a step of the original
        val step = 1.0 / scale
        orig.zip(qv).foreach { case (x, q) =>
          assert(math.abs(x.toDouble - q / scale) <= step / 2 + 1e-12,
            s"vec $id: x=$x q=$q scale=$scale")
        }
      } else assert(qv.forall(_ == 0))
    }
  }

  test("kmeans step matches brute-force assignment and sums on random data") {
    val rnd = new scala.util.Random(11)
    val dim = 6
    val cents = (0 until 4).map(c => c -> Array.fill(dim)(rnd.nextFloat() - 0.5f))
    val pts = (100 until 160).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() - 0.5f)))
    val scale = 1000L

    def cos(a: Array[Float], b: Array[Float]): Double = {
      def d(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
    }
    // brute force mirrors the operator's tie rule: strictly-greater wins, so
    // the FIRST centroid (lowest cid) keeps ties
    val assign = pts.map { case (id, v) =>
      id -> cents.maxBy { case (cid, cv) => (cos(v, cv), -cid) }._1
    }.toMap
    val expected = pts.groupBy { case (id, _) => assign(id) }.map { case (cid, members) =>
      val sums = (0 until dim).map(j =>
        members.map { case (_, v) => math.floor(v(j).toDouble * scale + 0.5).toLong }.sum)
      cid -> ((members.size.toLong, sums))
    }

    val got = Similarity.kmeansStep(pts.toDF("vec_id", "embedding"),
        "vec_id", "embedding", cents, quantScale = scale)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getSeq[Long](2).toIndexedSeq)))
      .toMap
    assert(got.keySet === expected.keySet)
    for ((cid, (n, sums)) <- expected) {
      assert(got(cid)._1 === n, s"cluster $cid count")
      assert(got(cid)._2 === sums, s"cluster $cid sums")
    }
  }

  test("kmeansFit recovers three planted blobs from rough seeds") {
    val rnd = new scala.util.Random(23)
    // well-separated direction blobs (cosine assignment): axis-aligned cones
    val blobMeans = Seq(
      Array(1.0f, 0.05f, 0.05f), Array(0.05f, 1.0f, 0.05f), Array(0.05f, 0.05f, 1.0f))
    val pts = (0 until 90).map { i =>
      val m = blobMeans(i % 3)
      (i.toLong, m.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f))
    }
    // rough seeds: one arbitrary member of each blob
    val seeds = (0 until 3).map(c => c -> pts(c)._2)
    val fitted = Similarity.kmeansFit(pts.toDF("vec_id", "embedding"),
      "vec_id", "embedding", seeds, iters = 3)
    // each fitted centroid's dominant axis is its own blob's axis…
    val axes = fitted.sortBy(_._1).map { case (_, v) => v.indexOf(v.max) }
    assert(axes.toSet === Set(0, 1, 2), s"axes=$axes")
    // …and sits near the blob's true mean direction
    for ((cid, v) <- fitted) {
      val m = blobMeans(axes(cid))
      def d(a: Array[Float], b: Array[Float]) =
        a.zip(b).map { case (p, q) => p.toDouble * q.toDouble }.sum
      val cos = d(v, m) / (math.sqrt(d(v, v)) * math.sqrt(d(m, m)))
      assert(cos > 0.99, s"centroid $cid cos=$cos")
    }
  }
}
