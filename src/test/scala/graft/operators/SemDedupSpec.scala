package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SemDeDup (Abbas et al. arXiv:2303.09540) — cluster-scoped semantic dedup:
  * the dominated-by-earlier keep policy, cell isolation, and the LSH-blocked
  * candidate mode's subset relationship to the exact within-cell pair set.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val r2 = (math.sqrt(0.5)).toFloat

  test("dominated-by-earlier: a chain removes every dominated row, keeps the head") {
    // one cell; cos(a,b) = cos(b,c) = 0.707 > tau, cos(a,c) = 0 < tau.
    // EXISTS semantics: c is dominated by b even though b is itself removed.
    val df = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(r2, r2, 0f)),
      (3L, Array(0f, 1f, 0f))
    ).toDF("id", "vec")
    val cents = Seq((0, Array(1f, 1f, 1f)))
    val flagged = Similarity.semDedupFlag(df, "id", "vec", cents, tau = 0.5)
      .select("id", "is_semdup").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flagged === Map(1L -> false, 2L -> true, 3L -> true))
    val survivors = Similarity.semDedup(df, "id", "vec", cents, tau = 0.5)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(survivors === Seq(1L))
  }

  test("cluster scoping: similar rows in different cells are never compared") {
    // v1 lands on c1, v2 on c2; cos(v1, v2) = 0.8 > tau, but SemDeDup only
    // pairs within a cell — the paper's documented recall trade at cell
    // boundaries. Both survive.
    val df = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(0.8f, 0.6f, 0f))
    ).toDF("id", "vec")
    val cents = Seq((0, Array(1f, 0f, 0f)), (1, Array(0.8f, 0.6f, 0f)))
    val out = Similarity.semDedupFlag(df, "id", "vec", cents, tau = 0.7)
      .select("id", "centroid_id", "is_semdup").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    assert(out === Set((1L, 0, false), (2L, 1, false)))
  }

  test("LSH-blocked mode flags a subset of the exact mode on real embeddings") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity.collectCentroids(
      emb.filter(col("vec_id") < 8), "vec_id", "embedding")
    val corpus = emb.filter(col("vec_id") >= 8)
    def removedIds(bands: Int): Set[Long] =
      Similarity.semDedupFlag(corpus, "vec_id", "embedding", cents,
          tau = 0.35, bands = bands)
        .filter(col("is_semdup")).select("vec_id")
        .collect().map(_.getLong(0)).toSet
    val exact = removedIds(bands = 0)
    val lsh = removedIds(bands = 4)
    assert(exact.nonEmpty, "the policy must actually fire on test data")
    assert(lsh.nonEmpty && lsh.subsetOf(exact),
      s"LSH candidates must verify into the exact removal set (${lsh.size}/${exact.size})")
    // survivors + removed partition the corpus
    val n = corpus.count()
    val kept = Similarity.semDedup(corpus, "vec_id", "embedding", cents, 0.35).count()
    assert(kept + exact.size === n)
  }

  test("collapseExact is row-for-row identical to the naive path on a twinned corpus") {
    // 5× duplicated corpus: every vector appears as a 5-twin clique with
    // distinct ids. The collapsed path pairs only the 492 distinct reps,
    // the naive path pays the full twin quadratic — flags must agree on
    // EVERY row (rep survival + twin domination + cell assignment).
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity.collectCentroids(
      emb.filter(col("vec_id") < 8), "vec_id", "embedding")
    val base = emb.filter(col("vec_id") >= 8)
    val twinned = (0 until 5).map { r =>
      base.select((col("vec_id") * 5 + r).as("vec_id"), col("embedding"))
    }.reduce(_ union _)
    def flags(collapse: Boolean): Map[Long, (Int, Boolean)] =
      Similarity.semDedupFlag(twinned, "vec_id", "embedding", cents,
          tau = 0.35, collapseExact = collapse)
        .select("vec_id", "centroid_id", "is_semdup").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    val collapsed = flags(true)
    val naive = flags(false)
    assert(collapsed.size === 492 * 5)
    assert(collapsed === naive)
    // every non-min twin is dominated by its group min (cos = 1 > tau)
    assert(collapsed.count { case (id, (_, dup)) => id % 5 != 0 && !dup } === 0)
  }

  test("semDedupBy keeps each semantic component's best-keepBy member, not its min id") {
    // one cell; edges a-b and b-c (cos 0.707 > tau), so {1,2,3} is ONE
    // component. keepBy = L2 norm: c (norm 2) survives — where semDedup's
    // earliest-id policy keeps a instead.
    val df = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(r2, r2, 0f)),
      (3L, Array(0f, 2f, 0f)),
      (4L, Array(-1f, -1f, -1f)) // lone far-away singleton: survives as-is
    ).toDF("id", "vec")
    val cents = Seq((0, Array(1f, 1f, 0f)), (1, Array(-1f, -1f, -1f)))
    val best = Similarity.semDedupBy(df, "id", "vec", cents, tau = 0.5,
        keepBy = Similarity.norm(col("vec")))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(best === Array(3L, 4L))
    val earliest = Similarity.semDedup(df, "id", "vec", cents, tau = 0.5)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(earliest === Array(1L, 4L))
  }

  test("guards: tau range and reserved column names fail loud") {
    val df = Seq((1L, Array(1f, 0f))).toDF("id", "vec")
    val cents = Seq((0, Array(1f, 0f)))
    intercept[IllegalArgumentException] {
      Similarity.semDedupFlag(df, "id", "vec", cents, tau = 1.0)
    }
    intercept[IllegalArgumentException] {
      Similarity.semDedupFlag(df.withColumn("is_semdup", lit(true)),
        "id", "vec", cents, tau = 0.5)
    }
  }
}
