package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import GraftQuery.{q, rowsOnly}

/** Embedding-similarity operators over `embeddings(vec_id, embedding:
  * array<float>, label)`: brute-force cosine top-k (baseline), IVF-style
  * centroid assignment (the scale path — restricts search to one bucket), and
  * embedding-cosine near-duplicate pairs. Dot products are computed with an
  * explicit index-ordered double fold so Spark and DuckDB produce identical
  * bits.
  */
object VectorQueries {

  /** Left-to-right double-precision dot product of two float arrays. */
  def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def normCol(a: Column): Column = sqrt(dotCol(a, a))

  /** DuckDB equivalents (index-ordered fold via list_sum over range). */
  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))"

  def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  /** Per-vector L2 norm (sanity of the arithmetic path). */
  val qEmbedNorm = q(
    "q_embed_norm",
    s"SELECT vec_id, label, ${Exact.quantSql(normSql("embedding"), 10000)} AS l2_e4 FROM embeddings") { (s, d) =>
    Tables.embeddingsBalanced(s, d)
      .select(col("vec_id"), col("label"),
        Exact.quant(normCol(col("embedding")), 10000).as("l2_e4"))
  }

  /** Brute-force cosine top-10 to the query vector (vec_id=0) — the exact
    * baseline every ANN variant is measured against. Query side is a
    * broadcast single row; the scan side never shuffles.
    */
  val qEmbedTopK = q(
    "q_embed_topk",
    "WITH qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0) " +
      s"SELECT vec_id, ${Exact.quantSql(dotSql("embedding", "q") + " / (" + normSql("embedding") + " * " + normSql("q") + ")", 10000)} AS cos_e4 " +
      "FROM embeddings, qv WHERE vec_id <> 0 " +
      s"ORDER BY ${dotSql("embedding", "q")} / (${normSql("embedding")} * ${normSql("q")}) DESC, vec_id " +
      "LIMIT 10") { (s, d) =>
    val emb = Tables.embeddingsBalanced(s, d)
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("q"))
    emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .withColumn("cos", dotCol(col("embedding"), col("q")) /
        (normCol(col("embedding")) * normCol(col("q"))))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), Exact.quant(col("cos"), 10000).as("cos_e4"))
  }

  /** IVF-style assignment: 8 fixed centroids (vec_id 0..7), every other
    * vector assigned to its max-cosine centroid (tie → lowest centroid id).
    * This is the bucketing stage of scalable ANN: search then touches one
    * bucket instead of the full corpus.
    */
  val qAnnIvf = q(
    "q_ann_ivf",
    "WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8), " +
      "scored AS (SELECT vec_id, cid, " +
      s"${dotSql("embedding", "ce")} / (${normSql("embedding")} * ${normSql("ce")}) AS cos, " +
      "row_number() OVER (PARTITION BY vec_id ORDER BY " +
      s"${dotSql("embedding", "ce")} / (${normSql("embedding")} * ${normSql("ce")}) DESC, cid) AS rn " +
      "FROM embeddings, c WHERE vec_id >= 8) " +
      s"SELECT cid, count(*) AS n, CAST(sum(${Exact.quantSql("cos", 10000)}) AS BIGINT) AS sum_cos_e4 FROM scored " +
      "WHERE rn = 1 GROUP BY cid") { (s, d) =>
    val emb = Tables.embeddingsBalanced(s, d)
    val cents = graft.operators.Similarity.collectCentroids(
      Tables.embeddings(s, d).filter(col("vec_id") < 8), "vec_id", "embedding")
    graft.operators.Similarity
      .ivfAssign(emb.filter(col("vec_id") >= 8), "vec_id", "embedding", cents)
      .groupBy(col("centroid_id").as("cid"))
      .agg(count(lit(1)).as("n"), sum(Exact.quant(col("cosine"), 10000)).as("sum_cos_e4"))
  }

  /** Embedding-cosine near-duplicate pairs within a label (blocked join —
    * the label is the blocking key, so the pair space stays bounded).
    */
  val qEmbedNearDup = q(
    "q_embed_near_dup",
    "WITH e AS (SELECT vec_id, label, embedding, " +
      s"${normSql("embedding")} AS nrm FROM embeddings) " +
      "SELECT a.vec_id AS ida, b.vec_id AS idb, " +
      s"${Exact.quantSql(dotSql("a.embedding", "b.embedding") + " / (a.nrm * b.nrm)", 10000)} AS cos_e4 " +
      "FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id " +
      s"WHERE ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) > 0.8") { (s, d) =>
    val e = Tables.embeddingsBalanced(s, d)
      .select(col("vec_id"), col("label"), col("embedding"),
        normCol(col("embedding")).as("nrm"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", dotCol(col("a.embedding"), col("b.embedding")) /
        (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") > 0.8)
      .select(col("a.vec_id").as("ida"), col("b.vec_id").as("idb"),
        Exact.quant(col("cos"), 10000).as("cos_e4"))
  }

  /** LSH bucket histogram (random-hyperplane SimHash over embeddings): 12
    * deterministic xorshift-derived hyperplanes. The hyperplanes are literal
    * ±1 arrays, so the identical bucket arithmetic is expressible in DuckDB
    * (bucket recall vs brute force is additionally asserted in the spec).
    */
  val qAnnLsh = q(
    "q_ann_lsh",
    "SELECT bucket, count(*) AS n, min(vec_id) AS min_id FROM (" +
      s"SELECT vec_id, ${Vectors.lshBucketSql("embedding", 12)} AS bucket " +
      "FROM embeddings) GROUP BY bucket") { (s, d) =>
    val emb = Tables.embeddingsBalanced(s, d)
    val bucketed = emb.withColumn("bucket", Vectors.lshBucket(col("embedding"), 12))
    bucketed.groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("vec_id").as("min_id"))
  }

  /** Batch multi-query ANN — the 100 TB shape: a query SET joins the corpus
    * on LSH bucket id (corpus bucket is computed map-side, query side is
    * broadcast), then per-query top-k ranks only the bucket's candidates.
    * The corpus never shuffles; the window runs over candidates, not corpus.
    */
  val qAnnMulti = q(
    "q_ann_multi", {
      val b = Vectors.lshBucketSql("embedding", 8)
      val cos = s"${dotSql("c.embedding", "qv")} / (${normSql("c.embedding")} * ${normSql("qv")})"
      s"WITH c AS (SELECT vec_id, embedding, $b AS bkt FROM embeddings WHERE vec_id >= 16), " +
        s"qs AS (SELECT vec_id AS qid, embedding AS qv, $b AS qbkt FROM embeddings WHERE vec_id < 16), " +
        s"cand AS (SELECT qid, c.vec_id AS vec_id, $cos AS cos, " +
        s"row_number() OVER (PARTITION BY qid ORDER BY $cos DESC, c.vec_id) AS rn " +
        "FROM c JOIN qs ON c.bkt = qs.qbkt) " +
        s"SELECT qid, vec_id, ${Exact.quantSql("cos", 10000)} AS cos_e4 FROM cand WHERE rn <= 3"
    }) { (s, d) =>
    val emb = Tables.embeddingsBalanced(s, d)
    val corpus = emb.filter(col("vec_id") >= 16).select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    graft.operators.Similarity
      .annJoinTopK(corpus, queries, "vec_id", "embedding", "qid", "qvec", k = 3, nBits = 8)
      .select(col("qid"), col("vec_id"), Exact.quant(col("cosine"), 10000).as("cos_e4"))
  }

  val all: Seq[GraftQuery] = Seq(
    qEmbedNorm, qEmbedTopK, qAnnIvf, qEmbedNearDup, qAnnLsh, qAnnMulti)
}

/** Shared vector helpers (also used by operators.Similarity). */
object Vectors {
  val Dim = 64

  /** Deterministic ±1 hyperplane components (xorshift-mixed), generated
    * driver-side once — they become literal arrays in the plan, so no per-row
    * hashing and the whole bucket computation stays inside codegen.
    */
  def hyperplane(j: Int, dim: Int = Dim): Array[Double] =
    Array.tabulate(dim) { i =>
      var x = (j.toLong * 2654435761L + i.toLong * 40503L + 987654321L) & 0xffffffffL
      x ^= x >> 13; x ^= (x << 17) & 0xffffffffL; x ^= x >> 5
      if ((x & 1L) == 1L) 1.0 else -1.0
    }

  /** Random-hyperplane LSH bucket id: bit j = [dot(v, r_j) > 0]. */
  def lshBucket(v: Column, nBits: Int, dim: Int = Dim): Column = {
    val bits = (0 until nBits).map { j =>
      val r = hyperplane(j, dim)
      val rCol = array(r.map(lit): _*)
      val d = aggregate(
        zip_with(v, rCol, (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x)
      when(d > 0, 1 << j).otherwise(0)
    }
    bits.reduce(_ + _)
  }

  /** DuckDB equivalent of [[lshBucket]]: the hyperplanes are ±1 literals, so
    * the same index-ordered double fold (list_sum over range) reproduces the
    * sign bits bit-exactly.
    */
  def lshBucketSql(v: String, nBits: Int, dim: Int = Dim): String =
    (0 until nBits).map { j =>
      val lits = hyperplane(j, dim).map(x => if (x > 0) "1.0" else "-1.0").mkString(", ")
      s"(CASE WHEN list_sum(list_transform(range(1, ${dim + 1}), " +
        s"i -> ($v)[i]::DOUBLE * ([$lits])[i])) > 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
