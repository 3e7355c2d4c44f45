package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Training-data pipeline operators: dedup family, similarity search,
  * multimodal plumbing.
  */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (1L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 0
    (2L, "The quick brown fox jumps over the lazy dog, again and again!"), // fp dup of 0
    (3L, "the quick brown fox jumps over the lazy cat again and again"), // near dup of 0
    (4L, "completely different content about spark query engines at scale today ok")
  ).toDF("doc_id", "text")

  test("exact dedup keeps the lowest id per identical text") {
    val out = Dedup.exact(docs, "doc_id", "text").select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(out === Array(0L, 2L, 3L, 4L)) // 1 dropped (exact dup of 0)
  }

  test("fingerprint dedup also collapses case/punctuation variants") {
    val out = Dedup.byFingerprint(docs, "doc_id", "text").select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(out === Array(0L, 3L, 4L)) // 1 and 2 both collapse onto 0
  }

  test("minhash LSH finds the near-duplicate pair, not unrelated docs") {
    val pairs = Dedup.nearDuplicates(docs, "doc_id", "text")
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)) || pairs.contains((0L, 1L))) // near/exact dups surface
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })  // 4 unrelated
  }

  test("lsh hot-bucket star bounds pairs linearly and keeps every doc linked") {
    // 40 identical docs = one hot bucket per band; all-pairs would be
    // C(40,2) = 780; the star pattern emits exactly n-1 = 39 pairs
    val hot = (0L until 40L).map(i => (i, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(hot, "doc_id", "text")
    val unbounded = Dedup.lshCandidates(sigs, "doc_id").count()
    val starred = Dedup.lshCandidates(sigs, "doc_id", hotBucketThreshold = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unbounded === 780L)
    // every doc stays a candidate via the bucket representative (id 0) —
    // a truncating cap would orphan docs 5..39 from every band at once
    assert(starred === (1L until 40L).map(i => (0L, i)).toSet)
    // and a hot bucket must not suppress cold-bucket pairs elsewhere: the
    // planted near-dup pair in the 5-doc corpus still surfaces
    val mixed = Dedup.nearDuplicates(docs, "doc_id", "text", hotBucketThreshold = 5)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mixed.contains((0L, 3L)) || mixed.contains((0L, 1L)))
  }

  test("hot-bucket guard is ON by default: a 2x-threshold bucket stars to n-1 pairs") {
    // 2 * DefaultHotBucketThreshold identical docs: every band bucket is hot
    // under the DEFAULT arguments, so the default path must star-link — not
    // emit C(n,2) ~ 2M pairs (which would also make this test crawl)
    val n = 2 * Dedup.DefaultHotBucketThreshold
    val hot = (0L until n.toLong)
      .map(i => (i, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(hot, "doc_id", "text")
    val pairs = Dedup.lshCandidates(sigs, "doc_id") // defaults only
    assert(pairs.count() === (n - 1).toLong)
    // identical docs agree on all permutations, so verify keeps all n-1
    assert(Dedup.nearDuplicates(hot, "doc_id", "text").count() === (n - 1).toLong)
  }

  test("giant NEAR-dup cluster (above threshold, not identical): star path still yields one cluster with the min-id survivor") {
    // 2.5k docs sharing a long base text, each with a UNIQUE tail token —
    // exact pre-collapse cannot shortcut this (no two texts equal), so the
    // full LSH path runs with every band bucket hot. The star degradation
    // must (a) bound candidates to n-1 distinct pairs (every member links
    // the bucket's lowest id — the same rep in every band, so the distinct
    // set collapses across bands), and (b) still hand the verifier enough
    // edges that connected components form ONE cluster around the min id.
    val n = Dedup.DefaultHotBucketThreshold * 5 / 2
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val giant = (0L until n.toLong).map(i => (i, s"$base tail$i"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(giant, "doc_id", "text")
    // the unique tails perturb a few band hashes, so the cluster spans a
    // handful of buckets per band (hot ones star to their own rep, small
    // spill-over buckets pair quadratically among few docs) — the bound
    // is bands·(n−1) + spill, orders below the unguarded C(n,2) ≈ 3.3M
    val cand = Dedup.lshCandidates(sigs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.size <= 8 * (n - 1),
      s"star guard must bound pairs to ~bands x n, got ${cand.size}")
    assert(cand.size.toLong < n.toLong * (n - 1) / 2 / 100,
      s"pairs must sit orders below C(n,2), got ${cand.size}")
    val pairs = Dedup.nearDuplicates(giant, "doc_id", "text",
      minAgreeFraction = 0.5)
    val sizes = Dedup.connectedComponents(pairs, giant, "doc_id")
      .groupBy("rep").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // LSH recall is < 1 by construction: a doc whose tail token flips a
    // shingle-row in EVERY band lands in 8 singleton buckets and pairs
    // with nothing (~1-2 expected at this n; deterministic here). The
    // guard claim is that the giant component still forms around the min
    // id with at most a few such stragglers — not that banding is exact.
    assert(sizes.getOrElse(0L, 0L) >= (n - 5).toLong,
      s"giant component must absorb all but LSH-recall stragglers: $sizes")
    assert(sizes.size <= 6, s"at most a few stragglers, got $sizes")
    // ...and the end-to-end dedup keeps the min-id survivor + stragglers
    val kept = Dedup.dedupNear(giant, "doc_id", "text", minAgreeFraction = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(0L) && kept.size === sizes.size,
      s"one survivor per component: $kept vs $sizes")
  }

  test("nearDupPairs: banded-LSH candidates verify to a subset of exact pairs") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"), col("label"))
    // 0.35 = the threshold where the synthetic embeddings actually pair up
    val bucketed = Similarity.nearDupPairs(emb, "vec_id", "embedding",
        minCosine = 0.35, blockCols = Seq("label"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact reference: blocked only by label (the pre-bucketing semantics)
    val e = emb.withColumn("nrm", Similarity.norm(col("embedding")))
    val exact = e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .filter(Similarity.dot(col("a.embedding"), col("b.embedding")) /
        (col("a.nrm") * col("b.nrm")) > 0.35)
      .select(col("a.vec_id"), col("b.vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed.nonEmpty, "verify stage must actually fire on test data")
    assert(bucketed.subsetOf(exact), "bucketed pairs must all be true near-dups")
    // sane recall on the test corpus (banding OR buys most pairs back);
    // 9/14 at sf0.001 with the 4x4 default, deterministic hyperplanes
    assert(bucketed.size * 2 >= exact.size,
      s"recall too low: ${bucketed.size}/${exact.size}")
  }

  test("nearDupPairs finds identical vectors and star-links hot buckets") {
    val base = Array.tabulate(8)(i => (i + 1).toFloat)
    val rows = (0L until 12L).map(i => (i, base.clone(), "x")) :+
      (99L, Array.tabulate(8)(i => (if (i % 2 == 0) 1f else -1f)), "x")
    val df = rows.toDF("vec_id", "embedding", "label")
    // 12 identical vectors, threshold 5: every band bucket is hot -> star on
    // id 0 = 11 pairs; the orthogonal-ish 99 pairs with nothing
    val pairs = Similarity.nearDupPairs(df, "vec_id", "embedding",
        minCosine = 0.99, blockCols = Seq("label"), hotBucketThreshold = 5,
        dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === (1L until 12L).map(i => (0L, i)).toSet)
  }

  test("winnowing fingerprints: shared long substrings always share a fingerprint") {
    val rnd = new scala.util.Random(19)
    def randText(n: Int) = rnd.alphanumeric.take(n).mkString
    // k = 8, w = 4: any shared substring of length >= k + w - 1 = 11 must
    // yield at least one shared fingerprint (the winnowing guarantee)
    val shared = randText(40)
    val docs = Seq(
      (0L, randText(30) + shared + randText(25)),
      (1L, randText(50) + shared),         // same 40-char block elsewhere
      (2L, randText(80))                   // unrelated
    ).toDF("doc_id", "text")
    val fps = graft.operators.Dedup.winnowFingerprints(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(0L) & fps(1L)).nonEmpty,
      "docs sharing a 40-char substring must share a fingerprint")
    // short docs (< k chars) drop out; docs of exactly k chars get one
    val tiny = Seq((0L, "abcdefg"), (1L, "abcdefgh")).toDF("doc_id", "text")
    val tfps = graft.operators.Dedup.winnowFingerprints(tiny, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(!tfps.contains(0L) && tfps(1L).length === 1)
  }

  test("minhash kernel is value-exact to the explode/aggregate pipeline it replaced, every tokenizer, on the real corpus") {
    // the retired shape — explode(ngrams) -> md5_prefix32 % P ->
    // MinHashSigAgg — rebuilt verbatim as the kernel's parity oracle
    // (MinHashSigAgg stays in the library exactly for this role)
    import graft.queries.TextQueries.{P, hash32, ngramsCol, perms}
    def pipelineForm(df: org.apache.spark.sql.DataFrame,
        tok: Tokenizer): org.apache.spark.sql.DataFrame = {
      graft.functions.Md5Prefix32.register(spark)
      graft.functions.MinHashSigAgg.register(spark)
      df.select(col("doc_id"), explode(ngramsCol(col("text"), 3, tok)).as("__s"))
        .select(col("doc_id"), (hash32(col("__s")) % P).as("__h"))
        .groupBy(col("doc_id"))
        .agg(graft.functions.MinHashSigAgg.minhashSig(col("__h")).as("__sig"))
        .select(col("doc_id") +: perms.indices.map(j => col("__sig")(j).as(s"m$j")): _*)
    }
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (200001L, "two tokens"),                       // < 3 tokens: drops
        (200002L, "Él niÑo corre RÁPIDO — ñ ü ² ok"),  // case + non-ASCII
        (200003L, "a,b;c d.e f"))                      // ascii-rule separators
        .toDF("doc_id", "text"))
    for (tok <- Seq[Tokenizer](Tokenizer.Ascii, Tokenizer.House,
        Tokenizer.Unicode(casefold = true), Tokenizer.Unicode(casefold = false))) {
      val want = pipelineForm(docs, tok).collect()
        .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      val got = Dedup.minhashSignatures(docs, "doc_id", "text", tok).collect()
        .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      assert(got.keySet == want.keySet,
        s"${tok.tag}: row-drop semantics diverged: ${got.keySet.size} vs ${want.keySet.size}")
      val bad = want.keys.filter(k => got(k) != want(k))
      assert(bad.isEmpty, s"${tok.tag}: ${bad.take(3)} signatures diverged")
    }
  }

  test("signature kernels evaluate ONCE per row: optimized plans carry a single kernel occurrence") {
    // the select(kernel).filter(isNotNull) shape gets the filter pushed
    // below the Project (alias substitution), duplicating the kernel into
    // Filter AND Project — every row would tokenize + md5 twice. The
    // dropNull Generate shape keeps one occurrence; this pins it.
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    def occurrences(df: org.apache.spark.sql.DataFrame, token: String): Int =
      token.r.findAllIn(df.queryExecution.optimizedPlan.toString).size
    assert(occurrences(Dedup.minhashSignatures(docs, "doc_id", "text"),
      "minhash_sig_full") === 1)
    assert(occurrences(Dedup.simhash(docs, "doc_id", "text"),
      "simhash16") === 1)
    assert(occurrences(Dedup.simhash64(docs, "doc_id", "text"),
      "simhash64_hex") === 1)
    assert(occurrences(Dedup.winnowFingerprints(docs, "doc_id", "text"),
      "winnow_fp") === 1)
  }

  test("simhash kernels are value-exact to the explode/groupBy pipelines they replaced") {
    import graft.queries.TextQueries.hash32
    graft.functions.Md5Prefix32.register(spark)
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (300001L, ""),                                  // zero tokens: drops
        (300002L, "Él niÑo RÁPIDO — ü ² mixed content"))
        .toDF("doc_id", "text"))
    for (tok <- Seq[Tokenizer](Tokenizer.Ascii, Tokenizer.Unicode(casefold = true))) {
      // retired 16-bit pipeline
      val toks16 = docs.select(col("doc_id"),
          explode(tok.column(col("text"))).as("__tok"))
        .select(col("doc_id"), hash32(col("__tok")).as("__th"))
      val sums16 = (0 until 16).map(b =>
        sum(when(shiftright(col("__th"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$b"))
      val sig16 = (0 until 16).map(b => when(col(s"s$b") > 0, 1 << b).otherwise(0)).reduce(_ + _)
      val want16 = toks16.groupBy(col("doc_id")).agg(sums16.head, sums16.tail: _*)
        .select(col("doc_id"), sig16.as("simhash"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got16 = Dedup.simhash(docs, "doc_id", "text", tok)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got16 === want16, s"${tok.tag}: 16-bit simhash diverged")

      // retired 64-bit pipeline
      val toks64 = docs.select(col("doc_id"),
          explode(tok.column(col("text"))).as("__tok"))
        .select(col("doc_id"),
          conv(substring(md5(col("__tok")), 1, 8), 16, 10).cast("long").as("__hi"),
          conv(substring(md5(col("__tok")), 9, 8), 16, 10).cast("long").as("__lo"))
      val sums64 = (0 until 64).map { b =>
        val (h, sh) = if (b < 32) (col("__lo"), b) else (col("__hi"), b - 32)
        sum(when(shiftright(h, sh).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$b")
      }
      val hexSig = concat((0 until 8).map { r =>
        val byteR = (0 until 8).map(c =>
          when(col(s"s${r * 8 + c}") > 0, lit(1 << c)).otherwise(lit(0)))
          .reduce(_ + _)
        lpad(lower(hex(byteR)), 2, "0")
      }: _*)
      val want64 = toks64.groupBy(col("doc_id")).agg(sums64.head, sums64.tail: _*)
        .select(col("doc_id"), hexSig.as("simhash64"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val got64 = Dedup.simhash64(docs, "doc_id", "text", tok)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got64 === want64, s"${tok.tag}: 64-bit simhash diverged")
    }
  }

  test("winnow kernel is value-exact to the column formulation it replaced, on the real corpus") {
    // the retired shape: per-gram md5_prefix32 over substr, per-window
    // array_min(slice), sorted distinct — rebuilt here verbatim as the
    // parity oracle for the native WinnowFp kernel (both k/w regimes:
    // the dense signature default 8/4 and the MOSS-sparse 16/16),
    // including the degenerate fewer-than-w-grams single-window case
    // and non-ASCII code-point substring semantics
    import org.apache.spark.sql.Column
    def columnForm(textCol: Column, k: Int, w: Int): Column = {
      val grams = transform(sequence(lit(1), length(textCol) - (k - 1)),
        i => graft.queries.TextQueries.hash32(textCol.substr(i, lit(k))))
      val wins = when(size(grams) >= w,
          transform(sequence(lit(1), size(grams) - (w - 1)),
            j => array_min(slice(grams, j, lit(w)))))
        .otherwise(array(array_min(grams)))
      array_sort(array_distinct(wins))
    }
    graft.functions.Md5Prefix32.register(spark)
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (100001L, "short but ≥ k: añ9"), // 18 chars incl. multibyte
        (100002L, "el niño corre rápido — ünïcödé content ² with ññ runs"))
        .toDF("doc_id", "text"))
    for ((k, w) <- Seq((8, 4), (16, 16))) {
      val mismatches = docs.filter(length(col("text")) >= k)
        .select(col("doc_id"),
          graft.functions.WinnowFp.winnowFp(col("text"), k, w).as("kernel"),
          columnForm(col("text"), k, w).as("columns"))
        .filter(not(col("kernel") === col("columns")))
        .count()
      assert(mismatches === 0L, s"k=$k w=$w: kernel != column formulation")
    }
  }

  test("winnowOverlapPairs finds heavy-overlap docs and the df cap drops boilerplate") {
    val rnd = new scala.util.Random(29)
    def randText(n: Int) = rnd.alphanumeric.take(n).mkString
    val shared = randText(120) // long shared block -> many shared fingerprints
    val boiler = randText(100) // block shared by EVERYONE -> df-capped away
    val docs = (
      Seq((0L, boiler + shared + randText(40)),
          (1L, randText(40) + boiler + shared)) ++ // near-dup pair via `shared`
      (2L until 22L).map(i => (i, boiler + randText(150))) // boilerplate-only
    ).toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.winnowOverlapPairs(
        docs, "doc_id", "text", maxDf = 8, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs.exists { case (a, b, _) => a == 0L && b == 1L },
      s"the shared-block pair must surface: $pairs")
    // boilerplate-only docs never pair: their fingerprints exceed the df cap
    val boilerIds = (2L until 22L).toSet
    assert(!pairs.exists { case (a, b, _) =>
      boilerIds.contains(a) && boilerIds.contains(b) },
      s"boilerplate-only docs must be df-capped out of pairing: $pairs")
  }

  test("dedupNearBy keeps each cluster's best-quality member, not its min id") {
    // 0/1/3 form one near-dup cluster (exact + near dups of each other);
    // doc 3 is the LONGEST, so the n_chars policy must keep 3 and drop the
    // lower-id 0 and 1; the unrelated doc 4 survives untouched
    val withLen = docs.withColumn("n_chars", length(col("text")))
    val kept = graft.operators.Dedup.dedupNearBy(
        withLen, "doc_id", "text", keepBy = col("n_chars"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(0L) && !kept.contains(1L),
      s"cluster's shorter members must be dropped, kept=$kept")
    assert(kept.contains(4L), "pair-free docs survive")
    // the survivor of the cluster is its longest member
    val clusterKept = kept - 4L
    val lens = withLen.collect().map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
    val clusterIds = Set(0L, 1L, 2L, 3L).intersect(lens.keySet)
    clusterKept.foreach { id =>
      val peers = graft.operators.Dedup.connectedComponents(
        graft.operators.Dedup.nearDuplicates(withLen, "doc_id", "text"),
        withLen, "doc_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val myRep = peers(id)
      val myCluster = peers.collect { case (d, r) if r == myRep => d }
      assert(myCluster.forall(d => lens(d) < lens(id) ||
        (lens(d) == lens(id) && d >= id)),
        s"survivor $id is not the (len, -id)-max of $myCluster")
    }
  }

  test("ngram-jaccard df cap bounds the boilerplate-shingle pair blowup") {
    import graft.queries.TextQueries
    // 10 docs sharing ONE boilerplate shingle (plus a unique one each): the
    // shared shingle alone passes the i*10 >= u filter, so without the cap
    // all C(10,2)=45 pairs ship; with df cap 4 the hot shingle drops and
    // only the genuinely-similar planted pair (20, 21) survives
    val boiler = (0L until 10L).flatMap(i =>
      Seq((i, "src", "copy right footer"), (i, "src", s"unique shingle $i")))
    val similarPair = Seq( // two docs sharing 2 of their 3 rare shingles
      (20L, "src", "alpha beta gamma"), (20L, "src", "beta gamma delta"), (20L, "src", "only twenty here"),
      (21L, "src", "alpha beta gamma"), (21L, "src", "beta gamma delta"), (21L, "src", "only twentyone here"))
    val sh = (boiler ++ similarPair).toDF("doc_id", "source", "s")
    val uncapped = TextQueries.ngramJaccardPairsOf(sh, maxDf = 64).count()
    val capped = TextQueries.ngramJaccardPairsOf(sh, maxDf = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped === 46L) // 45 boilerplate pairs + the planted pair
    assert(capped === Set((20L, 21L)))
  }

  test("ngram-jaccard over hashed shingles matches exact string shingles at sf0.001") {
    import graft.queries.TextQueries
    // q_ngram_jaccard pairs on 4-byte md5-prefix shingle hashes (cheaper
    // shuffles); its oracle uses the identical hash, so it cannot catch
    // collision-induced drift by itself. This bounds the approximation:
    // at sf0.001 the hashed pair set (i, u counts included) is IDENTICAL to
    // the exact string-shingle computation — ~2k distinct shingles into a
    // 2^32 space, collision odds ~1e-6 (birthday), and the fixed md5 prefix
    // keeps it reproducible.
    val d = "/root/testdata/sf0.001"
    val src = graft.Tables.documents(spark, d).select(col("doc_id"), col("source"))
    val base = TextQueries.shinglesDf(spark, d)
    def pairs(sh: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
      TextQueries.ngramJaccardPairsOf(
          sh.distinct().join(src, "doc_id").select("doc_id", "source", "s"),
          TextQueries.MaxShingleDf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val exact = pairs(base.select(col("doc_id"), col("s")))
    val hashed = pairs(base.select(col("doc_id"), TextQueries.hash32(col("s")).as("s")))
    assert(exact.nonEmpty)
    assert(hashed === exact)
  }

  test("decontaminate flags benchmark-overlapping docs and clean drops only them") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words then alpha beta gamma delta epsilon copied tail"), // shares a 5-gram
      (2L, "completely unrelated sentence with no shared phrases at all here"),
      (3L, "another clean document about distributed query engines and planning")
    ).toDF("doc_id", "text")
    val flagged = Decontaminate.contaminatedIds(corpus, bench, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(flagged === Set(1L))
    val kept = Decontaminate.clean(corpus, bench, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept === Array(2L, 3L))

    // an over-cap filter request fails loudly instead of silently clamping
    // to the runtime-filter confs (which would break the fpp contract)
    val capEx = intercept[IllegalArgumentException] {
      Decontaminate.contaminatedIdsBloom(corpus, bench, "doc_id", "text",
        expectedGrams = 100000000L, fpp = 0.001)
    }
    assert(capEx.getMessage.contains("maxNumBits"))

    // Bloom path: NEVER misses a contaminated doc (no false negatives), and
    // at a tight fpp flags exactly the exact path's set here
    val bloomFlagged = Decontaminate
      .contaminatedIdsBloom(corpus, bench, "doc_id", "text",
        expectedGrams = 1000L, fpp = 1e-8)
      .collect().map(_.getLong(0)).toSet
    assert(bloomFlagged.contains(1L)) // superset guarantee
    assert(bloomFlagged === Set(1L))  // tight-fpp equality at this scale
    val bloomKept = Decontaminate.cleanBloom(corpus, bench, "doc_id", "text",
        expectedGrams = 1000L, fpp = 1e-8)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(bloomKept === Array(2L, 3L))

    // overlap FRACTION: doc 1 has 6 distinct 5-grams, exactly ONE of
    // which ("alpha beta gamma delta epsilon") sits in the benchmark's
    // gram set; thresholds below/above 1/6 must flip the keep decision,
    // and a gram-less doc (under 5 tokens) reports 0/0 and is always kept
    val withShort = corpus.unionAll(Seq((4L, "too few words")).toDF("doc_id", "text"))
    val stats = Decontaminate.overlapStats(withShort, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stats(1L) === ((6L, 1L)), s"doc 1 stats: ${stats(1L)}")
    assert(stats(2L)._2 === 0L && stats(3L)._2 === 0L)
    assert(stats(4L) === ((0L, 0L)), "gram-less docs report 0/0, not a missing row")
    val strict = Decontaminate.cleanByOverlap(withShort, bench, "doc_id", "text",
        maxOverlapPpm = 100000L) // 10% < 1/6 -> doc 1 dropped
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(strict === Array(2L, 3L, 4L))
    val loose = Decontaminate.cleanByOverlap(withShort, bench, "doc_id", "text",
        maxOverlapPpm = 200000L) // 20% >= 1/6 -> doc 1 kept
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(loose === Array(1L, 2L, 3L, 4L))

    // ingest-time flag: pure map-side, so it runs on an unbounded stream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val streamed = Decontaminate.cleanBloomStream(
      in.toDF().toDF("doc_id", "text"), bench, "text",
      expectedGrams = 1000L, fpp = 1e-8)
    assert(streamed.isStreaming)
    // r8: build AND probe are native (BloomFilterAggregate +
    // BloomFilterMightContain) — no Scala UDF anywhere in the plan
    assert(!streamed.queryExecution.analyzed.toString.contains("UDF"),
      "flagBloom probe must stay UDF-free")
    val q = streamed.writeStream.format("memory")
      .queryName("t_decon_stream").outputMode("append").start()
    corpus.collect().foreach(r => in.addData((r.getLong(0), r.getString(1))))
    q.processAllAvailable(); q.stop()
    val kept2 = spark.table("t_decon_stream")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept2 === Array(2L, 3L))
  }

  test("simhash of near-identical docs differs in few bits") {
    val sigs = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    def bits(x: Int): Int = Integer.bitCount(x)
    assert(sigs(0L) === sigs(1L))                       // identical text
    assert(bits(sigs(0L) ^ sigs(3L)) <= 6)              // near dup: close
    assert(bits(sigs(0L) ^ sigs(4L)) >= 3)              // unrelated: far
  }

  test("simhash64: identical docs share signatures, near-dups cluster at Hamming 3, unrelated stay apart") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (4L, "entirely different content about spark shuffles partitions and caching layers"),
      (5L, "")
    ).toDF("doc_id", "text")
    val hashed = Dedup.simhash64(corpus, "doc_id", "text")
    val sigs = hashed.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!sigs.contains(5L), "token-less doc carries no signature")
    assert(sigs(1L) === sigs(2L) && sigs(1L).matches("[0-9a-f]{16}"))
    def hamming(a: String, b: String): Int = (0 until 8).map { r =>
      Integer.bitCount(Integer.parseInt(a.substring(r * 2, r * 2 + 2), 16) ^
        Integer.parseInt(b.substring(r * 2, r * 2 + 2), 16))
    }.sum
    assert(hamming(sigs(1L), sigs(3L)) <= 3,
      s"one-word change must stay near: ${hamming(sigs(1L), sigs(3L))}")
    assert(hamming(sigs(1L), sigs(4L)) > 3,
      s"unrelated text must separate: ${hamming(sigs(1L), sigs(4L))}")
    // the shared Hamming stack clusters the text signatures directly
    val reps = graft.operators.ImageDedup
      .imageClusters(hashed, "doc_id", "simhash64", maxHamming = 3)
      .select("doc_id", "rep").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L), s"$reps")
  }

  test("brute-force topK and bucketed ANN agree on returned cosines") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qv = emb.filter(col("vec_id") === 0).select("embedding")
      .collect().head.getSeq[Float](0).toArray
    val brute = Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= 0),
      "vec_id", "embedding", qv, 10).collect()
    assert(brute.length === 10)
    val ann = Similarity.annTopK(emb.filter(col("vec_id") =!= 0),
      "vec_id", "embedding", qv, 10, nBits = 4).collect()
    assert(ann.nonEmpty)
    // every ANN result's cosine must equal the brute-force cosine for that id
    val bruteAll = Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= 0),
      "vec_id", "embedding", qv, Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ann.foreach { r =>
      assert(math.abs(bruteAll(r.getLong(0)) - r.getDouble(1)) < 1e-12)
    }
  }

  test("ivfAssign gives every vector exactly one centroid") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") >= 8)
    val cents = Similarity.collectCentroids(
      graft.Tables.embeddings(spark, "/root/testdata/sf0.001").filter(col("vec_id") < 8),
      "vec_id", "embedding")
    val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding", cents)
    assert(assigned.count() === emb.count())
    assert(assigned.select("centroid_id").distinct().count() > 1)
  }

  test("hash sampling is stable under repartitioning (rand() would not be)") {
    val ids = (1L to 2000L).toDF("id")
    val a = Sampling.hashSample(ids, col("id"), 100).collect().map(_.getLong(0)).sorted
    val b = Sampling.hashSample(ids.repartition(13), col("id"), 100)
      .collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    // keep rate lands near 10% (md5 buckets are uniform-ish)
    assert(a.length > 140 && a.length < 260, s"got ${a.length}")
  }

  test("boilerplate prefixes: shared headers strip, rare prefixes and short docs survive") {
    val docs = Seq(
      (1L, "siteA", "Welcome to: ExampleCorp! actual content one"),
      (2L, "siteA", "WELCOME to exampleCorp - different content here"), // same normalized prefix
      (3L, "siteA", "unique opening words for this document"),
      (4L, "siteB", "welcome to somewhere else entirely"), // other group: df 1
      (5L, "siteA", "hi") // shorter than k: no prefix
    ).toDF("doc_id", "source", "text")
    val freq = Boilerplate.frequentPrefixes(docs, "text", "source", k = 3, minDf = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(freq.toSeq === Seq(("siteA", "welcome to examplecorp", 2L)),
      s"case/punct-invariant header detection: ${freq.toSeq}")
    val out = Boilerplate.stripFrequentPrefixes(docs, "doc_id", "text",
        "source", k = 3, minDf = 2)
      .select("doc_id", "is_boilerplate", "text_clean")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(out(1L) === ((true, "actual content one")))
    assert(out(2L) === ((true, "different content here")))
    assert(out(3L) === ((false, "unique opening words for this document")))
    assert(out(4L) === ((false, "welcome to somewhere else entirely")),
      "a df-1 prefix in its own group must not strip")
    assert(out(5L) === ((false, "hi")), "short docs pass through")
    intercept[IllegalArgumentException] {
      Boilerplate.frequentPrefixes(docs, "text", "source", k = 3, minDf = 1)
    }
  }

  test("gopher flags and C4 cleaning hit their published rule boundaries") {
    val good = (Seq.fill(30)("the quick brown fox jumps over and") :+
      "that have with of be to").mkString(" ") // 216 words, all rules pass
    val docs = Seq(
      (1L, good),
      (2L, "short doc"),                          // < 50 words
      (3L, good + " " + Seq.fill(30)("#").mkString(" ")), // symbol ratio blown
      (4L, (0 until 10).map(i => s"- bullet $i").mkString("\n")), // 100% bullets
      (5L, good.split(" ").map(_ => "ab#cd123").mkString(" "))    // numbers+symbols, no pure-alpha fail? still alpha-bearing
    ).toDF("doc_id", "text")
    val g = QualityFilters.gopherFlags(docs, "text")
      .select("doc_id", "g_word_count", "g_symbol_ratio", "g_bullet_lines",
        "g_stop_words", "gopher_pass")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5))).toMap
    assert(g(1L) === ((true, true, true, true, true)), s"good doc: ${g(1L)}")
    assert(!g(2L)._1 && !g(2L)._5, "under 50 words must fail word count")
    assert(!g(3L)._2 && !g(3L)._5, "30 hashes on 246 words must fail symbol ratio")
    assert(!g(4L)._3, "all-bullet doc must fail the 90% bullet-line rule")
    assert(!g(5L)._4, "stopword-free doc must fail stop-word presence")

    // the published rule applies the 0.1 threshold to hash and ellipsis
    // SEPARATELY: 8 of each on 100 words passes (a summed ratio would
    // wrongly fail at 16/100)
    val perSymbol = Seq((6L,
      Seq.fill(25)("the and that have").mkString(" ") + " " +
        (Seq.fill(8)("#") ++ Seq.fill(8)("...")).mkString(" ")))
      .toDF("doc_id", "text")
    val ps = QualityFilters.gopherFlags(perSymbol, "text")
      .select("g_symbol_ratio").collect().head.getBoolean(0)
    assert(ps, "8 hashes + 8 ellipses on 116 words must pass per-symbol ratios")
    // words split on ANY whitespace: one word per line still counts words
    val multiline = Seq((7L, Seq.fill(60)("the and that have").mkString("\n")))
      .toDF("doc_id", "text")
    val ml = QualityFilters.gopherFlags(multiline, "text")
      .select("g_word_count", "g_stop_words").collect().head
    assert(ml.getBoolean(0) && ml.getBoolean(1),
      "newline-separated words must count as words (\\\\s+ split)")

    val pages = Seq(
      (1L, "This line has five good words.\nshort one.\nno terminal punct here at all\n" +
        "Please enable javascript to continue browsing.\nAnother proper sentence with enough words!"),
      (2L, "A fine sentence that would survive.\nBut lorem ipsum dolor sit amet poisons the page."),
      (3L, "function() { return 1; }")
    ).toDF("doc_id", "text")
    val c = QualityFilters.c4CleanLines(pages, "text")
      .select("doc_id", "c4_text", "c4_lines_kept", "c4_lines_total", "c4_page_drop")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(c(1L)._1 === "This line has five good words.\n" +
      "Another proper sentence with enough words!",
      s"kept lines wrong: ${c(1L)}")
    assert(c(1L)._2 === 2L && c(1L)._3 === 5L && !c(1L)._4)
    assert(c(2L)._4, "lorem ipsum must flag the page")
    assert(c(3L)._4, "a curly brace must flag the page")
  }

  test("quality filters: column collisions fail loud, NULL text is an empty page") {
    val collide1 = Seq((1L, "x", true)).toDF("doc_id", "text", "gopher_pass")
    val e1 = intercept[IllegalArgumentException] {
      QualityFilters.gopherFlags(collide1, "text")
    }
    assert(e1.getMessage.contains("gopher_pass"))
    val collide2 = Seq((1L, "x", "t")).toDF("doc_id", "text", "c4_text")
    val e2 = intercept[IllegalArgumentException] {
      QualityFilters.c4CleanLines(collide2, "text")
    }
    assert(e2.getMessage.contains("c4_text"))
    // temp-column collisions are just as destructive (the temp gets
    // dropped on exit, deleting the caller's column)
    val collide3 = Seq((1L, "x", "t")).toDF("doc_id", "text", "__gf_w")
    assert(intercept[IllegalArgumentException] {
      QualityFilters.gopherFlags(collide3, "text")
    }.getMessage.contains("__gf_w"))
    // CASE-VARIANT collisions must fail too: withColumn resolves through
    // Spark's case-insensitive resolver, so 'Gopher_Pass' would be
    // silently overwritten by 'gopher_pass'
    val collide4 = Seq((1L, "x", true)).toDF("doc_id", "text", "Gopher_Pass")
    assert(intercept[IllegalArgumentException] {
      QualityFilters.gopherFlags(collide4, "text")
    }.getMessage.contains("gopher_pass"))
    val collide5 = Seq((1L, "x", "d", "t")).toDF("doc_id", "text", "domain", "Text_Clean")
    assert(intercept[IllegalArgumentException] {
      Boilerplate.stripFrequentPrefixes(collide5, "doc_id", "text", "domain", 2, 2L)
    }.getMessage.contains("text_clean"))

    // NULL text: every gopher flag false (not NULL — the oracle's CASE
    // WHEN semantics), C4 outputs ''/0/false, boilerplate strips to ''
    val nulls = Seq((1L, Option("the be to of and that have with " * 10)),
      (2L, Option.empty[String])).toDF("doc_id", "text")
    val gn = QualityFilters.gopherFlags(nulls, "text")
      .filter(col("doc_id") === 2L)
      .select("g_word_count", "g_stop_words", "gopher_pass").collect().head
    assert(!gn.isNullAt(0) && !gn.getBoolean(0) && !gn.getBoolean(1) &&
      !gn.getBoolean(2), s"NULL text must yield false flags, got $gn")
    val cn = QualityFilters.c4CleanLines(nulls, "text")
      .filter(col("doc_id") === 2L)
      .select("c4_text", "c4_lines_kept", "c4_page_drop").collect().head
    assert(cn.getString(0) === "" && cn.getLong(1) === 0L && !cn.getBoolean(2))
    val bp = Seq((1L, "acme corp news flash one", "d"),
        (2L, "acme corp news flash two", "d"),
        (3L, null.asInstanceOf[String], "d"))
      .toDF("doc_id", "text", "domain")
    val bn = Boilerplate.stripFrequentPrefixes(bp, "doc_id", "text",
        "domain", k = 4, minDf = 2)
      .filter(col("doc_id") === 3L)
      .select("is_boilerplate", "text_clean").collect().head
    assert(!bn.getBoolean(0) && bn.getString(1) === "",
      s"NULL text must pass through as non-boilerplate empty clean text: $bn")
  }

  test("stripFrequentLines removes cross-doc lines, keeps order/bytes, handles NULL") {
    val docs = Seq(
      (1L, "d", "COOKIE BANNER\nreal content one.\nfooter text\nmore real words here"),
      (2L, "d", "COOKIE BANNER\nentirely different body.\nfooter text"),
      (3L, "d", "unique document with its own lines\nnothing shared at all"),
      (4L, "e", "COOKIE BANNER\nsame line, different source — must survive"),
      (5L, "d", null.asInstanceOf[String]),
      (6L, "d", "COOKIE BANNER\nCOOKIE BANNER\nbody"), // twice in ONE doc: df counts docs, both removed
      (7L, "d", ""),
      (8L, "d", "   \n\nreal line\n   ") // blank/whitespace lines never count as frequent
    ).toDF("doc_id", "source", "text")
    val out = Boilerplate.stripFrequentLines(docs, "doc_id", "text", "source", 2L)
      .select("doc_id", "text_kept", "lines_removed")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) === (("real content one.\nmore real words here", 2L)))
    assert(out(2L) === (("entirely different body.", 2L)))
    assert(out(3L)._2 === 0L, "nothing shared -> nothing removed")
    assert(out(3L)._1 === "unique document with its own lines\nnothing shared at all")
    assert(out(4L) === (("COOKIE BANNER\nsame line, different source — must survive", 0L)),
      "frequency is per group; a cross-source line must survive")
    assert(out(5L) === (("", 0L)), "NULL text -> empty kept text, not a dropped row")
    assert(out(6L) === (("body", 2L)),
      "df counts DOCS (6 counts once toward df) but removal strips every occurrence")
    assert(out(7L) === (("", 0L)))
    assert(out(8L) === (("   \n\nreal line\n   ", 0L)),
      "whitespace-only lines are not boilerplate candidates")
    // collision guard (case-insensitive, like the other curation ops)
    assert(intercept[IllegalArgumentException] {
      Boilerplate.stripFrequentLines(
        Seq((1L, "d", "x", "t")).toDF("doc_id", "source", "text", "Text_Kept"),
        "doc_id", "text", "source", 2L)
    }.getMessage.contains("text_kept"))
  }

  test("line-frequency index: probe catches index-frequent lines, append accumulates, compact merges") {
    val idx = tempDir("graft_lineidx") + "/idx"
    val corpus = Seq(
      (1L, "d", "SITE HEADER\nreal body one"),
      (2L, "d", "SITE HEADER\nreal body two"),
      (3L, "d", "HALF FREQUENT\nother body"),
      (4L, "e", "SITE HEADER\nforeign source")
    ).toDF("doc_id", "source", "text")
    Boilerplate.writeLineFreqIndex(corpus, "doc_id", "text", "source", idx)

    // a batch doc carrying an INDEX-frequent line strips it even though
    // the line is unique within the batch — the incremental point
    val batch1 = Seq(
      (10L, "d", "SITE HEADER\nfresh content"),
      (11L, "d", "HALF FREQUENT\nmore content"), // df 1 in index + this batch doc NOT yet counted
      (12L, "e", "SITE HEADER\nonly one e-doc has this")
    ).toDF("doc_id", "source", "text")
    val s1 = Boilerplate.stripAgainstLineIndex(batch1, "doc_id", "text",
        "source", idx, minDf = 2L)
      .select("doc_id", "text_kept", "lines_removed")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(s1(10L) === (("fresh content", 1L)),
      "index-frequent line must strip from a batch where it is unique")
    assert(s1(11L) === (("HALF FREQUENT\nmore content", 0L)),
      "df 1 in the index stays under minDf 2 until the batch is appended")
    assert(s1(12L) === (("SITE HEADER\nonly one e-doc has this", 0L)),
      "group scoping: source e has df 1 for that line")

    // append batch1; HALF FREQUENT now has df 2 (doc 3 + doc 11) and
    // source e's SITE HEADER has df 2 (doc 4 + doc 12)
    Boilerplate.appendToLineFreqIndex(batch1, "doc_id", "text", "source", idx)
    val batch2 = Seq(
      (20L, "d", "HALF FREQUENT\nlate arrival"),
      (21L, "e", "SITE HEADER\nlate e arrival")
    ).toDF("doc_id", "source", "text")
    def probe(path: String) = Boilerplate.stripAgainstLineIndex(batch2,
        "doc_id", "text", "source", path, minDf = 2L)
      .select("doc_id", "text_kept", "lines_removed")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val s2 = probe(idx)
    assert(s2(20L) === (("late arrival", 1L)),
      "appended counts must accumulate across batches")
    assert(s2(21L) === (("late e arrival", 1L)))

    // compaction: merged counts answer identically, files per group bounded
    val compacted = tempDir("graft_lineidx") + "/compacted"
    Boilerplate.compactLineFreqIndex(spark, idx, compacted, filesPerGroup = 1)
    assert(probe(compacted) === s2, "compaction must not change any answer")
    // partition dirs carry the encoded token, not the raw group: hex('d') = 64
    val dFiles = new java.io.File(compacted, "__grp=g64")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(dFiles <= 1, s"compaction must bound files per group, got $dFiles")

    // guards: non-artifact dir, wrong group column, nested compaction target
    val e1 = intercept[IllegalArgumentException] {
      Boilerplate.stripAgainstLineIndex(batch2, "doc_id", "text", "source",
        tempDir("graft_lineidx_bogus"), minDf = 2L)
    }
    assert(e1.getMessage.contains("writeLineFreqIndex"))
    val e2 = intercept[IllegalArgumentException] {
      Boilerplate.appendToLineFreqIndex(
        batch2.withColumnRenamed("source", "domain"),
        "doc_id", "text", "domain", idx)
    }
    assert(e2.getMessage.contains("groupCol"))
    val e3 = intercept[IllegalArgumentException] {
      Boilerplate.compactLineFreqIndex(spark, idx, idx + "/compacted")
    }
    assert(e3.getMessage.contains("disjoint"))
    val e4 = intercept[IllegalArgumentException] {
      Boilerplate.writeLineFreqIndex(
        Seq((1L, 7, "x\nx")).toDF("doc_id", "source", "text"),
        "doc_id", "text", "source", tempDir("graft_lineidx_int"))
    }
    assert(e4.getMessage.contains("string column"),
      "non-string groups must fail loud, not round-trip through partition dirs")
    // a groupCol name carrying a quote would write meta JSON the regex
    // reader mis-parses — rejected up front, not discovered at probe time
    val e5 = intercept[IllegalArgumentException] {
      Boilerplate.writeLineFreqIndex(
        Seq((1L, "d", "x\nx")).toDF("doc_id", "so\"urce", "text"),
        "doc_id", "text", "so\"urce", tempDir("graft_lineidx_q"))
    }
    assert(e5.getMessage.contains("alias"), e5.getMessage)
    // index writers share the fresh-column guard: an input already
    // carrying __ln must fail with the operator-named message, not a
    // later ambiguous-reference AnalysisException
    val e6 = intercept[IllegalArgumentException] {
      Boilerplate.appendToLineFreqIndex(
        batch2.withColumn("__ln", lit("stale")),
        "doc_id", "text", "source", idx)
    }
    assert(e6.getMessage.contains("appendToLineFreqIndex") &&
      e6.getMessage.contains("__ln"), e6.getMessage)
  }

  test("line-frequency index survives hostile group values and empty builds") {
    // empty-string and numeric-lookalike groups: a raw partitionBy would
    // turn '' into __HIVE_DEFAULT_PARTITION__ (read back NULL) and
    // type-infer '1'/'01' into the same int — the encoded partition token
    // plus the data-column join must keep all three distinct and probe-able
    val idx = tempDir("graft_lineidx_h") + "/idx"
    val corpus = Seq(
      (1L, "", "EMPTY GROUP LINE\nbody a"),
      (2L, "", "EMPTY GROUP LINE\nbody b"),
      (3L, "1", "NUM LINE\nbody c"),
      (4L, "1", "NUM LINE\nbody d"),
      (5L, "01", "NUM LINE\nonly once in 01")
    ).toDF("doc_id", "source", "text")
    Boilerplate.writeLineFreqIndex(corpus, "doc_id", "text", "source", idx)
    val batch = Seq(
      (10L, "", "EMPTY GROUP LINE\nnew empty-group doc"),
      (11L, "1", "NUM LINE\nnew 1-group doc"),
      (12L, "01", "NUM LINE\nnew 01-group doc")
    ).toDF("doc_id", "source", "text")
    val out = Boilerplate.stripAgainstLineIndex(batch, "doc_id", "text",
        "source", idx, minDf = 2L)
      .select("doc_id", "text_kept", "lines_removed")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(10L) === (("new empty-group doc", 1L)),
      "''-group counts must survive the partition round trip")
    assert(out(11L) === (("new 1-group doc", 1L)))
    assert(out(12L) === (("NUM LINE\nnew 01-group doc", 0L)),
      "'01' must stay a distinct group from '1' (df 1 there)")

    // an index legally built from a batch with ZERO countable lines (all
    // NULL/blank — incl. tab-only lines, which are blank despite trim())
    // must read back as EMPTY, not crash schema inference
    val emptyIdx = tempDir("graft_lineidx_e") + "/idx"
    Boilerplate.writeLineFreqIndex(
      Seq((1L, "d", null.asInstanceOf[String]), (2L, "d", "\t\n  \n\r"))
        .toDF("doc_id", "source", "text"),
      "doc_id", "text", "source", emptyIdx)
    val out2 = Boilerplate.stripAgainstLineIndex(batch, "doc_id", "text",
        "source", emptyIdx, minDf = 2L)
      .agg(sum("lines_removed")).collect().head.getLong(0)
    assert(out2 === 0L, "an empty index strips nothing and must not throw")
  }

  test("bigramRarity flags the planted incoherent doc and only it") {
    val fluent = "the data the data the data the data the data"
    val docs = Seq(
      (1L, fluent), (2L, fluent), (3L, fluent),
      (4L, "zq wv xk jm qp zn wt kv jx mq"), // all-hapax bigrams -> lowq
      (5L, "the data ab cd the data the data the data the data the data the data the data the data"), // 3 rare of 21 -> 14% -> ok
      (6L, null.asInstanceOf[String]),
      (7L, "single")
    ).toDF("doc_id", "text")
    val out = QualityFilters.bigramRarity(docs, "doc_id", "text", rareMax = 1L)
      .select("doc_id", "bigrams_total", "bigrams_rare", "lowq")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out(1L)._3 === false && out(1L)._2 === 0L)
    assert(out(4L)._3 === true, s"all-hapax doc must flag: ${out(4L)}")
    assert(out(4L)._1 === 9L && out(4L)._2 === 9L)
    assert(out(5L)._3 === false,
      s"3 rare of 21 is under the 20% line: ${out(5L)}")
    assert(out(6L) === ((0L, 0L, false)), "NULL text -> 0/0/false, row kept")
    assert(out(7L) === ((0L, 0L, false)), "single-token doc has no bigrams")

    // a NULL id never matches an equi-join key — the left join + coalesce
    // must keep the row with zero metrics rather than dropping it
    val withNullId = Seq(
      (java.lang.Long.valueOf(1L), fluent),
      (null.asInstanceOf[java.lang.Long], "orphan words here")
    ).toDF("doc_id", "text")
    val nullOut = QualityFilters.bigramRarity(withNullId, "doc_id", "text")
      .filter(col("doc_id").isNull)
      .select("bigrams_total", "bigrams_rare", "lowq").collect()
    assert(nullOut.length === 1, "NULL-id row must survive")
    assert(nullOut.head.getLong(0) === 0L && nullOut.head.getLong(1) === 0L &&
      !nullOut.head.getBoolean(2))
  }

  test("temperature weights: exact isqrt, ppm sums to 1e6, flattening monotone in alpha") {
    // isqrt clamp exactness at perfect-square boundaries (float sqrt alone
    // can be off by one there)
    // 94906265 = the largest s with s^2 < 2^53 — the float-precision edge
    for (s <- Seq(0L, 1L, 2L, 3L, 1000L, 94906265L)) {
      val n = s * s
      if (n >= 0) {
        assert(Sampling.isqrt(n) === s, s"isqrt($n)")
        if (n > 0) assert(Sampling.isqrt(n - 1) === s - 1, s"isqrt(${n - 1})")
        if (n + 1 < (s + 1) * (s + 1)) // n+1 may itself be the next square
          assert(Sampling.isqrt(n + 1) === s, s"isqrt(${n + 1})")
      }
    }
    // Long.MaxValue: the clamp's squared check would overflow and wrap —
    // the division form must still return the true floor root
    assert(Sampling.isqrt(Long.MaxValue) === 3037000499L)
    // skewed corpus: 90% of tokens in one domain
    val docs = Seq(
      ("a", 1L, 9000L), ("b", 2L, 600L), ("c", 3L, 400L)
    ).toDF("source", "doc_id", "n_tokens")
    val sqrtW = Sampling.sqrtTemperatureWeightsPpm(
      docs, col("source"), col("n_tokens")).toMap
    assert(sqrtW.values.sum === 1000000L, s"ppm must apportion exactly: $sqrtW")
    // temperature flattens: the dominant domain's share drops below its
    // proportional 90%, the small domains rise above theirs
    assert(sqrtW("a") < 900000L && sqrtW("b") > 60000L && sqrtW("c") > 40000L, s"$sqrtW")
    // ordering preserved: more tokens still means more weight
    assert(sqrtW("a") > sqrtW("b") && sqrtW("b") > sqrtW("c"))
    // alpha = 1 is proportional; the double path at alpha = 0.5 agrees
    // with the exact-integer path within the ppm rounding grain
    val prop = Sampling.temperatureWeightsPpm(
      docs, col("source"), col("n_tokens"), alpha = 1.0).toMap
    assert(math.abs(prop("a") - 900000L) <= 1, s"$prop")
    val half = Sampling.temperatureWeightsPpm(
      docs, col("source"), col("n_tokens"), alpha = 0.5).toMap
    sqrtW.foreach { case (d, p) =>
      assert(math.abs(half(d) - p) <= 2000,
        s"double and integer alpha=0.5 paths drifted at $d: $half vs $sqrtW")
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureWeightsPpm(docs, col("source"), col("n_tokens"), 0.0)
    }
  }

  test("split assignment is disjoint, exhaustive, and monotone-stable") {
    val ids = (1L to 1000L).toDF("id")
    val splits = Sampling.assignSplit(ids, col("id"),
      Seq(("train", 900), ("val", 950), ("test", 1000)))
    assert(splits.count() === 1000) // every row assigned exactly once
    // growing the corpus never reassigns an existing row
    val bigger = Sampling.assignSplit((1L to 2000L).toDF("id"), col("id"),
      Seq(("train", 900), ("val", 950), ("test", 1000)))
    val before = splits.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = bigger.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(before.forall { case (k, v) => after(k) == v })
  }

  test("perKeyCap bounds every key's contribution") {
    val df = Seq.tabulate(500)(i => (s"k${i % 3}", i.toLong)).toDF("key", "id")
    val capped = Sampling.perKeyCap(df, col("key"), col("id"), 7)
    val counts = capped.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ === 7L))
    // deterministic: same rows on re-run
    val again = Sampling.perKeyCap(df.repartition(11), col("key"), col("id"), 7)
    assert(capped.collect().map(_.toString).sorted
      .sameElements(again.collect().map(_.toString).sorted))
  }

  test("shuffleShard is a complete permutation: dense positions, seed-keyed order") {
    val ids = (1L to 2000L).toDF("id")
    val out = Sampling.shuffleShard(ids, col("id"), nShards = 4, seed = "e1")
      .select("id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.length === 2000)
    assert(out.map(_._1).distinct.length === 2000) // every row exactly once
    // positions are dense 1..n within each shard
    out.groupBy(_._2).foreach { case (_, rows) =>
      val ps = rows.map(_._3).sorted
      assert(ps.sameElements(1 to rows.length))
    }
    // deterministic under repartitioning
    val again = Sampling.shuffleShard(ids.repartition(13), col("id"), 4, "e1")
      .select("id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
    // a different seed is a genuinely different permutation
    val e2 = Sampling.shuffleShard(ids, col("id"), 4, "e2")
      .select("id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    assert(out.sortBy(_._1).zip(e2).count { case (a, b) => a != b } > 1000)
    // and the result is not accidentally id-ordered within a shard
    val firstShard = out.filter(_._2 == 0L).sortBy(_._3).map(_._1)
    assert(firstShard.sorted.toSeq !== firstShard.toSeq)
  }

  test("assignSplitLeakFree: no near-dup cluster ever straddles two splits") {
    val real = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = graft.operators.Dedup.assignSplitLeakFree(
      real, "doc_id", "text", Seq(("train", 900), ("val", 950), ("test", 1000)))
    assert(out.count() === real.count()) // every doc assigned exactly once
    val straddling = out.groupBy("rep")
      .agg(countDistinct(col("split")).as("nsplits"))
      .filter(col("nsplits") > 1).count()
    assert(straddling === 0L)
    // sanity: the split is the rep's hash split, so multi-doc clusters exist
    // and at least two splits are populated
    assert(out.select("split").distinct().count() >= 2)
    assert(out.filter(col("rep") =!= col("doc_id")).count() > 0)
  }

  test("connectedComponents labels chains, stars, and singletons with the min id") {
    import graft.operators.Dedup
    // chain 1-2-3-4 (diameter 3), star 10-{11,12,13}, singleton 42
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L),
      (10L, 13L)).toDF("ida", "idb")
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 13L, 42L).toDF("doc_id")
    val reps = Dedup.connectedComponents(pairs, nodes, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(reps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 42L -> 42L))
  }

  test("dedupNear keeps one representative per near-dup cluster plus uniques") {
    import graft.operators.Dedup
    // three word-level paraphrases of one text (near-dups), one unrelated doc
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base), (2L, base + " ok"), (3L, "indeed " + base),
      (9L, "completely different words about spark shuffles and parquet files here"))
      .toDF("doc_id", "text")
    val kept = Dedup.dedupNear(docs, "doc_id", "text", minAgreeFraction = 0.3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept === Array(1L, 9L)) // cluster {1,2,3} -> min id 1; 9 untouched
  }

  test("appendToSignatureIndex: batch 2 catches a near-dup that arrived in batch 1") {
    val idx = tempDir("graft_sigidx_t") + "/idx"
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
      .toDF("doc_id", "text")
    val batch1 = Seq(
      // near-dup of corpus doc 1 → flagged, must NOT be appended
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
      // genuinely new content → clean, appended
      (11L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val batch2 = Seq(
      // near-dup of batch-1's CLEAN doc 11: only catchable via the append
      (20L, "one two three four five six seven eight nine ten eleven thirteen"),
      // near-dup of batch-1's FLAGGED doc 10 ≈ corpus doc 1: must match 1, not 10
      (21L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (22L, "entirely unrelated words about spark parquet shuffles and caching"))
      .toDF("doc_id", "text")
    Dedup.writeSignatureIndex(corpus, "doc_id", "text", idx)
    val clean1 = Dedup.cleanAgainstIndex(batch1, "doc_id", "text", idx,
      minAgreeFraction = 0.3)
    assert(clean1.select("doc_id").collect().map(_.getLong(0)).toSet === Set(11L))
    Dedup.appendToSignatureIndex(clean1, "doc_id", "text", idx)
    val hits = Dedup.dedupAgainstIndex(batch2, "doc_id", "text", idx,
        minAgreeFraction = 0.3)
      .select("doc_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits === Set((20L, 11L), (21L, 1L)),
      s"batch-2 matches must span the appended batch-1 doc and the corpus: $hits")
  }

  test("cleanAndAppendToIndex ≡ cleanAgainstIndex → appendToSignatureIndex") {
    // the fused one-signature-pass form (r19) must leave a bit-identical
    // index and return the identical clean batch
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
      .toDF("doc_id", "text")
    val batch1 = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
      (11L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val batch2 = Seq(
      (20L, "one two three four five six seven eight nine ten eleven thirteen"),
      (21L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (22L, "entirely unrelated words about spark parquet shuffles and caching"))
      .toDF("doc_id", "text")
    val idxSep = tempDir("graft_sigidx_eq_sep") + "/idx"
    val idxFused = tempDir("graft_sigidx_eq_fus") + "/idx"
    Dedup.writeSignatureIndex(corpus, "doc_id", "text", idxSep)
    Dedup.writeSignatureIndex(corpus, "doc_id", "text", idxFused)
    val cleanSep = Dedup.cleanAgainstIndex(batch1, "doc_id", "text", idxSep,
      minAgreeFraction = 0.3)
    Dedup.appendToSignatureIndex(cleanSep, "doc_id", "text", idxSep)
    val cleanFused = Dedup.cleanAndAppendToIndex(batch1, "doc_id", "text",
      idxFused, minAgreeFraction = 0.3)
    // identical clean batch (full rows, not just ids)
    assert(cleanFused.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      === cleanSep.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    // bit-identical appended subtrees (every signature column; both
    // allocate the default append tag's first id)
    def subtree(p: String) = spark.read.parquet(s"$p/_ingest/append/b_0")
      .collect().map(_.toSeq).toSet
    assert(subtree(idxFused) === subtree(idxSep))
    // and identical batch-2 probes end to end
    def probe(p: String) = Dedup.dedupAgainstIndex(batch2, "doc_id", "text", p,
        minAgreeFraction = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(probe(idxFused) === probe(idxSep))
  }

  test("appendToSignatureIndex: staged publish — torn stages invisible, replays overwrite") {
    val base = tempDir("graft_sigidx_stage")
    val idx = base + "/idx"
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
      .toDF("doc_id", "text")
    Dedup.writeSignatureIndex(corpus, "doc_id", "text", idx)
    val batchTxt = "unrelated words about spark shuffles and caching parquet today"
    val batch = Seq((100L, batchTxt)).toDF("doc_id", "text")
    Dedup.appendToSignatureIndex(batch, "doc_id", "text", idx,
      queryTag = "qx", batchId = 7L)
    val probeDocs = Seq((10L, batchTxt + " now")).toDF("doc_id", "text")
    def hits(exclude: Option[String] = None) =
      Dedup.dedupAgainstIndex(probeDocs, "doc_id", "text", idx,
          minAgreeFraction = 0.3, excludeSubtree = exclude)
        .select("doc_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits() === Set((10L, 100L)))
    // a REPLAY of the same (tag, batch) overwrites its subtree — no
    // duplicate subtree, no duplicate rows, identical probe
    Dedup.appendToSignatureIndex(batch, "doc_id", "text", idx,
      queryTag = "qx", batchId = 7L)
    val subtrees = new java.io.File(idx + "/_ingest/qx").listFiles()
      .map(_.getName).sorted.toSeq
    assert(subtrees === Seq("b_7"), s"replay must not accrete: $subtrees")
    assert(hits() === Set((10L, 100L)))
    // the replaying batch probes the PRE-batch state via self-exclusion
    assert(hits(exclude = Some(
      IndexLifecycle.ingestBatchDir(idx, "qx", 7L))) === Set.empty)
    // a TORN stage (crash mid-append: files staged under b_N.tmp, never
    // renamed) is invisible to probes — stage a subtree whose doc WOULD
    // match, assert no phantom hit, then publish it and see the hit
    val idx2 = base + "/idx2"
    Dedup.writeSignatureIndex(corpus, "doc_id", "text", idx2)
    Dedup.appendToSignatureIndex(
      Seq((200L, batchTxt)).toDF("doc_id", "text"), "doc_id", "text", idx2,
      queryTag = "qx", batchId = 0L)
    val conf = spark.sessionState.newHadoopConf()
    val src = new org.apache.hadoop.fs.Path(idx2 + "/_ingest/qx/b_0")
    val torn = new org.apache.hadoop.fs.Path(idx + "/_ingest/qx/b_8.tmp")
    val fs = torn.getFileSystem(conf)
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, torn, false, conf)
    assert(hits() === Set((10L, 100L)),
      "a torn .tmp stage must never reach a probe")
    assert(fs.rename(torn, new org.apache.hadoop.fs.Path(
      idx + "/_ingest/qx/b_8")))
    assert(hits() === Set((10L, 100L), (10L, 200L)),
      "the rename IS the publish: the same files turn visible atomically")
  }

  test("compactSignatureIndex bounds per-band files; probe and metadata survive") {
    val base = tempDir("graft_sigidx_compact")
    val idx = base + "/idx"
    val compacted = base + "/idx2"
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
      .toDF("doc_id", "text")
    Dedup.writeSignatureIndex(corpus, "doc_id", "text", idx)
    (0 until 3).foreach { k =>
      Dedup.appendToSignatureIndex(
        Seq((100L + k, s"unrelated words number $k about spark shuffles and caching today"))
          .toDF("doc_id", "text"),
        "doc_id", "text", idx)
    }
    def bandFiles(p: String): Seq[Int] =
      new java.io.File(p).listFiles().filter(_.getName.startsWith("band="))
        .map(_.listFiles().count(_.getName.endsWith(".parquet"))).toSeq
    // appends accrete as PUBLISHED staged subtrees (stage-then-rename),
    // never as torn files inside the base band dirs
    assert(bandFiles(idx).forall(_ == 1),
      s"base band dirs must be untouched by appends: ${bandFiles(idx)}")
    val subtrees = new java.io.File(idx + "/_ingest/append").listFiles()
      .filter(_.getName.startsWith("b_")).map(_.getName).sorted.toSeq
    assert(subtrees === Seq("b_0", "b_1", "b_2"),
      s"appends must accrete one published subtree each: $subtrees")
    Dedup.compactSignatureIndex(spark, idx, compacted)
    assert(bandFiles(compacted).forall(_ == 1),
      s"compacted bands must hold one file: ${bandFiles(compacted)}")
    assert(!new java.io.File(compacted + "/_ingest").exists(),
      "compaction folds append subtrees into the base tree")
    // the appended docs fold into the compacted artifact: a probe that
    // matches ONLY an appended doc agrees pre/post compaction
    val appendedProbe = Seq(
      (11L, "unrelated words number 1 about spark shuffles and caching today!"))
      .toDF("doc_id", "text")
    def probeAppended(p: String) =
      Dedup.dedupAgainstIndex(appendedProbe, "doc_id", "text", p,
        minAgreeFraction = 0.3)
        .select("doc_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probeAppended(compacted) === probeAppended(idx) &&
      probeAppended(compacted).nonEmpty)
    // the probe validates metadata on the compacted artifact and agrees
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"))
      .toDF("doc_id", "text")
    def probe(p: String) =
      Dedup.dedupAgainstIndex(batch, "doc_id", "text", p, minAgreeFraction = 0.3)
        .select("doc_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe(compacted) === probe(idx) && probe(compacted).nonEmpty)
    intercept[IllegalArgumentException] {
      Dedup.compactSignatureIndex(spark, idx, idx)
    }
    // nesting is as corrupting as equality: a target INSIDE the live index
    // would pollute its partition discovery; a target that CONTAINS it
    // would let the compaction scoop up its own output
    intercept[IllegalArgumentException] {
      Dedup.compactSignatureIndex(spark, idx, idx + "/compacted")
    }
    intercept[IllegalArgumentException] {
      Dedup.compactSignatureIndex(spark, idx + "/./band=0", idx)
    }
  }

  test("signature-index banding metadata fails loud on mismatch") {
    val idx = tempDir("graft_sigidx_m") + "/idx"
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
      .toDF("doc_id", "text")
    Dedup.writeSignatureIndex(corpus, "doc_id", "text", idx)
    // probe with drifted banding: must throw, not return "all clean"
    val drifted = intercept[IllegalArgumentException] {
      Dedup.dedupAgainstIndex(corpus, "doc_id", "text", idx,
        bands = 16, rowsPerBand = 2)
    }
    assert(drifted.getMessage.contains("bands=8"),
      s"mismatch message must name the index's banding: ${drifted.getMessage}")
    // banding that does not tile the signature: rejected at the door
    val badWidth = intercept[IllegalArgumentException] {
      Dedup.writeSignatureIndex(corpus, "doc_id", "text", idx + "2",
        bands = 4, rowsPerBand = 4)
    }
    assert(badWidth.getMessage.contains("signature width"))
    // a directory that was never written by writeSignatureIndex
    val noMeta = intercept[IllegalArgumentException] {
      Dedup.appendToSignatureIndex(corpus, "doc_id", "text",
        tempDir("graft_notidx"))
    }
    assert(noMeta.getMessage.contains("_graft_sigindex_meta"))
  }

  test("ivf cellCap bounds the verify stage; generous cap is byte-identical") {
    // 3 centroids; cell 0 is pathologically occupied (60 near-identical
    // members), cells 1/2 are small
    val rnd = new scala.util.Random(11)
    def jitter(base: Array[Float]): Array[Float] =
      base.map(v => v + rnd.nextFloat() * 0.01f)
    val c0 = Array.tabulate(8)(_ => 1f)
    val c1 = Array.tabulate(8)(i => if (i < 4) 1f else -1f)
    val c2 = Array.tabulate(8)(i => if (i % 2 == 0) 1f else -1f)
    val cents = Seq(0 -> c0, 1 -> c1, 2 -> c2)
    val rows = (0L until 60L).map(i => (100L + i, jitter(c0))) ++
      Seq((200L, jitter(c1)), (201L, jitter(c1)), (300L, jitter(c2)))
    val corpus = rows.toDF("vec_id", "embedding")
    val assigned = Similarity.ivfAssign(corpus, "vec_id", "embedding", cents)
    val queries = Seq((0L, c0), (1L, c1)).toDF("qid", "qvec")
    def run(cap: Int) = Similarity.ivfJoinTopK(assigned, queries,
        "vec_id", "embedding", "qid", "qvec", cents, k = 5, nprobe = 2,
        cellCap = cap)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = run(0)
    assert(run(1000) === uncapped, "cap above every cell size must be a no-op")
    // cap 10: the 60-member cell contributes at most 10 candidates, so the
    // q0 top-5 comes from a 10-member deterministic sample
    val capped = run(10)
    assert(capped === run(10), "hash-ordered sample must be deterministic")
    val q0 = capped.filter(_._1 == 0L).map(_._2)
    assert(q0.size === 5 && q0.forall(id => (id >= 100L && id < 160L)))
    // small cells are untouched: q1 still sees both its members
    assert(capped.filter(_._1 == 1L).map(_._2).intersect(Set(200L, 201L)).size == 2)
    // single-query path takes the same cap
    val single = Similarity.ivfSearchTopK(assigned, "vec_id", "embedding",
      cents, c0, k = 5, nprobe = 1, cellCap = 10)
    assert(single.count() === 5L)
  }

  test("probe-key cap fails loud; deep multi-probe needs no cap (in-plan, dup-safe)") {
    val idx = tempDir("graft_sigidx_cap") + "/idx"
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
      .toDF("doc_id", "text")
    Dedup.writeSignatureIndex(corpus, "doc_id", "text", idx)
    // a "batch" whose probe keys exceed the cap must be rejected with an
    // actionable message, not collected into the driver
    val big = (0L until 40L)
      .map(i => (i, s"unique document number $i with words $i$i $i-$i and more"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupAgainstIndex(big, "doc_id", "text", idx, maxProbeKeys = 100)
    }
    assert(e.getMessage.contains("maxProbeKeys"))
    // under the cap the same call works
    assert(Dedup.dedupAgainstIndex(big, "doc_id", "text", idx).count() === 0L)

    // deep-probe regime is now fully in-plan (Lv07ProbeMasksExpr): no
    // query-count bound and no qid-uniqueness contract — duplicate query
    // rows behave like the shallow regime (processed per row, same probe
    // buckets), so their result sets coincide with the deduped run's
    val vecs = (0L until 10L)
      .map(i => (i, Array.tabulate(8)(j => (i + j + 1).toFloat)))
      .toDF("vec_id", "embedding")
    def hits(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select(col("qid"), col("vec_id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val q = vecs.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val qd = q.unionByName(q)
    val onceQ = hits(Similarity.annJoinTopKMultiProbe(vecs, q, "vec_id",
      "embedding", "qid", "qvec", k = 1, nBits = 2, probes = 4, dim = 8))
    val twiceQ = hits(Similarity.annJoinTopKMultiProbe(vecs, qd, "vec_id",
      "embedding", "qid", "qvec", k = 1, nBits = 2, probes = 4, dim = 8))
    assert(onceQ === twiceQ,
      "duplicated query rows must reach the same per-qid hit sets")
  }

  test("dedupNear exact-collapse path matches the uncollapsed pipeline") {
    // adversarial mix: a 5-twin exact clique, a near-dup of that content,
    // an unrelated doc, and two IDENTICAL short docs (<3 tokens — no
    // signature, so the uncollapsed pipeline keeps BOTH; the collapse gate
    // must leave them alone rather than merging them)
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = (Seq.tabulate(5)(i => (10L + i, base)) ++ Seq(
      (20L, base + " ok"),
      (30L, "completely different words about spark shuffles and parquet files"),
      (40L, "hi there"), (41L, "hi there")))
      .toDF("doc_id", "text")
    def ids(df: org.apache.spark.sql.DataFrame): Array[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).sorted
    val collapsed = ids(Dedup.dedupNear(docs, "doc_id", "text",
      minAgreeFraction = 0.3))
    val uncollapsed = ids(Dedup.dedupNear(docs, "doc_id", "text",
      minAgreeFraction = 0.3, collapseExact = false))
    assert(collapsed === uncollapsed)
    assert(collapsed === Array(10L, 30L, 40L, 41L))
    // survivor-policy form: longest doc wins per cluster, both paths agree
    val withLen = docs.withColumn("n_chars", length(col("text")))
    val bestCollapsed = ids(Dedup.dedupNearBy(withLen, "doc_id", "text",
      keepBy = col("n_chars"), minAgreeFraction = 0.3))
    val bestUncollapsed = ids(Dedup.dedupNearBy(withLen, "doc_id", "text",
      keepBy = col("n_chars"), minAgreeFraction = 0.3, collapseExact = false))
    assert(bestCollapsed === bestUncollapsed)
    assert(bestCollapsed === Array(20L, 30L, 40L, 41L)) // 20 is longest in its cluster
  }

  test("connectedComponents converges on a chain far longer than its round cap") {
    import graft.operators.Dedup
    // 400-node chain: plain min-label propagation would need 399 rounds;
    // large-star/small-star contracts it within the default maxIter=30
    val n = 400L
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("ida", "idb")
    val nodes = (1L to n).toDF("doc_id")
    // smallGraphMaxEdges = 0 forces the DISTRIBUTED star-contraction loop
    // (the convergence property under test); the default would take the
    // driver union-find fast path on 399 edges
    val reps = Dedup.connectedComponents(pairs, nodes, "doc_id",
        smallGraphMaxEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(reps.length === n)
    assert(reps.forall(_._2 == 1L)) // whole chain collapses to min id 1
  }

  test("connectedComponents throws rather than returning a wrong clustering") {
    import graft.operators.Dedup
    // one double-round cannot finish a 200-chain; must throw, not mislabel
    val pairs = (1L until 200L).map(i => (i, i + 1)).toDF("ida", "idb")
    val nodes = (1L to 200L).toDF("doc_id")
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(pairs, nodes, "doc_id", maxIter = 1,
        smallGraphMaxEdges = 0L).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("chunkTokens windows overlap by stride and cover every token") {
    import graft.operators.Packing
    // 5 tokens, chunk 3, stride 2 -> starts 1,3,5: "a b c", "c d e", "e"
    val df = Seq((1L, "a b c d e"), (2L, "x")).toDF("doc_id", "text")
    val out = Packing.chunkTokens(df, "doc_id", "text", chunkSize = 3, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(c => (c._1, c._2))
    assert(out === Seq(
      (1L, 0L, "a b c", 3L), (1L, 1L, "c d e", 3L), (1L, 2L, "e", 1L),
      (2L, 0L, "x", 1L)))
  }

  test("packedBoundaries: offset-ordered doc spans per sequence, overflow recorded at start") {
    val df = Seq(
      (1L, "g", 4L), (2L, "g", 4L), (3L, "g", 4L), (4L, "g", 5L)
    ).toDF("id", "grp", "n")
    val out = graft.operators.Packing
      .packedBoundaries(df, "id", "grp", "n", tokenBudget = 10L)
      .collect().map { r =>
        (r.getString(0), r.getLong(1), r.getLong(2),
          r.getSeq[org.apache.spark.sql.Row](3)
            .map(d => (d.getLong(0), d.getLong(1), d.getLong(2))))
      }.sortBy(_._2)
    // seq 0: docs at offsets 0,4,8 — doc 3 (len 4) overflows past the
    // budget but is recorded once, where it starts; seq 1: doc 4 at off 2
    assert(out === Seq(
      ("g", 0L, 3L, Seq((0L, 1L, 4L), (4L, 2L, 4L), (8L, 3L, 4L))),
      ("g", 1L, 1L, Seq((2L, 4L, 5L)))))
  }

  test("packSequences fills token budgets in id order within each group") {
    import graft.operators.Packing
    // group g: docs of 3, 4, 5 tokens into budget 6:
    //   doc 1 starts at 0 -> seq 0; doc 2 starts at 3 -> seq 0 (spans into 1);
    //   doc 3 starts at 7 -> seq 1. group h restarts at seq 0.
    val df = Seq(
      (1L, "g", "a b c"), (2L, "g", "a b c d"), (3L, "g", "a b c d e"),
      (9L, "h", "a b")).toDF("doc_id", "source", "text")
    val out = Packing.packSequences(df, "doc_id", "text", "source", tokenBudget = 6L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(out === Seq((1L, 3L, 0L), (2L, 4L, 0L), (3L, 5L, 1L), (9L, 2L, 0L)))
  }

  test("multimodal: stub decode is deterministic and batch-shaped") {
    val media = Multimodal.asMedia(docs, "doc_id", "text", "text/plain")
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === 5)
    val f0 = feats.find(_.id == 0L).get
    val f1 = feats.find(_.id == 1L).get
    assert(f0.contentHash === f1.contentHash) // same payload -> same hash
    assert(f0.histogram.sum > 0.99 && f0.histogram.sum < 1.01)
    // frame sampling: every stride-th frame
    val frames = Multimodal.sampleFrames(media, frameBytes = 10, stride = 2).collect()
    val payloadLen = docs.filter(col("doc_id") === 0).collect().head.getString(1).length
    val nFrames = (payloadLen + 9) / 10
    assert(frames.count(_._1 == 0L) === (nFrames + 1) / 2) // every 2nd frame
    // resize: fixed-shape output (exactly target bytes), deterministic
    val small = Multimodal.resize(media, 4, 2).collect()
    assert(small.forall(_.payload.length === 8))
    val again = Multimodal.resize(media, 4, 2).collect()
    assert(small.sortBy(_.id).map(_.payload.toSeq) ===
      again.sortBy(_.id).map(_.payload.toSeq))
  }

  test("multimodal: ImageIoDecoder decodes a real PNG (true dims + luminance histogram)") {
    // 8x4 PNG, left half black, right half white — generated with the same
    // JDK codecs the decoder reads with, so the round-trip is self-contained
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/png", png(8, 4)),
      Multimodal.MediaRow(2L, "image/png", png(16, 2)),
      Multimodal.MediaRow(3L, "application/octet-stream",
        Array[Byte](1, 2, 3, 4, 5))) // not an image -> stub fallback
    val feats = Multimodal
      .extractFeatures(rows.toDS(), Multimodal.ImageIoDecoder)
      .collect().map(f => f.id -> f).toMap
    assert((feats(1L).width, feats(1L).height) === ((8, 4)))
    assert((feats(2L).width, feats(2L).height) === ((16, 2)))
    // half the pixels pure black (lum 0 -> bin 0), half pure white (lum 255
    // -> bin 15); nothing in between
    for (id <- Seq(1L, 2L)) {
      val hist = feats(id).histogram
      assert(math.abs(hist(0) - 0.5) < 1e-9 && math.abs(hist(15) - 0.5) < 1e-9)
      assert(hist.slice(1, 15).forall(_ == 0.0))
    }
    // fallback row got the stub's size-derived shape, job did not fail
    assert((feats(3L).width, feats(3L).height) === ((6, 6)))
    assert(feats(3L).contentHash.length === 32)
  }

  test("int8 quantization: values bounded, extremes hit ±127, zero vector safe") {
    val vecs = Seq(
      (0L, Array(0.5f, -1.0f, 0.25f, 1.0f)), // max|x|=1 -> scale 127
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f)),   // all-zero: scale 0, no div-by-0
      (2L, Array(-0.002f, 0.0012f, 0.0f, 0.002f)) // tiny values still span the range
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(vecs, "embedding")
      .select("vec_id", "q_vec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(out(0L) === Seq(64, -127, 32, 127)) // 0.5*127=63.5 rounds half-up to 64
    assert(out(1L) === Seq(0, 0, 0, 0))
    assert(out(2L) === Seq(-127, 76, 0, 127)) // 0.0012/0.002*127 = 76.2

    assert(out.values.flatten.forall(v => v >= -127 && v <= 127))
  }

  test("ivfSearchTopK probes only the nearest cells; full probe equals brute force") {
    // two orthogonal centroids; corpus split cleanly between their cells
    val cents = Seq(0 -> Array(1.0f, 0.0f), 1 -> Array(0.0f, 1.0f))
    val corpus = Seq(
      (10L, Array(0.9f, 0.1f)), (11L, Array(0.8f, 0.2f)), // cell 0
      (20L, Array(0.1f, 0.9f)), (21L, Array(0.2f, 0.8f))  // cell 1
    ).toDF("vec_id", "embedding")
    val assigned = Similarity.ivfAssign(corpus, "vec_id", "embedding", cents)
    val query = Array(1.0f, 0.05f) // firmly in cell 0

    // nprobe=1: only cell 0's members are candidates
    val one = Similarity.ivfSearchTopK(assigned, "vec_id", "embedding",
      cents, query, k = 10, nprobe = 1).collect().map(_.getLong(0)).toSet
    assert(one === Set(10L, 11L))

    // nprobe=2 (all cells) ranks exactly like the brute-force baseline
    val full = Similarity.ivfSearchTopK(assigned, "vec_id", "embedding",
      cents, query, k = 2, nprobe = 2).collect().map(_.getLong(0)).toSeq
    assert(full === Seq(10L, 11L)) // highest cosine to (1, .05) first
  }

  test("kmeansSeedParallel lands one seed per planted cluster, deterministically") {
    // three well-separated direction clusters in 3-d
    def jitter(base: Array[Float], eps: Float): Seq[Array[Float]] =
      Seq(base, base.map(_ + eps), base.map(_ - eps))
    val pts = (jitter(Array(1f, 0f, 0f), 0.02f) ++
      jitter(Array(0f, 1f, 0f), 0.02f) ++
      jitter(Array(0f, 0f, 1f), 0.02f))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val corpus = pts.toDF("vec_id", "embedding")
    val seeds = Similarity.kmeansSeedParallel(corpus, "vec_id", "embedding",
      k = 3, rounds = 3, seed = 7L)
    assert(seeds.length === 3)
    // each seed points at a distinct axis => assignment splits 3/3/3
    val sizes = Similarity.ivfAssign(corpus, "vec_id", "embedding", seeds)
      .groupBy("centroid_id").count().collect().map(_.getLong(1)).sorted
    assert(sizes.toSeq === Seq(3L, 3L, 3L))
    // deterministic for a fixed seed
    val again = Similarity.kmeansSeedParallel(corpus, "vec_id", "embedding",
      k = 3, rounds = 3, seed = 7L)
    assert(seeds.map(_._2.toSeq) === again.map(_._2.toSeq))
    // and it feeds kmeansFit: one Lloyd step keeps the 3-way split
    val fitted = Similarity.kmeansFit(corpus, "vec_id", "embedding", seeds, 1)
    val sizes2 = Similarity.ivfAssign(corpus, "vec_id", "embedding", fitted)
      .groupBy("centroid_id").count().collect().map(_.getLong(1)).sorted
    assert(sizes2.toSeq === Seq(3L, 3L, 3L))
  }

  test("probeMasks emits flip masks in exact (total margin, mask) order") {
    val rnd = new scala.util.Random(23)
    // brute-force reference: every nonzero mask scored and sorted the way
    // the DuckDB oracle does it
    def brute(margins: IndexedSeq[Double]): Seq[(Double, Int)] =
      (1 until (1 << margins.length)).map { mask =>
        val tot = margins.indices.collect {
          case j if ((mask >> j) & 1) == 1 => margins(j) }.sum
        (tot, mask)
      }.sortBy(identity)
    // continuous random margins (no exact ties): sequence must match the
    // brute-force (total, mask) sort exactly, for any count
    (1 to 50).foreach { _ =>
      val n = 2 + rnd.nextInt(9)
      val margins = IndexedSeq.fill(n)(rnd.nextDouble() * 10)
      val count = 1 + rnd.nextInt((1 << n) - 1)
      val got = Similarity.probeMasks(margins, count)
      val want = brute(margins).take(count).map(_._2)
      assert(got === want, s"n=$n count=$count margins=$margins")
    }
    // exhaustive enumeration: count = 2^n - 1 yields every mask once
    val m5 = IndexedSeq.fill(5)(rnd.nextDouble())
    val all = Similarity.probeMasks(m5, 31)
    assert(all.sorted === (1 to 31))
    // tied margins: emitted SCORES still match the brute-force score
    // sequence and masks stay distinct (tie order among equal scores is
    // unspecified — real margins are continuous)
    val tied = IndexedSeq(1.0, 0.0, 1.0, 0.0)
    val gotTied = Similarity.probeMasks(tied, 15)
    def score(mask: Int) = tied.indices.collect {
      case j if ((mask >> j) & 1) == 1 => tied(j) }.sum
    assert(gotTied.map(score) === brute(tied).map(_._1))
    assert(gotTied.distinct.length === 15)
  }

  test("multi-probe LSH recovers neighbors single-bucket probing misses") {
    // corpus of near-neighbors of one query: with 8 sign bits, some land in
    // adjacent buckets (one low-margin bit differs); multi-probe finds them
    val rnd = new scala.util.Random(3)
    val query = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    val pts = (0 until 40).map { i =>
      (i.toLong, query.map(x => x + (rnd.nextFloat() * 2 - 1) * 0.3f))
    }
    val corpus = pts.toDF("vec_id", "embedding")
    val single = Similarity.annTopK(corpus, "vec_id", "embedding",
      query, k = 40, nBits = 8).collect().map(_.getLong(0)).toSet
    val multi = Similarity.annTopKMultiProbe(corpus, "vec_id", "embedding",
      query, k = 40, nBits = 8, probes = 8).collect().map(_.getLong(0)).toSet
    assert(single.subsetOf(multi), "probe set must include the query's own bucket")
    assert(multi.size > single.size,
      s"multi-probe should widen recall (single=${single.size}, multi=${multi.size})")
    // probes = 2^nBits degenerates to brute force
    val all = Similarity.annTopKMultiProbe(corpus, "vec_id", "embedding",
      query, k = 40, nBits = 8, probes = 256).collect().map(_.getLong(0)).toSet
    assert(all === pts.map(_._1).toSet)
  }

  test("annRecallAt quantifies the multi-probe recall gain") {
    val rnd = new scala.util.Random(5)
    val corpus = (0 until 60)
      .map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val queries = Seq.fill(4)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
    def recall(probes: Int): Double = Similarity.annRecallAt(
      corpus, "vec_id", "embedding", queries, k = 5,
      qv => Similarity.annTopKMultiProbe(corpus, "vec_id", "embedding",
        qv, k = 5, nBits = 6, probes = probes))
    val r1 = recall(1)
    val r8 = recall(8)
    val rAll = recall(64) // full probe = brute force
    assert(r1 <= r8 && r8 <= rAll, s"recall not monotone: $r1, $r8, $rAll")
    assert(rAll === 1.0)
  }

  test("ivfJoinTopK equals per-query ivfSearchTopK across the query set") {
    val rnd = new scala.util.Random(17)
    def onAxis(axis: Int): Array[Float] = {
      val v = Array.fill(8)((rnd.nextFloat() - 0.5f) * 0.2f)
      v(axis) = 1f + rnd.nextFloat() * 0.1f; v
    }
    val corpus = (0 until 40).map(i => (i.toLong, onAxis(i % 4)))
      .toDF("vec_id", "embedding")
    val cents = (0 until 4).map { a =>
      val v = new Array[Float](8); v(a) = 1f; (a, v)
    }
    val assigned = Similarity.ivfAssign(corpus, "vec_id", "embedding", cents)
    val queryVecs = Seq(100L -> onAxis(1), 101L -> onAxis(3))
    val qdf = queryVecs.toDF("qid", "qvec")
    val batch = Similarity.ivfJoinTopK(assigned, qdf,
        "vec_id", "embedding", "qid", "qvec", cents, k = 5, nprobe = 2)
      .select("qid", "vec_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1)).toMap
    queryVecs.foreach { case (qid, qv) =>
      val single = Similarity.ivfSearchTopK(assigned, "vec_id", "embedding",
          cents, qv, k = 5, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
      assert(batch(qid).toSeq === single, s"qid=$qid batch != per-query")
    }
  }

  test("batch multi-probe: probes=1 equals the single-bucket join, more probes widen recall") {
    val rnd = new scala.util.Random(13)
    val query = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    val pts = (0 until 50).map { i =>
      (i.toLong, query.map(x => x + (rnd.nextFloat() * 2 - 1) * 0.4f))
    }
    val corpus = pts.toDF("vec_id", "embedding")
    val qdf = Seq((0, query), (1, query.map(-_))).toDF("qid", "qvec")
    def ids(df: org.apache.spark.sql.DataFrame): Set[(Int, Long)] =
      df.select("qid", "vec_id").collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSet
    val single = ids(Similarity.annJoinTopK(corpus, qdf,
      "vec_id", "embedding", "qid", "qvec", k = 50, nBits = 8, dim = 16))
    val p1 = ids(Similarity.annJoinTopKMultiProbe(corpus, qdf,
      "vec_id", "embedding", "qid", "qvec", k = 50, nBits = 8, probes = 1, dim = 16))
    assert(p1 === single, "probes=1 must reduce to the single-bucket join")
    val p8 = ids(Similarity.annJoinTopKMultiProbe(corpus, qdf,
      "vec_id", "embedding", "qid", "qvec", k = 50, nBits = 8, probes = 8, dim = 16))
    assert(p1.subsetOf(p8), "wider probing keeps every single-bucket hit")
    assert(p8.size > p1.size,
      s"multi-probe should recover cross-bucket neighbors (p1=${p1.size}, p8=${p8.size})")
  }

  test("batch multi-probe deep regime (probes > nBits+1) equals per-query Lv'07") {
    val rnd = new scala.util.Random(29)
    val corpus = (0 until 120)
      .map(i => (i.toLong, Array.fill(12)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val queryVecs = (0 until 4).map(qi =>
      qi.toLong -> Array.fill(12)(rnd.nextFloat() * 2 - 1))
    val qdf = queryVecs.toDF("qid", "qvec")
    // probes = 13 > nBits + 1 = 6: multi-bit flip masks in global
    // total-margin order — the regime the in-plan path cannot express
    val batch = Similarity.annJoinTopKMultiProbe(corpus, qdf,
        "vec_id", "embedding", "qid", "qvec",
        k = 7, nBits = 5, probes = 13, dim = 12)
      .select("qid", "vec_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq).toMap
    queryVecs.foreach { case (qid, qv) =>
      val single = Similarity.annTopKMultiProbe(corpus, "vec_id", "embedding",
          qv, k = 7, nBits = 5, probes = 13)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
      assert(batch.getOrElse(qid, Nil) === single,
        s"qid=$qid deep batch != per-query Lv'07")
    }

    // the shuffle-join strategy (broadcastQueries = false, the bulk-batch
    // plan) must return byte-identical results to the broadcast plan
    val shuffled = Similarity.annJoinTopKMultiProbe(corpus, qdf,
        "vec_id", "embedding", "qid", "qvec",
        k = 7, nBits = 5, probes = 13, dim = 12, broadcastQueries = false)
      .select("qid", "vec_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq).toMap
    assert(shuffled === batch,
      "shuffle-join strategy must not change deep-regime results")

    // array<double> query vectors work in the deep regime too (the in-plan
    // regime always did) — a probes tweak must not flip working code into
    // a driver-side ClassCastException
    val qdfD = qdf.select(col("qid"),
      transform(col("qvec"), x => x.cast("double")).as("qvec"))
    val batchD = Similarity.annJoinTopKMultiProbe(corpus, qdfD,
        "vec_id", "embedding", "qid", "qvec",
        k = 7, nBits = 5, probes = 13, dim = 12)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchF = Similarity.annJoinTopKMultiProbe(corpus, qdf,
        "vec_id", "embedding", "qid", "qvec",
        k = 7, nBits = 5, probes = 13, dim = 12)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchD === batchF, "double and float query vectors must agree")
  }

  test("incremental dedup probes a persisted signature index without shuffling it") {
    import org.apache.spark.sql.functions.col
    val corpus = docs.filter(col("doc_id") =!= 1L) // 0 original; 2 fp; 3 near; 4 unique
    val batch = docs.filter(col("doc_id") === 1L)  // exact dup of corpus doc 0
    val idx = tempDir("graft_sigidx_t")
    Dedup.writeSignatureIndex(corpus, "doc_id", "text", idx)

    val out = Dedup.dedupAgainstIndex(batch, "doc_id", "text", idx)
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // batch side broadcasts; the index is scanned, never sort-merge-shuffled
    assert(plan.contains("BroadcastHashJoin"), "batch side must broadcast")
    assert(!plan.contains("SortMergeJoin"), "index must not shuffle")
    // the probe keys reach the parquet scan as a pushed bh IN filter
    assert(plan.contains("PushedFilters: [In(bh"),
      s"probe keys must push into the index scan:\n${plan.take(2000)}")

    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(rows.map(_._1) === Set(1L), "only the batch doc can be flagged")
    assert(rows.contains((1L, 0L, 32)),
      s"exact dup must match corpus doc 0 on all 32 permutations, got $rows")

    // a batch with no indexed near-dup comes back empty (safe to ingest)
    val clean = Seq((9L, "entirely novel content nothing like the corpus rows at all here"))
      .toDF("doc_id", "text")
    assert(Dedup.dedupAgainstIndex(clean, "doc_id", "text", idx).count() === 0L)

    // keep-side form: indexed dups drop, novel docs survive
    val mixed = batch.unionByName(clean)
    val kept = Dedup.cleanAgainstIndex(mixed, "doc_id", "text", idx)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(9L), "only the novel doc may enter the corpus")
  }

  test("incremental dedup runs on an unbounded stream via foreachBatch") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpus = docs.filter(col("doc_id") =!= 1L)
    val idx = tempDir("graft_sigidx_s")
    Dedup.writeSignatureIndex(corpus, "doc_id", "text", idx)

    val in = MemoryStream[(Long, String)]
    val kept = scala.collection.mutable.Set.empty[Long]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // each microbatch is exactly the bounded batch the probe wants
        kept ++= Dedup.cleanAgainstIndex(batch, "doc_id", "text", idx)
          .select("doc_id").collect().map(_.getLong(0))
        ()
      }.start()
    // doc 1 = exact dup of indexed doc 0 (drops); 9 = novel (enters)
    in.addData((1L, docs.filter(col("doc_id") === 0L).collect().head.getString(1)),
      (9L, "entirely novel content nothing like the corpus rows at all here"))
    q.processAllAvailable(); q.stop()
    assert(kept.toSet === Set(9L),
      s"stream ingest must drop the indexed dup and keep the novel doc, got $kept")
  }

  test("dedup barrier cache is bounded: one live entry, same-input reuse") {
    import org.apache.spark.sql.functions.col
    def cachedCount: Int = spark.sparkContext.getPersistentRDDs.count {
      case (_, rdd) => rdd.getStorageLevel.useMemory || rdd.getStorageLevel.useDisk
    }
    val docsB = docs.withColumn("text", org.apache.spark.sql.functions
      .concat(col("text"), org.apache.spark.sql.functions.lit(" alt")))
    Dedup.nearDuplicates(docs, "doc_id", "text").count()
    val afterFirst = cachedCount
    // same input: the live cache is reused, nothing new persists
    Dedup.nearDuplicates(docs, "doc_id", "text").count()
    assert(cachedCount === afterFirst, "same-input call must reuse the cache")
    // different input: the previous entry is released before the new one
    // lands, so the count never grows by more than one vs the first call
    Dedup.nearDuplicates(docsB, "doc_id", "text").count()
    Thread.sleep(200) // async unpersist
    assert(cachedCount <= afterFirst + 1,
      s"barrier cache leaked: $cachedCount live cached RDDs after swap")
  }

  test("topkIds coerces float scores and int ids at analysis time") {
    import org.apache.spark.sql.functions.col
    graft.functions.TopKIdsAgg.register(spark)
    // FloatType score + IntegerType id: ImplicitCastInputTypes widens both
    // instead of a runtime ClassCastException on an executor
    val df = Seq((0, 1.5f, 10), (0, 2.5f, 4), (0, 2.5f, 3), (0, 0.5f, 9))
      .toDF("g", "s", "i")
      .groupBy("g")
      .agg(graft.functions.TopKIdsAgg.topkIds(col("s"), col("i"), 2).as("ids"))
    assert(df.collect().head.getSeq[Long](1) === Seq(3L, 4L))
  }

  test("annRecallAtBatch equals the per-query evaluator on the same sample") {
    val rnd = new scala.util.Random(9)
    val corpus = (0 until 80)
      .map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val queries = Seq.fill(6)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
    // per-query: single-bucket LSH search, 2 jobs per query
    val perQuery = Similarity.annRecallAt(
      corpus, "vec_id", "embedding", queries, k = 5,
      qv => Similarity.annTopK(corpus, "vec_id", "embedding", qv,
        k = 5, nBits = 6))
    // batch: same single-bucket semantics via the query-set join, and the
    // whole exact side in one heap-aggregated job
    val qdf = queries.zipWithIndex
      .map { case (qv, qi) => (qi, qv) }.toDF("qid", "qvec")
    val ann = Similarity.annJoinTopK(corpus, qdf,
        "vec_id", "embedding", "qid", "qvec", k = 5, nBits = 6, dim = 16)
      .select("qid", "vec_id")
    val batch = Similarity.annRecallAtBatch(
      corpus, "vec_id", "embedding", queries, k = 5, ann)
    assert(batch === perQuery, s"batch $batch != per-query $perQuery")
    assert(perQuery > 0.0 && perQuery < 1.0,
      s"sample should exercise a nontrivial recall, got $perQuery")
  }

  test("ivfBuild end to end: seeded + fitted index answers like brute force") {
    def jitter(base: Array[Float], eps: Float): Seq[Array[Float]] =
      Seq(base, base.map(_ + eps), base.map(_ - eps))
    val pts = (jitter(Array(1f, 0f, 0f), 0.02f) ++
      jitter(Array(0f, 1f, 0f), 0.02f) ++
      jitter(Array(0f, 0f, 1f), 0.02f))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val corpus = pts.toDF("vec_id", "embedding")
    val (assigned, cents) = Similarity.ivfBuild(
      corpus, "vec_id", "embedding", k = 3, iters = 2, seed = 7L)
    val query = Array(0.0f, 1.0f, 0.1f) // in the y-axis cluster
    val hits = Similarity.ivfSearchTopK(assigned, "vec_id", "embedding",
      cents, query, k = 3, nprobe = 1).collect().map(_.getLong(0)).toSet
    // nprobe=1 over a well-separated corpus returns exactly the y-cluster
    assert(hits === Set(3L, 4L, 5L))
  }

  test("kmeans step emits exact per-dimension integer sums and counts") {
    val cents = Seq(0 -> Array(1.0f, 0.0f), 1 -> Array(0.0f, 1.0f))
    val pts = Seq( // two obvious members per centroid
      (10L, Array(2.0f, 0.1f)), (11L, Array(4.0f, -0.1f)),
      (20L, Array(0.1f, 3.0f)), (21L, Array(-0.1f, 5.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.kmeansStep(pts, "vec_id", "embedding", cents, quantScale = 10L)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2))).sortBy(_._1)
    // quantized at scale 10: cluster 0 sums = (20+40, 1-1), cluster 1 = (1-1, 30+50)
    assert(out === Seq((0, 2L, Seq(60L, 0L)), (1, 2L, Seq(0L, 80L))))
  }

  test("tf-idf ranks rare terms above corpus-wide boilerplate") {
    import graft.queries.TextQueries
    val corpus = Seq( // df("common")=3, so even 2x tf scores below a unique term
      (0L, "common common rare0"),
      (1L, "common rare1 rare1"),
      (2L, "common rare2")
    ).toDF("doc_id", "text")
    val top1 = TextQueries.tfidfTopTerms(corpus, "doc_id", "text", 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // "common" appears in every doc (df=3) -> even 3x term frequency loses
    // to a unique term; each doc's top term is its own rare token
    assert(top1 === Map(0L -> "rare0", 1L -> "rare1", 2L -> "rare2"))
  }

  test("bm25 column path equals the scalar reference; ranking and guards hold") {
    import graft.queries.TextQueries
    val corpus = Seq(
      (0L, "a a b x"),     // dl 4
      (1L, "a c"),         // dl 2
      (2L, "b b b c y y"), // dl 6
      (3L, "z z")          // no query term -> excluded
    ).toDF("doc_id", "text")
    val got = TextQueries.bm25Rank(corpus, "doc_id", "text", Seq("a", "b"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))

    // scalar reference: the same Okapi formula in plain doubles, floored
    // to micro-units per (doc, term) before the per-doc sum
    val n = 4L; val avgdl = (4 + 2 + 6 + 2).toDouble / 4
    def sq(tf: Long, df: Long, dl: Long): Long =
      math.floor(math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
        (tf * (1.2 + 1)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) *
        1000000).toLong
    val exp = Map( // (doc -> total micro-score)
      0L -> (sq(2, 2, 4) + sq(1, 2, 4)), // a x2, b x1
      1L -> sq(1, 2, 2),                 // a x1
      2L -> sq(3, 2, 6))                 // b x3
    assert(got.map(r => r._1 -> r._2).toMap === exp)
    // ranks follow (score desc, doc_id asc) and doc 3 never appears
    assert(got.sortBy(_._3).map(_._1).toSeq ===
      exp.toSeq.sortBy { case (id, s) => (-s, id) }.map(_._1))
    assert(!got.exists(_._1 == 3L))
    intercept[IllegalArgumentException](
      TextQueries.bm25Rank(corpus, "doc_id", "text", Nil, 5))
  }

  test("MAD outlier flags: robust to the outlier itself; exact half-grid medians") {
    import graft.operators.QualityFilters
    // key 1: values 10,11,12,13,1000 -> median 12, deviations 2,1,0,1,988
    // -> MAD 1; only 1000 breaks |v-med| > 3*MAD (13 has dev 1 = MAD*1).
    // A mean/stddev rule would let 1000 drag the threshold; MAD must not.
    // key 2: even count exercises the half-grid (median 1.5 -> med2 = 3)
    val df = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), (1L, 1000L),
      (2L, 1L), (2L, 2L)).toDF("k", "v")
    val out = QualityFilters.madOutlierFlags(df, Seq("k"), "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out((1L, 1000L))._3 == 1L)
    assert(Seq(10L, 11L, 12L, 13L).forall(v => out((1L, v))._3 == 0L))
    // med2 = 2*12; d2 = |2v-24| = (4,2,0,2,1976), median 2 -> mad4 = 4
    assert(out((1L, 10L)) == (24L, 4L, 0L))
    assert(out((2L, 1L))._1 == 3L, "even-count median must land on the half grid")
    // NULL values belong to no distribution
    val n = QualityFilters.madOutlierFlags(
      Seq((1L, Option(5L)), (1L, Option(6L)), (1L, Option.empty[Long]))
        .toDF("k", "v"), Seq("k"), "v")
      .where($"v".isNull).collect()
    assert(n.length == 1 && n.head.isNullAt(4))
    intercept[IllegalArgumentException](
      QualityFilters.madOutlierFlags(df.withColumn("v", $"v".cast("double")),
        Seq("k"), "v"))
  }

  test("percentile buckets: shared tie ranks, null scores rank nothing, loud guards") {
    import graft.operators.QualityFilters
    // key 1: scores 10,10,20,30,40 -> ranks 1,1,3,4,5; pr_ppm over n=5:
    // 0,0,400000,600000,800000 -> head,head,middle,middle,tail
    val df = Seq((1L, 0L, Option(10L)), (1L, 1L, Option(10L)),
      (1L, 2L, Option(20L)), (1L, 3L, Option(30L)), (1L, 4L, Option(40L)),
      (2L, 5L, Option(7L)), (2L, 6L, Option.empty[Long]))
      .toDF("k", "id", "s")
    val out = QualityFilters.percentileBuckets(df, Seq("k"), "s")
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) "null" else r.getString(4))).toMap
    assert(out(0L) == (0L, "head") && out(1L) == (0L, "head"))
    assert(out(2L) == (400000L, "middle") && out(3L) == (600000L, "middle"))
    assert(out(4L) == (800000L, "tail"))
    // a NULL score must not shift key 2's single scored row off rank 1
    assert(out(5L) == (0L, "head") && out(6L) == (-1L, "null"))
    val custom = QualityFilters.percentileBuckets(df.where($"s".isNotNull),
        Seq("k"), "s", cutsPpm = Seq(500000L), labels = Seq("lo", "hi"))
      .collect().map(r => r.getLong(1) -> r.getString(4)).toMap
    assert(custom(2L) == "lo" && custom(3L) == "hi")
    intercept[IllegalArgumentException](QualityFilters.percentileBuckets(
      df, Seq("k"), "s", cutsPpm = Seq(500000L), labels = Seq("only")))
    intercept[IllegalArgumentException](QualityFilters.percentileBuckets(
      df, Seq("k"), "s", cutsPpm = Seq(700000L, 300000L),
      labels = Seq("a", "b", "c")))
  }

  test("salted join equals the plain join on a planted hot key") {
    val big = ((0 until 200).map(i => (1L, s"hot$i")) ++ // one key with 200 rows
      Seq((2L, "cold-a"), (3L, "cold-b"))).toDF("k", "payload")
    val dim = Seq((1L, "one"), (2L, "two"), (4L, "unmatched")).toDF("dk", "name")
    val salted = graft.operators.Salting.saltedJoin(big, "k", dim, "dk", 4)
      .select("k", "payload", "name").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val plain = big.join(dim, col("k") === col("dk"))
      .select("k", "payload", "name").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(salted === plain)
    assert(salted.length === 201) // 200 hot matches + cold-a; cold-b/4 drop
    // 0 buckets would silently empty the join — must fail loudly
    intercept[IllegalArgumentException] {
      graft.operators.Salting.saltedJoin(big, "k", dim, "dk", 0)
    }
  }

  test("internal output columns never silently clobber caller data") {
    import graft.operators.Salting
    val withSalt = Seq((1L, "x")).toDF("k", "__salt")
    val plain = Seq((1L, "y")).toDF("dk", "name")
    intercept[IllegalArgumentException] { // big side carries __salt
      Salting.saltedJoin(withSalt, "k", plain, "dk", 2)
    }
    intercept[IllegalArgumentException] { // small side carries __salt
      Salting.saltedJoin(plain.toDF("k", "name"), "k", withSalt.toDF("dk", "__salt"), "dk", 2)
    }
    intercept[IllegalArgumentException] {
      Salting.saltedAggregate(withSalt, Seq("k"), 2,
        Seq(count(lit(1)).as("c")), Seq(sum(col("c")).as("c")))
    }
    intercept[IllegalArgumentException] {
      Similarity.quantizeInt8(
        Seq((1L, Array(1.0f), 2.0)).toDF("id", "v", "q_scale"), "v")
    }
    intercept[IllegalArgumentException] {
      graft.queries.TextQueries.redact(
        Seq((1L, "t", 0)).toDF("id", "t", "n_redacted"), "t", "[0-9]+")
    }
  }

  test("kmeans step fails loudly on ragged or null-element vectors") {
    val cents = Seq(0 -> Array(1.0f, 0.0f))
    val ragged = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(1.0f))) // dim 2 vs 1
      .toDF("vec_id", "embedding")
    val e1 = intercept[Exception] {
      Similarity.kmeansStep(ragged, "vec_id", "embedding", cents).collect()
    }
    assert(e1.getMessage.contains("kmeansStep") ||
      e1.getCause != null && e1.getCause.getMessage.contains("kmeansStep"))
    val withNull = Seq((1L, Array[java.lang.Float](1.0f, null)))
      .toDF("vec_id", "embedding")
    intercept[Exception] {
      Similarity.kmeansStep(withNull, "vec_id", "embedding", cents).collect()
    }
  }

  test("redaction replaces every match and counts them per row") {
    import graft.queries.TextQueries
    val rows = Seq(
      (0L, "call 555-0199 or 555-0200 now"),
      (1L, "no digits here"),
      (2L, "x1y22z333")
    ).toDF("id", "t")
    val out = TextQueries.redact(rows, "t", "[0-9]+", "#")
      .select("id", "n_redacted", "t_redacted").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    assert(out(0L) === ((4, "call #-# or #-# now")))
    assert(out(1L) === ((0, "no digits here")))
    assert(out(2L) === ((3, "x#y#z#")))
  }

  // Three well-separated axis centroids; vectors land in the cluster of
  // their dominant axis, with a small id-keyed wobble on another axis so
  // cosines within a cluster are distinct (prototype ranking is total).
  private def clusterFixture(perCluster: Seq[Int]): org.apache.spark.sql.DataFrame = {
    val cents = Seq(0 -> Array(1f, 0f, 0f), 1 -> Array(0f, 1f, 0f),
      2 -> Array(0f, 0f, 1f))
    val rows = for {
      (n, cid) <- perCluster.zipWithIndex
      i <- 0 until n
    } yield {
      val id = cid * 1000L + i
      val wobble = 0.01f * (i % 17)
      val v = Array.fill(3)(0f)
      v(cid) = 1f
      v((cid + 1) % 3) = wobble
      (id, v.toSeq)
    }
    rows.toDF("id", "vec")
  }

  private val axisCentroids = Seq(0 -> Array(1f, 0f, 0f),
    1 -> Array(0f, 1f, 0f), 2 -> Array(0f, 0f, 1f))

  test("clusterBalancedCap bounds every cluster and is repartition-stable") {
    val df = clusterFixture(Seq(60, 12, 3))
    val out = Sampling.clusterBalancedCap(df, "id", "vec", axisCentroids, 20)
    val counts = out.groupBy("centroid_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts === Map(0 -> 20L, 1 -> 12L, 2 -> 3L)) // cap bites only the head
    // every survivor kept its true nearest centroid
    out.select("id", "centroid_id").collect().foreach { r =>
      assert(r.getInt(1) === (r.getLong(0) / 1000L).toInt)
    }
    val again = Sampling.clusterBalancedCap(
      df.repartition(7), "id", "vec", axisCentroids, 20)
    assert(out.select("id").collect().map(_.getLong(0)).sorted
      .sameElements(again.select("id").collect().map(_.getLong(0)).sorted))
    intercept[IllegalArgumentException] {
      Sampling.clusterBalancedCap(df, "id", "vec", axisCentroids, 0)
    }
    intercept[IllegalArgumentException] { // fresh-column guard
      Sampling.clusterBalancedCap(df.withColumn("cosine", lit(0.0)),
        "id", "vec", axisCentroids, 5)
    }
  }

  test("clusterPrototypeDrop removes the exact integer count of most-prototypical rows") {
    val df = clusterFixture(Seq(10, 7, 1))
    // 40% drop: per-cluster drops = (n*400000) div 1e6 = 4, 2, 0
    val out = Sampling.clusterPrototypeDrop(df, "id", "vec", axisCentroids,
      dropPpm = 400000L)
    val byCluster = out.select("id", "centroid_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._2).map { case (c, rs) => c -> rs }
    assert(byCluster(0).length === 6 && byCluster(1).length === 5 &&
      byCluster(2).length === 1)
    // the DROPPED rows are the prototypes: every kept cosine is <= every
    // dropped cosine (rank by cosine desc ties broken by id)
    val assigned = Similarity.ivfAssign(df, "id", "vec", axisCentroids)
      .select("id", "centroid_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val droppedC0 = assigned.filter(_._2 == 0).map(_._1)
      .diff(byCluster(0).map(_._1)).toSet
    val dropMin = assigned.filter(r => droppedC0(r._1)).map(_._3).min
    assert(byCluster(0).forall(_._3 <= dropMin))
    // dropPpm=0 keeps everything
    assert(Sampling.clusterPrototypeDrop(df, "id", "vec", axisCentroids, 0L)
      .count() === 18L)
    intercept[IllegalArgumentException] {
      Sampling.clusterPrototypeDrop(df, "id", "vec", axisCentroids, 1000000L)
    }
  }
}
