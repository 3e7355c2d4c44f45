package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** Substring-level deduplication: find and remove token spans that repeat
  * ACROSS documents (boilerplate, licence headers, templated navigation,
  * mirrored paragraphs) — the within-document complement to the
  * whole-document near-dup machinery in [[Dedup]]. Follows the published
  * ExactSubstr recipe (Lee et al., "Deduplicating Training Data Makes
  * Language Models Better", ACL 2022): a span is duplicated when its
  * length-`n` token window occurs in at least `minDocs` distinct documents;
  * overlapping duplicated windows merge into maximal spans.
  *
  * The reference engine has no analog (its dedup surface is record-level);
  * this is a training-data-pipeline operator in the `BASELINE.json`
  * beyond-parity set.
  *
  * Distributed shape, in order:
  *   1. byte-identical documents COLLAPSE to one representative per content
  *      hash first (`collapseExact`, on by default — one `groupBy(md5)`
  *      shuffle, the exact-dedup shape): identical text yields identical
  *      grams and identical spans, so computing on distinct content and
  *      fanning the spans back out is semantics-preserving, while a
  *      crawl-shaped corpus (mirrors, reposts) never explodes duplicate
  *      grams. Multiplicity is carried so 100 copies of a unique document
  *      still count as 100 toward `minDocs` — exactly as the naive path
  *      counts them;
  *   2. n-gram hashing is MAP-SIDE (posexplode of a per-row array — no
  *      shuffle, no driver state);
  *   3. document frequency is ONE shuffle on the 128-bit gram hash — the
  *      same canonical shape as exact dedup, and the only corpus-wide
  *      exchange;
  *   4. the hit join shuffles gram rows on the same hash key (AQE
  *      broadcasts the duplicated-hash side when it is small, the common
  *      case — boilerplate is a tiny fraction of distinct grams);
  *   5. island-merging windows PARTITION BY content, so the sort is
  *      per-content local and never global.
  * Nothing collects to the driver; every stage scales row-wise at 100 TB.
  *
  * The (distinct) content is deliberately tokenized TWICE (dup detection +
  * hit join): persisting the exploded gram frame to scan once would cache
  * a dataset several times the corpus size — at 100 TB, recomputing a
  * map-side explode is far cheaper than materializing it.
  */
object SpanDedup {

  /** One row per (key, 0-based token position): the full md5 hex of the
    * length-`n` token window starting there. Full md5, not the 32-bit
    * prefix: duplicate detection compares hashes for EQUALITY across the
    * whole corpus, and a 32-bit space would produce ~1 false merge per
    * 100k grams (birthday bound) — a correctness hazard the 128-bit space
    * removes for any realistic corpus. `carry` columns ride along verbatim
    * (content multiplicity on the collapsed path).
    */
  private def gramHashes(df: DataFrame, keyCol: String, textCol: String,
      n: Int, carry: Seq[String] = Nil,
      tokenizer: Tokenizer = Tokenizer.Ascii): DataFrame =
    df.select(col(keyCol) +: carry.map(col) :+
        posexplode(TextQueries.ngramsCol(col(textCol), n, tokenizer))
          .as(Seq("s", "__g")): _*)
      .select(col(keyCol) +: carry.map(col) :+
        col("s").cast("long").as("s") :+ md5(col("__g")).as("h"): _*)

  /** Merged maximal spans over positioned duplicated-window hits:
    * classic gaps-and-islands, partitioned by `keyCol`.
    */
  private def mergeIslands(hits: DataFrame, keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("s"))
    val prevMax = max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val newIsland = when(col("s") > coalesce(prevMax, lit(-1L)), 1).otherwise(0)
    hits.withColumn("__grp",
        sum(newIsland).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__grp"))
      .agg(min(col("s")).as("span_start"), max(col("e")).as("span_end"))
      .select(col(keyCol), col("span_start"), col("span_end"))
  }

  /** Duplicated-window HITS per distinct content: `(__ch, s, e, __rep,
    * __keep)` where `__ch` = md5 of the raw text, `__rep` = the content's
    * lowest doc id, and `__keep` = the lowest doc id in the WHOLE corpus
    * containing this window's gram (the first-occurrence keeper). Document
    * frequency counts each content's full document multiplicity, so
    * results are identical to computing on the uncollapsed corpus.
    */
  private def contentHits(df: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int,
      tokenizer: Tokenizer = Tokenizer.Ascii): DataFrame = {
    // groupBy the TEXT ITSELF: string grouping KEYS hash-aggregate fine
    // (only string agg BUFFERS force SortAggregate — first(text) would),
    // and the map-side partial agg collapses same-partition copies before
    // the shuffle ships them.
    //
    // The respread after the collapse is LOAD-BEARING: the aggregate's
    // OUTPUT is small (distinct contents), so AQE coalesces its exchange
    // toward one partition — and the expensive downstream work (tokenize +
    // per-gram md5, recomputed per leg) would then run on one core. AQE
    // sizes stages by input bytes and cannot see the ~45× explode
    // amplification behind them; the explicit round-robin (REPARTITION_BY_NUM
    // is exempt from coalescing) keeps the gram legs at full width. Cost:
    // one contents-sized exchange, dwarfed by the gram-volume shuffles it
    // feeds. Measured at sf0.1: the collapsed path dropped 12 s → ~3 s
    // (the 1× overhead vs the naive path is the collapse shuffle itself).
    val width = df.sparkSession.sparkContext.defaultParallelism
    val contents = df.groupBy(col(textCol))
      .agg(count(lit(1)).as("__mult"), min(col(idCol)).as("__rep"))
      .withColumn("__ch", md5(col(textCol)))
      .repartition(width)
    val grams = gramHashes(contents, "__ch", textCol, n,
      carry = Seq("__mult", "__rep"), tokenizer = tokenizer)
    val dupStats = grams
      .select(col("h"), col("__ch"), col("__mult"), col("__rep")).distinct()
      .groupBy(col("h"))
      .agg(sum(col("__mult")).as("__df"), min(col("__rep")).as("__keep"))
      .filter(col("__df") >= minDocs)
      .select(col("h"), col("__keep"))
    grams.join(dupStats, Seq("h"))
      .select(col("__ch"), col("s"), (col("s") + n).as("e"),
        col("__rep"), col("__keep"))
  }

  /** Spans per DISTINCT CONTENT (cut-everything policy): `(__ch,
    * span_start, span_end)`.
    */
  private def spansByContent(df: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int,
      tokenizer: Tokenizer = Tokenizer.Ascii): DataFrame =
    mergeIslands(
      contentHits(df, idCol, textCol, n, minDocs, tokenizer)
        .select(col("__ch"), col("s"), col("e")),
      "__ch")

  /** Maximal duplicated token spans per document: `(idCol, span_start,
    * span_end)` in 0-based token indices, end-exclusive. A position starts
    * a duplicated window when its `n`-gram occurs in >= `minDocs` distinct
    * documents; overlapping and adjacent windows merge.
    *
    * `collapseExact` (default) computes spans once per distinct content and
    * fans them back out to every copy — same output, bounded gram volume
    * under crawl-scale exact duplication. Pass `false` to skip the collapse
    * shuffle on a corpus known to be exact-dedup'd already.
    */
  def duplicateTokenSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDocs: Int = 2,
      collapseExact: Boolean = true,
      tokenizer: Tokenizer = Tokenizer.Ascii): DataFrame = {
    require(n >= 2, s"duplicateTokenSpans: n must be >= 2, got $n")
    require(minDocs >= 2, s"duplicateTokenSpans: minDocs must be >= 2, got $minDocs")
    if (collapseExact) {
      spansByContent(df, idCol, textCol, n, minDocs, tokenizer)
        .join(df.select(col(idCol), md5(col(textCol)).as("__ch")), Seq("__ch"))
        .select(col(idCol), col("span_start"), col("span_end"))
    } else {
      val grams = gramHashes(df, idCol, textCol, n, tokenizer = tokenizer)
      // df(gram) >= minDocs over DISTINCT documents: dedup (doc, h) first so
      // a gram repeated WITHIN one doc does not count as cross-doc duplication
      val dupHashes = grams.select(col("h"), col(idCol)).distinct()
        .groupBy(col("h")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") >= minDocs)
        .select(col("h"))
      mergeIslands(
        grams.join(dupHashes, Seq("h"))
          .select(col(idCol), col("s"), (col("s") + n).as("e")),
        idCol)
    }
  }

  /** Cut every duplicated span out of each document. Output one row per
    * input row: `(idCol, clean_text, n_removed)` where `clean_text` is the
    * surviving NORMALIZED tokens rejoined with single spaces (the same
    * normalization the dedup hashes saw — byte-faithful splicing of the
    * original text would need char offsets, which tokenization does not
    * preserve) and `n_removed` counts the removed tokens.
    *
    * The cut itself is map-side: the merged spans aggregate to one small
    * array per distinct content, join back to the corpus on the content
    * hash (AQE broadcasts the span side when boilerplate is sparse), and
    * the token filter runs inside higher-order array functions — no second
    * explode, no extra shuffle over the corpus.
    */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDocs: Int = 2,
      tokenizer: Tokenizer = Tokenizer.Ascii): DataFrame =
    cutSpans(df, idCol, textCol,
      spansByContent(df, idCol, textCol, n, minDocs, tokenizer)
        .groupBy(col("__ch"))
        .agg(collect_list(struct(col("span_start").as("s"), col("span_end").as("e")))
          .as("__spans")),
      spanCol = coalesce(col("__spans"),
        array().cast("array<struct<s:bigint,e:bigint>>")),
      tokenizer = tokenizer)

  /** [[removeDuplicateSpans]] with the published ExactSubstr keep-one
    * policy (Lee et al. ACL'22 remove all-but-one occurrence): each
    * duplicated window SURVIVES in its first-occurrence document — the
    * lowest doc id in the corpus containing that gram — and is cut
    * everywhere else. Boilerplate is removed corpus-wide without
    * destroying its last copy.
    *
    * The collapse keeps this cheap: a window's keeper is always some
    * content's REPRESENTATIVE doc (the content's min id), so each distinct
    * content needs at most TWO cut-sets — the full span set (every non-rep
    * doc, and reps that keep nothing) and a reduced set for its rep doc
    * (merged over only the hits whose keeper is a DIFFERENT doc). Both
    * merge per content, never per document; the fan-out join stays the
    * same single join on the content hash.
    */
  /** One-slot barrier for the keep-first HIT table (same machinery and
    * staleness contract as [[Dedup.releaseBarriers]]): `hits` is referenced
    * three times below (full cut-sets, keeper reps, reduced rep cut-sets),
    * and each reference would recompute the whole gram pipeline —
    * tokenize, gram shuffle, df join — while the hit table itself is tiny
    * (one row per duplicated window occurrence). Call [[releaseBarriers]]
    * after in-place overwrites of a live input, or to free the pinned
    * blocks in a long-lived session.
    */
  private val lastHitsBarrier =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  def releaseBarriers(): Unit =
    lastHitsBarrier.synchronized {
      val prev = lastHitsBarrier.getAndSet(null)
      if (prev != null && !prev.sparkSession.sparkContext.isStopped)
        prev.unpersist(blocking = false)
    }

  def removeDuplicateSpansKeepFirst(df: DataFrame, idCol: String,
      textCol: String, n: Int = 5, minDocs: Int = 2,
      tokenizer: Tokenizer = Tokenizer.Ascii): DataFrame = {
    val hits = Dedup.swapBarrier(lastHitsBarrier,
      contentHits(df, idCol, textCol, n, minDocs, tokenizer))
    def packed(src: DataFrame, out: String): DataFrame =
      mergeIslands(src.select(col("__ch"), col("s"), col("e")), "__ch")
        .groupBy(col("__ch"))
        .agg(collect_list(struct(col("span_start").as("s"), col("span_end").as("e")))
          .as(out))
    val allSpans = packed(hits, "__spans_all")
    // contents whose rep doc keeps at least one window — joined SEPARATELY
    // from the reduced span list, because a rep that keeps EVERYTHING has an
    // empty reduced set (no rows to pack) but must still be exempted from
    // the full cut-set
    val keeperReps = hits.filter(col("__keep") === col("__rep"))
      .select(col("__ch"), col("__rep")).distinct()
    // the rep doc's reduced cut-set: only windows whose keeper is elsewhere
    val repSpans = packed(hits.filter(col("__keep") =!= col("__rep")), "__spans_rep")
    val spans = allSpans
      .join(repSpans, Seq("__ch"), "left")
      .join(keeperReps, Seq("__ch"), "left")
    val empty = array().cast("array<struct<s:bigint,e:bigint>>")
    cutSpans(df, idCol, textCol, spans,
      spanCol = when(col(idCol) === col("__rep"),
          coalesce(col("__spans_rep"), empty))
        .otherwise(coalesce(col("__spans_all"), empty)),
      tokenizer = tokenizer)
  }

  /** Shared cut: join per-content span arrays to the corpus on the content
    * hash and filter tokens through higher-order array functions.
    */
  private def cutSpans(df: DataFrame, idCol: String, textCol: String,
      spans: DataFrame, spanCol: Column,
      tokenizer: Tokenizer = Tokenizer.Ascii): DataFrame = {
    val covered = (i: Column) =>
      exists(spanCol, s => i >= s.getField("s") && i < s.getField("e"))
    def keptOf(t: Column): Column = filter(
      transform(t, (tok, i) =>
        when(covered(i.cast("long")), lit(null).cast("string")).otherwise(tok)),
      _.isNotNull)
    // clean_text and n_removed both need the token and kept arrays, and
    // Catalyst's projection collapse would inline the tokenize +
    // O(tokens × spans) coverage scan into EACH output column — a
    // constant-factor multiply on the corpus-wide cut. Two let-binding
    // layers prevent every duplication: the single-element transforms
    // (the winnowFingerprints pattern) pin t/k WITHIN the struct, and the
    // `inline` generator evaluates the one-element struct array exactly
    // once per row before expanding its fields to columns (a plain
    // two-column select of result.getField(...) would re-inline the whole
    // chain per column).
    val packed = transform(array(tokenizer.column(col(textCol))), t =>
      element_at(
        transform(array(keptOf(t)), k =>
          struct(
            array_join(k, " ").as("clean_text"),
            (size(t) - size(k)).cast("long").as("n_removed"))),
        1))
    df.withColumn("__ch", md5(col(textCol)))
      .join(spans, Seq("__ch"), "left")
      .select(col(idCol), inline(packed))
  }
}
