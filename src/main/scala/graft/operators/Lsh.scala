package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Shared LSH candidate-pair generation: the one bucket-pairing shape every
  * near-dup path (MinHash bands over text, random-hyperplane bands over
  * embeddings, df-capped shingle blocks) reduces to, with the hot-bucket
  * guard built in so no caller can accidentally ship the unguarded
  * quadratic pairing.
  *
  * Shape: ONE shuffle — `repartition` on the bucket key + sort within
  * partitions by (key, id) — then a STREAMING scan over consecutive key
  * runs in `mapPartitions`. Per-group memory is O(threshold): a cold bucket
  * buffers at most threshold+1 distinct ids before exploding its C(n,2)
  * pairs; the moment a bucket exceeds the threshold it switches to
  * streaming emission (star pairs) or streaming skip (drop mode) and never
  * buffers another id. A mega-hot boilerplate bucket (10^8 docs on one
  * shingle) therefore costs one task LINEAR output and CONSTANT memory —
  * unlike a `collect_list`/`collect_set` aggregation, whose per-group
  * buffer would hold the whole bucket before any size filter could see it.
  */
object Lsh {

  /** Distinct candidate id pairs (`ida` < `idb`) from bucket-key rows: a pair
    * is a candidate iff both ids share one row's `keyCols` value.
    *
    * `hotBucketThreshold` (0 = unbounded, explicit opt-out) guards against
    * the hot-bucket quadratic blowup. Buckets at or under the threshold
    * generate all pairs; a LARGER bucket switches to the star pattern —
    * every member pairs with the bucket's lowest id only — contributing n−1
    * pairs instead of C(n,2) while every member keeps candidacy through the
    * shared representative (a truncating cap would orphan the overflow docs:
    * identical docs share ALL bucket keys, so per-bucket truncation removes
    * the same docs everywhere). The recall cost is only cross-pairs among
    * non-representative members of a hot bucket — irrelevant for
    * dedup-by-connected-components, where the star already links the bucket.
    */
  def candidatePairs(exploded: DataFrame, idCol: String, keyCols: Seq[String],
      hotBucketThreshold: Int): DataFrame =
    scanRuns(exploded, idCol, keyCols, hotBucketThreshold,
      hotStar = true, emitMembers = false)
      .select(col("a").as("ida"), col("b").as("idb"))
      .distinct()

  /** Output schema of [[scanRuns]]: `tag` 0 = candidate pair (a, b) with
    * a < b; `tag` 1 = kept-group member row (a = id, b = 0), emitted once
    * per distinct id of each non-hot group when `emitMembers` is on.
    */
  val ScanSchema: StructType = StructType(Seq(
    StructField("tag", IntegerType, nullable = false),
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false)))

  /** One-shuffle streaming run scan (see object doc). `hotStar` picks the
    * over-threshold behavior: star pairs (LSH candidacy) vs drop the whole
    * bucket (df-capped set similarity, where an over-shared key carries no
    * signal). Ids must be long (every id column in this repo is).
    */
  def scanRuns(exploded: DataFrame, idCol: String, keyCols: Seq[String],
      threshold: Int, hotStar: Boolean, emitMembers: Boolean): DataFrame = {
    val keyLen = keyCols.length
    // null ids are dropped (the aggregation formulations this replaces
    // skipped them too); the cast requires numeric ids — every id column in
    // this repo is long already
    val proj = exploded.filter(col(idCol).isNotNull).select(
      keyCols.map(col) :+ col(idCol).cast("long").as("__id"): _*)
    val sorted = proj.repartition(keyCols.map(col): _*)
      .sortWithinPartitions(keyCols.map(col) :+ col("__id"): _*)
    sorted.mapPartitions { rows =>
      new RunScanner(rows.buffered, keyLen, threshold, hotStar, emitMembers)
    }(Encoders.row(ScanSchema))
  }

  /** Shared-count overlap pairs from a [[scanRuns]] output (emitMembers
    * must be on): distinct id pairs with `shared` (co-occurring keys) and
    * `u` (union of the two ids' key counts over the df-capped key
    * universe — dropped over-threshold keys contribute to NEITHER side).
    * The one aggregation tail winnowing overlap and video frame overlap
    * share.
    */
  def overlapPairsFromScan(scan: DataFrame, minShared: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val inter = scan.filter(col("tag") === 0)
      .groupBy(col("a").as("ida"), col("b").as("idb"))
      .agg(count(lit(1)).as("shared"))
    val sz = scan.filter(col("tag") === 1)
      .groupBy(col("a").as("__oid")).agg(count(lit(1)).as("n"))
    inter.join(sz.as("na"), col("na.__oid") === col("ida"))
      .join(sz.as("nb"), col("nb.__oid") === col("idb"))
      .select(col("ida"), col("idb"), col("shared"),
        (col("na.n") + col("nb.n") - col("shared")).as("u"))
      .filter(col("shared") >= minShared)
  }

  /** Streams pair/member rows over consecutive (key, id)-sorted runs.
    * Equal ids are adjacent after the sort, so dedup is a neighbor check;
    * the first distinct id of a run is its minimum (the star/pair anchor).
    */
  private final class RunScanner(rows: scala.collection.BufferedIterator[Row], keyLen: Int,
      threshold: Int, hotStar: Boolean, emitMembers: Boolean)
      extends Iterator[Row] {
    private var pending: Iterator[Row] = Iterator.empty

    override def hasNext: Boolean = {
      while (!pending.hasNext && rows.hasNext) advance()
      pending.hasNext
    }
    override def next(): Row = {
      if (!hasNext) throw new NoSuchElementException
      pending.next()
    }

    /** Allocation-free positional key equality. Uses Java `equals` (NOT
      * Scala `==`/BoxesRunTime): boxed-double NaN equals NaN (numeric `==`
      * would spin the scan forever on a NaN key), and byte-array keys get
      * content comparison instead of reference equality.
      */
    private def sameKey(a: Row, b: Row): Boolean = {
      var i = 0
      while (i < keyLen) {
        val x = a.get(i)
        val y = b.get(i)
        val eq = (x, y) match {
          case (null, null) => true
          case (null, _) | (_, null) => false
          case (xa: Array[Byte], ya: Array[Byte]) => java.util.Arrays.equals(xa, ya)
          case _ => x.equals(y)
        }
        if (!eq) return false
        i += 1
      }
      true
    }
    private def idOf(r: Row): Long = r.getLong(keyLen)

    /** Consume one full or partial run and stage its output. */
    private def advance(): Unit = {
      val keyRow = rows.head
      var ids = Vector.empty[Long] // distinct, ascending (input sorted)
      var hot = false
      while (!hot && rows.hasNext && sameKey(rows.head, keyRow)) {
        val id = idOf(rows.next())
        if (ids.isEmpty || ids.last != id) {
          ids :+= id
          if (threshold > 0 && ids.size > threshold) hot = true
        }
      }
      pending =
        if (!hot) {
          val pairs =
            for {
              i <- ids.indices.iterator
              j <- (i + 1 until ids.size).iterator
            } yield Row(0, ids(i), ids(j))
          if (emitMembers) pairs ++ ids.iterator.map(id => Row(1, id, 0L))
          else pairs
        } else if (hotStar) {
          // stream the rest of the run without buffering: the buffered ids
          // star onto the run minimum, then each further distinct id does too
          val rep = ids.head
          var last = ids.last
          val buffered = ids.tail.iterator.map(id => Row(0, rep, id))
          val streamed: Iterator[Row] = new Iterator[Row] {
            private var staged: Row = _
            private def seek(): Unit =
              while (staged == null && rows.hasNext && sameKey(rows.head, keyRow)) {
                val id = idOf(rows.next())
                if (id != last) { last = id; staged = Row(0, rep, id) }
              }
            override def hasNext: Boolean = { seek(); staged != null }
            override def next(): Row = {
              if (!hasNext) throw new NoSuchElementException
              val r = staged; staged = null; r
            }
          }
          buffered ++ streamed
        } else {
          // drop mode: skip the rest of the run, emit nothing
          while (rows.hasNext && sameKey(rows.head, keyRow)) rows.next()
          Iterator.empty
        }
    }
  }
}
