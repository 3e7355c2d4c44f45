package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal joins the built-in operators can't express directly.
  *
  * Two custom whole-operator semantics, both delivered by COMPOSING existing
  * Catalyst operators (per the preference order: composition before custom
  * plans) so every stage stays inside whole-stage codegen and AQE:
  *
  *  - [[asofJoin]] — point-in-time ("as-of") join: each left row picks the
  *    latest right row with the same key and `rightTs <= leftTs`. The naive
  *    formulation is a range join + argmax (quadratic per key); kdb+/pandas
  *    do it with a sorted merge. The Spark-first shape is a UNION + one
  *    running-window pass: tag both sides, sort each key's timeline once,
  *    carry the last-seen right payload forward. ONE shuffle on the key,
  *    zero range explosion, linear in |left| + |right| per key — the same
  *    plan a 1000-executor cluster wants at 100 TB (the shuffle is the same
  *    hash partitioning any groupBy(key) pays; per-key sort spills via the
  *    window operator's external sorter).
  *
  *  - [[rangeJoin]] — KEYLESS point-in-interval join (`start <= p <= end`
  *    with no equi-key). Spark's planner can only do this as a
  *    BroadcastNestedLoopJoin / cartesian — O(|points|·|intervals|) compute
  *    even when the match density is tiny. The scalable shape buckets the
  *    domain: intervals explode to the fixed-width buckets they cover,
  *    points map to exactly ONE bucket, and the join becomes an equi-join
  *    on bucket id + a residual filter. Each qualifying pair is produced
  *    exactly once (a point lives in one bucket), so no dedup pass is
  *    needed. Work drops from N·M to Σ_b |points_b|·|intervals_b| — the
  *    locality the range predicate implies.
  *
  * Reference anchor: the reference's stream-stream interval join
  * (KStreamKStreamJoin.cs) is a KEYED window join and is covered by
  * `q_interval_join`; these two close the keyless/range and point-in-time
  * gaps a warehouse user expects alongside it.
  */
object Temporal {

  /** Point-in-time (as-of) join, all three pandas `merge_asof` directions.
    *
    * For each `left` row, attaches the right payload of the matching
    * `right` row with equal `keys`, where "matching" depends on
    * `direction`:
    *  - `"backward"` (default): the LATEST right row with
    *    `right(rightTs) <= left(leftTs)`;
    *  - `"forward"`: the EARLIEST right row with `rightTs >= leftTs`;
    *  - `"nearest"`: whichever of the two is closer in time (exact ms
    *    distance; equidistant → the backward match).
    * Output columns are `prefix + rightTs` and `prefix + c` for `c` in
    * `rightCols`, NULL when no right row qualifies (left-outer semantics
    * — left rows are never dropped). NULL keys and NULL timestamps on
    * EITHER side match nothing (the SQL comparison rule).
    *
    * Tie rule (deterministic, engine-mirrorable): among right rows sharing
    * the winning `rightTs`, the one with the greatest `rightCols` tuple
    * (lexicographic, NULLs first) wins — in every direction.
    *
    * `toleranceMs`: with `Some(t)`, a match farther than `t` milliseconds
    * from the left timestamp is discarded (pandas `merge_asof(tolerance)`
    * semantics) — applied per candidate BEFORE the nearest pick, as a
    * map-side post-filter, so the plan is unchanged.
    *
    * Plan shape: union → ONE hash shuffle on `keys` → per-key sort →
    * running `last(ignoreNulls)` window (backward) / the SAME growing
    * frame over the mirrored (ts-descending) ordering (forward; `nearest`
    * runs both over the SAME exchange, paying one extra in-partition
    * sort) → filter back to left rows. Both frames are
    * [unboundedPreceding, currentRow] — a [currentRow,
    * unboundedFollowing] frame would make Spark re-aggregate the
    * partition remainder per row, quadratic on a hot key. A hot key
    * costs one partition's sort (external, spills); there is no per-row
    * state object and no driver participation.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      prefix: String = "asof_",
      toleranceMs: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(keys.nonEmpty, "asofJoin: at least one key column required")
    require(rightCols.nonEmpty, "asofJoin: rightCols must name the payload to attach")
    require(Set("backward", "forward", "nearest")(direction),
      s"asofJoin: direction must be backward, forward, or nearest — got '$direction'")
    QualityFilters.requireFreshColumns(
      left, "asofJoin", Seq("__ts", "__tag", "__l", "__r") ++
        (rightTs +: rightCols).map(prefix + _))
    toleranceMs.foreach(t => require(t >= 0, s"asofJoin: negative tolerance $t"))
    locally {
      val lt = left.select(col(leftTs)).schema.head.dataType
      val rt = right.select(col(rightTs)).schema.head.dataType
      require(lt == rt,
        s"asofJoin: timeline types differ — left $leftTs is $lt, right $rightTs is $rt")
    }

    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val payload = struct((rightTs +: rightCols).map(col).toIndexedSeq: _*)
    val payloadType = right.select(payload).schema.head.dataType
    val leftType = left.select(leftStruct).schema.head.dataType

    // Right rows sort BEFORE left rows at an equal timestamp (tag 0 < 1) —
    // that is what makes the join inclusive; payload-ascending puts the
    // tie-winning (greatest) payload last, where last() picks it up.
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__tag"),
        leftStruct.as("__l"), lit(null).cast(payloadType).as("__r")): _*)
    val r = right
      // a NULL right timestamp satisfies no SQL comparison — and unfiltered
      // it would sort first and be carried into every later row's last().
      // NULL right KEYS likewise match nothing: Window.partitionBy groups
      // NULLs together (GROUP BY semantics), so an unfiltered NULL-key right
      // row would hand its payload to NULL-key left rows — filtering here
      // makes those left rows fall through to the left-outer NULL payload.
      .where(keys.map(col(_).isNotNull).reduce(_ && _) && col(rightTs).isNotNull)
      .select(
        keys.map(col) ++ Seq(
          col(rightTs).as("__ts"), lit(0).as("__tag"),
          lit(null).cast(leftType).as("__l"), payload.as("__r")): _*)

    // Both directions order rights BEFORE lefts at an equal timestamp
    // (__tag.asc, 0 < 1) — under a growing [unboundedPreceding, currentRow]
    // frame that is exactly what makes the join INCLUSIVE in each
    // direction: by the time the scan reaches a left row, every right row
    // at the same timestamp has already entered the frame. Payload-
    // ascending puts the tie-winning (greatest) payload last, where
    // last() picks it up — identically in both passes.
    val part = Window.partitionBy(keys.map(col): _*)
    val wb = part
      .orderBy(col("__ts").asc, col("__tag").asc, col("__r").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // The forward pass mirrors ONLY the timeline (ts desc); tag and
    // payload orderings stay identical to the backward pass, which keeps
    // the frame inclusive and the tie rule unchanged. Same GROWING
    // [unboundedPreceding, currentRow] frame — never a
    // [currentRow, unboundedFollowing] frame: Spark's
    // UnboundedFollowingWindowFunctionFrame re-aggregates the partition
    // remainder for EVERY row, turning a hot key quadratic. The reversed
    // growing frame is linear and costs one extra in-partition sort.
    val wf = part
      .orderBy(col("__ts").desc, col("__tag").asc, col("__r").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val back = last(col("__r"), ignoreNulls = true).over(wb)
    val fwd = last(col("__r"), ignoreNulls = true).over(wf)

    val toMs = msConverter(left.select(col(leftTs)).schema.head.dataType, "asofJoin")
    // per-candidate tolerance gate (NULL comparison → false → candidate
    // dropped); also kills any candidate for a NULL left timestamp
    def gate(cand: Column, dist: Column): Column = toleranceMs match {
      case None => when(col("__ts").isNotNull, cand)
      case Some(t) => when(dist <= t, cand)
    }
    def distTo(cand: Column): Column =
      abs(toMs(col("__ts")) - toMs(cand.getField(rightTs)))

    val joined = l.unionByName(r)
      .withColumn("__r", direction match {
        case "backward" => gate(back, distTo(back))
        case "forward"  => gate(fwd, distTo(fwd))
        case "nearest"  =>
          val b = gate(back, distTo(back))
          val f = gate(fwd, distTo(fwd))
          // closer candidate wins; equidistant or forward-missing → backward
          when(b.isNull, f).when(f.isNull, b)
            .when(distTo(f) < distTo(b), f).otherwise(b)
      })
      .where(col("__tag") === 1)

    joined.select(
      col("__l.*") +:
        col(s"__r.$rightTs").as(prefix + rightTs) +:
        rightCols.map(c => col(s"__r.$c").as(prefix + c)): _*)
  }

  /** Keyless point-in-interval join: every (point, interval) pair with
    * `intervals(startCol) <= points(pointCol) <= intervals(endCol)`
    * (inclusive both ends), produced exactly once, with all columns of both
    * inputs. Rows with a NULL point or NULL/empty (`end < start`) interval
    * match nothing (inner semantics).
    *
    * `bucketMs` is the bucket width in milliseconds (timestamp inputs) or
    * plain units (numeric inputs) — pick it near the median interval
    * length: wider buckets mean fewer exploded interval rows but more
    * non-matching pairs surviving to the residual filter; narrower means
    * the reverse. The explode is capped at `maxBucketsPerInterval` buckets
    * per interval and fails LOUD beyond it — a whole-domain interval at a
    * tiny width would otherwise quietly materialize millions of rows per
    * input row.
    */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketMs: Long,
      maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucketMs > 0, s"rangeJoin: bucket width must be positive, got $bucketMs")
    require(maxBucketsPerInterval > 0, "rangeJoin: maxBucketsPerInterval must be positive")
    val clash = points.columns.toSet.intersect(intervals.columns.toSet)
    require(clash.isEmpty,
      s"rangeJoin: points and intervals share column(s) ${clash.mkString(", ")}; rename first")
    QualityFilters.requireFreshColumns(points, "rangeJoin", Seq("__b"))
    QualityFilters.requireFreshColumns(intervals, "rangeJoin", Seq("__b", "__b0", "__b1"))

    val pMs = msConverter(points.select(col(pointCol)).schema.head.dataType, "rangeJoin")
    val sMs = msConverter(intervals.select(col(startCol)).schema.head.dataType, "rangeJoin")
    val eMs = msConverter(intervals.select(col(endCol)).schema.head.dataType, "rangeJoin")

    // Exact floored bucket id in pure long arithmetic (no double division —
    // a boundary point must never land one bucket off).
    // Column./ on longs is DOUBLE division; the numerator is an exact
    // multiple of bucketMs so the quotient is integral and exact (< 2^53)
    // — cast restores the long bucket id.
    def bucketOf(x: Column): Column =
      ((x - ((x % bucketMs) + bucketMs) % bucketMs) / bucketMs).cast(LongType)

    val ib = intervals
      .where(col(startCol).isNotNull && col(endCol).isNotNull &&
        eMs(col(endCol)) >= sMs(col(startCol)))
      .withColumn("__b0", bucketOf(sMs(col(startCol))))
      // loud guard INSIDE the row pipeline (raise_error, zero extra jobs —
      // a pre-scan aggregate would re-read the whole intervals side): one
      // over-wide interval is a config error, not a reason to OOM an
      // executor mid-explode
      .withColumn("__b1", {
        val b1 = bucketOf(eMs(col(endCol)))
        when(b1 - col("__b0") < maxBucketsPerInterval, b1)
          .otherwise(raise_error(format_string(
            s"rangeJoin: an interval spans %s buckets of $bucketMs ms — over " +
              s"maxBucketsPerInterval=$maxBucketsPerInterval; widen bucketMs " +
              "or raise the cap explicitly",
            b1 - col("__b0") + 1)).cast(LongType))
      })
      .withColumn("__b", explode(sequence(col("__b0"), col("__b1"))))
      .drop("__b0", "__b1")
    val pb = points
      .where(col(pointCol).isNotNull)
      .withColumn("__b", bucketOf(pMs(col(pointCol))))

    pb.join(ib, "__b")
      .where(pMs(col(pointCol)).between(sMs(col(startCol)), eMs(col(endCol))))
      .drop("__b")
  }

  /** Time-series RESAMPLE: per-key bucketed aggregation DENSIFIED over
    * each key's [min, max] bucket span, with optional forward-fill — the
    * pandas `resample(...).agg(...).ffill()` shape (and SQL's
    * gap-fill/`date_spine`), which a plain groupBy cannot express because
    * empty buckets produce no row to aggregate.
    *
    * Output: one row per (keys, `bucket`) for EVERY bucket in the key's
    * observed span (bucket = floor(ts / bucketMs) · bucketMs, the
    * [[rangeJoin]] floor rule, epoch-ms long), with `aggs` evaluated over
    * the rows in that bucket. Missing buckets get NULL aggregates under
    * `fill = "none"`, or the latest preceding bucket's values under
    * `fill = "ffill"` (leading gaps stay NULL — nothing precedes them),
    * or LINEAR INTERPOLATION between the surrounding observed buckets
    * under `fill = "interp"` (leading AND trailing gaps stay NULL —
    * there is nothing to interpolate toward). `interp` requires every
    * aggregate column to be integral and emits the floor of the exact
    * rational interpolant in pure integer arithmetic
    * (`prev + floorDiv(dv * steps, totalSteps)` with a TRUE floor
    * division, negative deltas included) — engine-exact, no float
    * drift; interp outputs are BIGINT.
    * Rows with a NULL timestamp are dropped (they belong to no bucket).
    *
    * Plan shape: ONE shuffle builds the per-(key, bucket) aggregates
    * (map-side partials), a per-key re-agg derives each span, the spans
    * explode to dense buckets (map-side 1→N, capped loud at
    * `maxBucketsPerKey` — a key spanning years at second granularity is
    * a config error, not an OOM), and the dense frame joins the sparse
    * aggregates back on (keys, bucket). Forward-fill is one running
    * `last(ignoreNulls)` window per agg column on the SAME (keys)
    * partitioning. Nothing touches the driver; per-key cost is the
    * key's own span.
    */
  def resample(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      bucketMs: Long,
      aggs: Seq[Column],
      fill: String = "none",
      maxBucketsPerKey: Int = 1000000,
      materializeSparse: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "resample: at least one key column required")
    require(aggs.nonEmpty, "resample: at least one aggregate required")
    require(bucketMs > 0, s"resample: bucket width must be positive, got $bucketMs")
    require(maxBucketsPerKey > 0, "resample: maxBucketsPerKey must be positive")
    require(Set("none", "ffill", "interp")(fill),
      s"resample: fill must be none, ffill, or interp — got '$fill'")
    QualityFilters.requireFreshColumns(df, "resample", Seq("bucket", "__b0", "__b1"))

    val toMs = msConverter(df.select(col(tsCol)).schema.head.dataType, "resample")
    def bucketOf(x: Column): Column =
      (x - ((x % bucketMs) + bucketMs) % bucketMs).cast(LongType)

    val sparse0 = df
      .where(col(tsCol).isNotNull)
      .withColumn("bucket", bucketOf(toMs(col(tsCol))))
      .groupBy((keys :+ "bucket").map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    // the sparse aggregate feeds BOTH the span derivation and the dense
    // left join — two full recomputes of the input scan + aggregation.
    // `materializeSparse` localCheckpoints it (one compute, executor-local
    // blocks): measured 1.36× at 10× key cardinality (SCALE.md r13); off
    // by default because the eager materialization costs more than the
    // replay on small inputs and pins executor storage for the plan's life
    val sparse = if (materializeSparse) sparse0.localCheckpoint() else sparse0
    val aggNames = sparse.columns.drop(keys.length + 1).toSeq

    val dense = sparse
      .groupBy(keys.map(col): _*)
      .agg(min(col("bucket")).as("__b0"), max(col("bucket")).as("__b1"))
      .withColumn("__b1", {
        // loud in-pipeline span guard, the rangeJoin pattern
        val nb = ((col("__b1") - col("__b0")) / bucketMs).cast(LongType)
        when(nb < maxBucketsPerKey, col("__b1"))
          .otherwise(raise_error(format_string(
            s"resample: a key spans %s buckets of $bucketMs ms — over " +
              s"maxBucketsPerKey=$maxBucketsPerKey; widen bucketMs or raise " +
              "the cap explicitly",
            nb + 1)).cast(LongType))
      })
      .withColumn("bucket",
        explode(sequence(col("__b0"), col("__b1"), lit(bucketMs))))
      .drop("__b0", "__b1")

    val joined = dense.join(sparse, keys :+ "bucket", "left")
    if (fill == "none") joined
    else if (fill == "ffill") {
      val w = Window.partitionBy(keys.map(col): _*).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      aggNames.foldLeft(joined) { (acc, c) =>
        acc.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
    } else {
      sparse.schema.drop(keys.length + 1).foreach(f => require(
        f.dataType match {
          case ByteType | ShortType | IntegerType | LongType => true
          case _ => false
        },
        s"resample: fill=interp needs integral aggregate columns — " +
          s"${f.name} is ${f.dataType}; scale to an integer grid first " +
          "(float interpolation would drift between engines)"))
      val wb = Window.partitionBy(keys.map(col): _*).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // forward lookup = the same growing frame over the REVERSED bucket
      // order (an unbounded-following frame re-aggregates the partition
      // remainder per row in Spark — quadratic on a long key span; the
      // mirrored growing frame is linear and costs one extra sort)
      val wf = Window.partitionBy(keys.map(col): _*).orderBy(col("bucket").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // true floor division in exact long arithmetic (the rangeJoin mod
      // trick) — truncating `/` would round negative deltas toward zero
      def floorDiv(a: Column, b: Column): Column =
        ((a - ((a % b) + b) % b) / b).cast(LongType)
      // all columns in ONE select: a per-column withColumn fold leaves a
      // Project between the window batches and defeats CollapseWindow —
      // this way every wb expression lands in one Window node and every
      // wf expression in the other
      val filled = aggNames.map { c =>
        val v = col(c).cast(LongType)
        val obsB = when(col(c).isNotNull, col("bucket"))
        val pv = last(v, ignoreNulls = true).over(wb)
        val pb = last(obsB, ignoreNulls = true).over(wb)
        val nv = last(v, ignoreNulls = true).over(wf)
        val nb = last(obsB, ignoreNulls = true).over(wf)
        // steps are exact: every bucket is a multiple of bucketMs, so the
        // double quotient is integral; magnitudes stay << 2^53
        val steps = ((col("bucket") - pb) / bucketMs).cast(LongType)
        val total = ((nb - pb) / bucketMs).cast(LongType)
        when(col(c).isNotNull, v)
          .when(pv.isNull || nv.isNull, lit(null).cast(LongType))
          .otherwise(pv + floorDiv((nv - pv) * steps, total))
          .as(c)
      }
      joined.select((keys :+ "bucket").map(col) ++ filled: _*)
    }
  }

  /** Gaps-and-islands interval MERGE: per key group, coalesce CLOSED
    * intervals `[start, end]` that overlap — or sit within
    * `gapToleranceMs` of each other — into maximal "islands", the classic
    * sessionization/coverage shape (merge meeting holds, collapse lease
    * renewals, sessionize point events). With `gapToleranceMs = 0`,
    * touching intervals (one ends exactly where the next starts) merge:
    * closed intervals sharing a boundary instant genuinely overlap.
    * Point events sessionize by passing the SAME column as `startCol` and
    * `endCol` with the session gap as the tolerance.
    *
    * Output: one row per island — (keys…, `island_start`, `island_end`
    * epoch-ms longs, `n_intervals`). NULL and inverted (`end < start`)
    * intervals contribute nothing.
    *
    * Plan shape: intervals first collapse to one row per DISTINCT
    * (keys, start) — max end + count, map-side partial — which makes the
    * window ordering TOTAL (a per-row island flag under `(s, e)` ties is
    * order-dependent: the flag comes from one window pass and the island
    * number from another, and nothing pins the two passes to the same
    * tie traversal — rows sharing a start always co-island anyway, so
    * group them before sweeping). Then ONE hash shuffle on `keys` + one
    * per-key sort feeds both window passes (running max-end over
    * strictly-preceding starts marks island openings; a running sum
    * numbers them — same partitioning, same ordering, one exchange + one
    * sort node), and a groupBy on (keys, island) collapses each island.
    * The quadratic self-join formulation is never materialized; per-key
    * cost is the key's own sort, which spills externally on a hot key.
    */
  def mergeIntervals(
      intervals: DataFrame,
      keys: Seq[String],
      startCol: String,
      endCol: String,
      gapToleranceMs: Long = 0L): DataFrame = {
    require(keys.nonEmpty, "mergeIntervals: at least one key column required")
    require(gapToleranceMs >= 0,
      s"mergeIntervals: negative gap tolerance $gapToleranceMs")
    QualityFilters.requireFreshColumns(intervals, "mergeIntervals",
      Seq("island_start", "island_end", "n_intervals", "__s", "__e", "__n",
        "__pme", "__isl"))
    val sMs = msConverter(intervals.select(col(startCol)).schema.head.dataType,
      "mergeIntervals")
    val eMs = msConverter(intervals.select(col(endCol)).schema.head.dataType,
      "mergeIntervals")

    val live = intervals
      .where(col(startCol).isNotNull && col(endCol).isNotNull &&
        eMs(col(endCol)) >= sMs(col(startCol)))
      .select(keys.map(col) ++
        Seq(sMs(col(startCol)).as("__s"), eMs(col(endCol)).as("__e")): _*)

    // Collapse to distinct starts: intervals sharing (keys, __s) all
    // contain the instant __s, so they always co-island — and afterwards
    // __s is UNIQUE per key, making both window orderings total (no
    // tie-order hazard) and shrinking the window input.
    val grouped = live
      .groupBy((keys :+ "__s").map(col): _*)
      .agg(max(col("__e")).as("__e"), count(lit(1)).as("__n"))

    // Both windows share one partitioning + ordering → Catalyst plans one
    // exchange and one sort.
    val part = Window.partitionBy(keys.map(col): _*).orderBy(col("__s").asc)
    val wPrev = part.rowsBetween(Window.unboundedPreceding, -1)
    val wRun = part.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    grouped
      .withColumn("__pme", max(col("__e")).over(wPrev))
      .withColumn("__isl", sum(
        when(col("__pme").isNull || col("__s") > col("__pme") + gapToleranceMs,
          lit(1L)).otherwise(lit(0L))).over(wRun))
      .groupBy((keys :+ "__isl").map(col): _*)
      .agg(min(col("__s")).as("island_start"),
        max(col("__e")).as("island_end"),
        sum(col("__n")).as("n_intervals"))
      .drop("__isl")
  }

  /** Sweep-line interval CONCURRENCY: the step function of how many
    * intervals are simultaneously open, per key group — "max concurrent
    * sessions / peak rooms in use", which Spark can otherwise only
    * express as a quadratic self-join.
    *
    * Half-open semantics `[start, end)`: an interval ending exactly when
    * another starts does NOT overlap it (the meeting-rooms convention);
    * at equal timestamps, end events apply before start events. Output:
    * one row per distinct event time per key — (keys…, `t` epoch-ms,
    * `concurrency` AFTER applying that instant's events). NULL/empty
    * (`end <= start`) intervals contribute nothing.
    *
    * Plan shape: each interval maps to two (t, ±1) events (map-side 1→2
    * explode), one map-side-combined shuffle nets the deltas per
    * (keys, instant), and a per-key running sum over the netted timeline
    * yields the step function — linear in the number of intervals, no
    * self-join. `max(concurrency)` per key composes downstream for the
    * peak.
    */
  def concurrency(
      intervals: DataFrame,
      keys: Seq[String],
      startCol: String,
      endCol: String): DataFrame = {
    require(keys.nonEmpty, "concurrency: at least one key column required")
    QualityFilters.requireFreshColumns(intervals, "concurrency",
      Seq("t", "concurrency", "__d"))
    val sMs = msConverter(intervals.select(col(startCol)).schema.head.dataType,
      "concurrency")
    val eMs = msConverter(intervals.select(col(endCol)).schema.head.dataType,
      "concurrency")
    val live = intervals.where(col(startCol).isNotNull && col(endCol).isNotNull &&
      eMs(col(endCol)) > sMs(col(startCol)))
    val events = live.select(
      (keys.map(col) :+ explode(array(
        struct(sMs(col(startCol)).as("t"), lit(1).as("__d")),
        struct(eMs(col(endCol)).as("t"), lit(-1).as("__d")))).as("__e")): _*)
      .select((keys.map(col) ++ Seq(col("__e.t").as("t"), col("__e.__d").as("__d"))): _*)
    // net the deltas per instant FIRST (this is also what makes the
    // half-open rule exact: an end and a start at the same instant
    // cancel before the running sum ever sees them), then one running
    // sum per key over distinct instants
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .groupBy((keys :+ "t").map(col): _*)
      .agg(sum(col("__d")).as("__d"))
      .withColumn("concurrency", sum(col("__d")).over(w).cast(LongType))
      .drop("__d")
  }

  /** Column → epoch-millis LONG for timestamps; integral columns pass
    * through unchanged (their native unit IS the bucket/tolerance unit).
    * Fractional/other types are rejected loudly — silently flooring a
    * double timeline would shift boundary points one bucket off.
    */
  private def msConverter(dt: DataType, op: String): Column => Column = dt match {
    case TimestampType | TimestampNTZType => c => unix_millis(c.cast(TimestampType))
    case DateType                         => c => unix_millis(c.cast(TimestampType))
    case ByteType | ShortType | IntegerType | LongType => c => c.cast(LongType)
    case other => throw new IllegalArgumentException(
      s"$op: unsupported timeline type $other — use a timestamp, date, or integral column")
  }
}
