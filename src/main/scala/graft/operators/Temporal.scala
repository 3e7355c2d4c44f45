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
    * running `last(ignoreNulls)` window (backward) / reverse-order
    * `first(ignoreNulls)` window (forward; `nearest` runs both over the
    * SAME exchange, paying one extra in-partition sort) → filter back to
    * left rows. A hot key costs one partition's sort (external, spills);
    * there is no per-row state object and no driver participation.
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
      // it would sort first and be carried into every later row's last()
      .where(col(rightTs).isNotNull)
      .select(
        keys.map(col) ++ Seq(
          col(rightTs).as("__ts"), lit(0).as("__tag"),
          lit(null).cast(leftType).as("__l"), payload.as("__r")): _*)

    // Backward ordering: right rows sort BEFORE left rows at an equal
    // timestamp (tag 0 < 1) — that makes the join inclusive; payload-
    // ascending puts the tie-winning (greatest) payload last, where
    // last() picks it up. Forward mirrors both: rights AFTER lefts at
    // equal ts (tag desc) so the [current, following] frame still sees
    // them, payload-descending so first() hits the greatest.
    val part = Window.partitionBy(keys.map(col): _*)
    val wb = part
      .orderBy(col("__ts").asc, col("__tag").asc, col("__r").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = part
      .orderBy(col("__ts").asc, col("__tag").desc, col("__r").desc_nulls_last)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val back = last(col("__r"), ignoreNulls = true).over(wb)
    val fwd = first(col("__r"), ignoreNulls = true).over(wf)

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
    val bounded = joined

    bounded.select(
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
