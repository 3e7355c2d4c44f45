package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{max, sum}

/** Planted-data contracts for [[Temporal.asofJoin]] and
  * [[Temporal.rangeJoin]] — the tie rule, boundary inclusivity,
  * exactly-once pairing, and the loud guards.
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def trades(rows: (Long, Long, Long)*): DataFrame = // (id, key, t)
    rows.toDF("id", "key", "t")
  private def quotes(rows: (Long, Long, Long)*): DataFrame = // (qid, key, qt)
    rows.toDF("qid", "qkey", "qt").withColumnRenamed("qkey", "key")

  private def asof(l: DataFrame, r: DataFrame, tol: Option[Long] = None) =
    Temporal.asofJoin(l, r, Seq("key"), "t", "qt", Seq("qid"), toleranceMs = tol)
      .select("id", "asof_qt", "asof_qid")

  test("asofJoin: latest at-or-before quote wins; equal ts is inclusive") {
    val out = asof(
      trades((1L, 7L, 100L), (2L, 7L, 250L)),
      quotes((10L, 7L, 90L), (11L, 7L, 100L), (12L, 7L, 240L), (13L, 7L, 260L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // trade@100 sees quote@100 (inclusive), not quote@90; trade@250 sees 240
    assert(out == Set((1L, 100L, 11L), (2L, 240L, 12L)))
  }

  test("asofJoin: tie at the winning timestamp resolves to the greatest payload") {
    val out = asof(
      trades((1L, 7L, 200L)),
      quotes((31L, 7L, 150L), (33L, 7L, 150L), (32L, 7L, 150L)))
      .collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((150L, 33L)))
  }

  test("asofJoin: no qualifying quote and NULL-key rows survive with NULL payload") {
    val l = Seq((1L, Option(7L), 50L), (2L, Option.empty[Long], 500L))
      .toDF("id", "key", "t")
    val out = asof(l, quotes((10L, 7L, 90L))).collect()
      .map(r => (r.getLong(0), r.isNullAt(1) && r.isNullAt(2))).toMap
    assert(out == Map(1L -> true, 2L -> true)) // 90 > 50; NULL key matches nothing
  }

  test("asofJoin: a NULL-key right row donates its payload to nobody") {
    // Window.partitionBy groups NULL keys together, so without the
    // right-side NULL-key filter the NULL-key trade would pick up qid 20.
    val l = Seq((1L, Option(7L), 100L), (2L, Option.empty[Long], 100L))
      .toDF("id", "key", "t")
    val r = Seq((10L, Option(7L), 90L), (20L, Option.empty[Long], 90L))
      .toDF("qid", "key", "qt")
    Seq("backward", "forward", "nearest").foreach { dir =>
      val got = Temporal.asofJoin(l, r, Seq("key"), "t", "qt", Seq("qid"),
          direction = dir)
        .select("id", "asof_qid").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
      assert(got(2L) == -1L, s"$dir: NULL-key left row must keep NULL payload")
      assert(got(1L) == (if (dir == "forward") -1L else 10L),
        s"$dir: keyed rows unaffected by the NULL-key filter")
    }
  }

  test("asofJoin: keys stay partitioned — a match never crosses keys") {
    val out = asof(
      trades((1L, 7L, 100L)),
      quotes((10L, 8L, 90L))) // other key, earlier ts
      .collect()
    assert(out.head.isNullAt(1))
  }

  test("asofJoin tolerance: stale matches beyond the window are nulled") {
    val out = asof(
      trades((1L, 7L, 100L), (2L, 7L, 1000L)),
      quotes((10L, 7L, 95L)), tol = Some(10L))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out == Map(1L -> 10L, 2L -> -1L)) // 5ms in-window; 905ms stale
  }

  private def asofDir(l: DataFrame, r: DataFrame, dir: String,
      tol: Option[Long] = None) =
    Temporal.asofJoin(l, r, Seq("key"), "t", "qt", Seq("qid"),
      toleranceMs = tol, direction = dir)
      .select("id", "asof_qt", "asof_qid")

  test("asofJoin forward: earliest at-or-after wins, inclusive, greatest payload on tie") {
    val out = asofDir(
      trades((1L, 7L, 100L), (2L, 7L, 250L), (3L, 7L, 990L)),
      quotes((10L, 7L, 90L), (11L, 7L, 100L), (12L, 7L, 300L), (13L, 7L, 300L)),
      "forward")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // trade@100 → quote@100 (inclusive, not 300); trade@250 → ties at 300
    // resolve to the greatest qid; trade@990 → nothing ahead
    assert(out == Set((1L, 100L, 11L), (2L, 300L, 13L), (3L, -1L, -1L)))
  }

  test("asofJoin nearest: closer side wins; equidistant prefers backward") {
    val out = asofDir(
      trades((1L, 7L, 100L), (2L, 7L, 206L), (3L, 7L, 195L)),
      quotes((10L, 7L, 90L), (11L, 7L, 200L)),
      "nearest")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // t=100: back 90 (d=10) vs fwd 200 (d=100) → 90; t=206: back 200 wins;
    // t=195: back 90 (d=105) vs fwd 200 (d=5) → 200
    assert(out == Set((1L, 90L, 10L), (2L, 200L, 11L), (3L, 200L, 11L)))
    val tie = asofDir(trades((1L, 7L, 150L)),
      quotes((10L, 7L, 100L), (11L, 7L, 200L)), "nearest").collect()
    assert(tie.head.getLong(1) == 100L, "equidistant must take the backward match")
  }

  test("asofJoin nearest honors tolerance per side") {
    val out = asofDir(
      trades((1L, 7L, 195L)),
      quotes((10L, 7L, 90L), (11L, 7L, 200L)), "nearest", tol = Some(50L))
      .collect()
    assert(out.head.getLong(2) == 11L) // back 90 out of tolerance, fwd survives
    val none = asofDir(trades((1L, 7L, 195L)),
      quotes((10L, 7L, 90L)), "nearest", tol = Some(50L)).collect()
    assert(none.head.isNullAt(2))
  }

  test("asofJoin: NULL timestamps on either side match nothing, any direction") {
    val l = Seq((1L, 7L, Option(100L)), (2L, 7L, Option.empty[Long]))
      .toDF("id", "key", "t")
    val r = Seq((10L, 7L, Option(90L)), (11L, 7L, Option.empty[Long]))
      .toDF("qid", "key", "qt")
    Seq("backward", "forward", "nearest").foreach { dir =>
      val got = Temporal.asofJoin(l, r, Seq("key"), "t", "qt", Seq("qid"),
          direction = dir)
        .select("id", "asof_qid").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
      // the null-ts quote is never carried; the null-ts trade never matches
      assert(got(2L) == -1L, s"$dir: null left ts must not match")
      assert(got(1L) == (if (dir == "forward") -1L else 10L), s"$dir")
    }
  }

  test("asofJoin guards: timeline type mismatch and missing payload fail loud") {
    val l = trades((1L, 7L, 100L))
    val r = quotes((10L, 7L, 90L)).withColumn("qt", $"qt".cast("timestamp"))
    val e = intercept[IllegalArgumentException](
      Temporal.asofJoin(l, r, Seq("key"), "t", "qt", Seq("qid")))
    assert(e.getMessage.contains("timeline types differ"))
    val e2 = intercept[IllegalArgumentException](
      Temporal.asofJoin(l, quotes((10L, 7L, 90L)), Seq("key"), "t", "qt", Nil))
    assert(e2.getMessage.contains("rightCols"))
  }

  private def pts(ps: Long*): DataFrame = ps.zipWithIndex
    .map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
  private def ivs(rows: (Long, Long, Long)*): DataFrame =
    rows.toDF("iid", "s", "e")

  private def pairs(p: DataFrame, i: DataFrame, w: Long = 10L): Set[(Long, Long)] =
    Temporal.rangeJoin(p, i, "p", "s", "e", bucketMs = w)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("rangeJoin: inclusive boundaries, exactly-once pairs across bucket spans") {
    val p = pts(5L, 10L, 37L, 60L)            // pids 0..3
    val i = ivs((1L, 5L, 10L), (2L, 8L, 55L)) // iid 2 spans buckets 0..5
    // p=5: start boundary of iid1; p=10: end boundary of iid1 AND inside iid2;
    // p=37 only iid2; p=60 nothing. Multi-bucket interval must not duplicate.
    assert(pairs(p, i) ==
      Set((0L, 1L), (1L, 1L), (1L, 2L), (2L, 2L)))
  }

  test("rangeJoin: empty (e < s) intervals and NULL points match nothing") {
    val p = Seq((0L, Option(15L)), (1L, Option.empty[Long])).toDF("pid", "p")
    val i = ivs((1L, 20L, 10L)) // inverted → dropped
    assert(pairs(p, i).isEmpty)
  }

  test("rangeJoin: negative timelines bucket by floor, not toward zero") {
    // p=-5 is in bucket -1 ([-10,0)); a truncating division would put it in
    // bucket 0 and miss the interval [-9,-2]
    assert(pairs(pts(-5L), ivs((1L, -9L, -2L))) == Set((0L, 1L)))
  }

  test("rangeJoin: over-wide interval fails loud instead of exploding") {
    val e = intercept[Exception] {
      Temporal.rangeJoin(pts(5L), ivs((1L, 0L, 1000000L)), "p", "s", "e",
        bucketMs = 10L, maxBucketsPerInterval = 100).count()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("maxBucketsPerInterval"), msgs)
  }

  test("rangeJoin guards: shared column names rejected before any job runs") {
    val e = intercept[IllegalArgumentException](
      Temporal.rangeJoin(pts(1L), ivs((1L, 0L, 5L)).withColumnRenamed("iid", "pid"),
        "p", "s", "e", bucketMs = 10L))
    assert(e.getMessage.contains("share column"))
  }

  test("resample: densifies each key's span; ffill carries the last seen bucket") {
    val df = Seq((7L, 0L, 10.0), (7L, 5L, 20.0), (7L, 25L, 40.0), (8L, 12L, 1.0))
      .toDF("key", "t", "v")
    val out = Temporal.resample(df, Seq("key"), "t", bucketMs = 10L,
        aggs = Seq(sum($"v").as("sv")), fill = "ffill")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // key 7 spans buckets 0..20: bucket 0 sums both in-bucket rows, the
    // EMPTY bucket 10 forward-fills it, bucket 20 overwrites; key 8's
    // span is its single bucket — keys never bleed into each other
    assert(out == Map((7L, 0L) -> 30.0, (7L, 10L) -> 30.0, (7L, 20L) -> 40.0,
      (8L, 10L) -> 1.0))
    val none = Temporal.resample(df, Seq("key"), "t", 10L,
        Seq(sum($"v").as("sv")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toMap
    assert(none((7L, 10L)) == -1.0, "gap bucket must stay NULL without ffill")
  }

  test("resample: NULL timestamps drop; an over-wide key span fails loud") {
    val out = Temporal.resample(
      Seq((1L, Option(5L), 1.0), (1L, Option.empty[Long], 9.0)).toDF("key", "t", "v"),
      Seq("key"), "t", 10L, Seq(sum($"v").as("sv"))).collect()
    assert(out.map(_.getDouble(2)).toSeq == Seq(1.0))
    val e = intercept[Exception] {
      Temporal.resample(Seq((1L, 0L, 1.0), (1L, 1000000L, 2.0)).toDF("key", "t", "v"),
        Seq("key"), "t", 1L, Seq(sum($"v").as("sv")), maxBucketsPerKey = 100).count()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("maxBucketsPerKey"), msgs)
  }

  test("concurrency: half-open step function — end-meets-start does not overlap") {
    val iv = Seq((7L, 0L, 10L), (7L, 5L, 15L), (7L, 10L, 20L), (9L, 0L, 5L))
      .toDF("key", "s", "e")
    val out = Temporal.concurrency(iv, Seq("key"), "s", "e")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // key 7: +1@0, +1@5, (-1+1)@10 nets to no change, -1@15, -1@20 —
    // the [0,10) and [10,20) intervals never overlap
    assert(out == Map((7L, 0L) -> 1L, (7L, 5L) -> 2L, (7L, 10L) -> 2L,
      (7L, 15L) -> 1L, (7L, 20L) -> 0L, (9L, 0L) -> 1L, (9L, 5L) -> 0L))
  }

  test("concurrency: NULL and empty intervals contribute nothing") {
    val iv = Seq((1L, Option(5L), Option(5L)), (1L, Option(9L), Option.empty[Long]),
      (1L, Option(1L), Option(3L))).toDF("key", "s", "e")
    val out = Temporal.concurrency(iv, Seq("key"), "s", "e")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 1L), (3L, 0L))) // only the [1,3) interval counts
  }

  test("resample interp: interior gaps interpolate with a true floor; edges stay NULL") {
    // key 7 observes buckets 0 (v=10) and 30 (v=0): the gap buckets
    // interpolate 10 + floor(-10*1/3) = 6 and 10 + floor(-10*2/3) = 3 —
    // a negative non-divisible delta, so truncating division would give
    // 7 and 4
    val df = Seq((7L, 0L, 10L), (7L, 0L, 0L), (7L, 35L, 0L), (8L, 12L, 5L))
      .toDF("key", "t", "v")
    val out = Temporal.resample(df, Seq("key"), "t", bucketMs = 10L,
        aggs = Seq(max($"v").as("mv")), fill = "interp")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) Long.MinValue else r.getLong(2))).toMap
    assert(out == Map((7L, 0L) -> 10L, (7L, 10L) -> 6L, (7L, 20L) -> 3L,
      (7L, 30L) -> 0L, (8L, 10L) -> 5L))
  }

  test("resample interp: leading/trailing gaps NULL; float aggregates rejected loud") {
    // leading gap has no preceding observation: with observations only at
    // buckets 10 and 20, a key whose span starts at its first observation
    // has no leading gap — so plant one via a second agg column that is
    // NULL in the first bucket
    val df = Seq((1L, 5L, Option.empty[Long]), (1L, 15L, Option(8L)),
      (1L, 25L, Option.empty[Long]), (1L, 35L, Option(2L)),
      (1L, 45L, Option.empty[Long])).toDF("key", "t", "v")
    val out = Temporal.resample(df, Seq("key"), "t", 10L,
        Seq(max($"v").as("mv")), fill = "interp")
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(2)) Long.MinValue else r.getLong(2))).toMap
    // bucket 0 (observed-but-NULL agg) and bucket 40 bracket the timeline:
    // nothing before/after to interpolate from → NULL; bucket 20 is interior
    assert(out == Map(0L -> Long.MinValue, 10L -> 8L, 20L -> 5L, 30L -> 2L,
      40L -> Long.MinValue))
    val e = intercept[IllegalArgumentException] {
      Temporal.resample(Seq((1L, 0L, 1.5)).toDF("key", "t", "v"),
        Seq("key"), "t", 10L, Seq(sum($"v").as("sv")), fill = "interp")
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("mergeIntervals: overlap and touch merge; gaps split; tolerance bridges") {
    val iv = Seq((7L, 0L, 10L), (7L, 10L, 20L), (7L, 5L, 8L), (7L, 25L, 30L),
      (9L, 0L, 3L)).toDF("key", "s", "e")
    val got = Temporal.mergeIntervals(iv, Seq("key"), "s", "e")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // closed intervals: [0,10] and [10,20] share instant 10 → one island
    assert(got == Set((7L, 0L, 20L, 3L), (7L, 25L, 30L, 1L), (9L, 0L, 3L, 1L)))
    val bridged = Temporal.mergeIntervals(iv, Seq("key"), "s", "e",
        gapToleranceMs = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(bridged == Set((7L, 0L, 30L, 4L), (9L, 0L, 3L, 1L)))
  }

  test("mergeIntervals: a contained interval never extends its island") {
    val iv = Seq((1L, 0L, 100L), (1L, 5L, 10L), (1L, 150L, 160L))
      .toDF("key", "s", "e")
    val got = Temporal.mergeIntervals(iv, Seq("key"), "s", "e")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((0L, 100L, 2L), (150L, 160L, 1L)))
  }

  test("mergeIntervals: exact duplicate intervals count into ONE island, never leak") {
    // the tie hazard this operator's distinct-start pre-collapse exists
    // for: duplicated (s, e) rows must not let an island flag and its
    // running sum disagree on tie order and weld neighboring islands
    val iv = Seq((1L, 0L, 10L), (1L, 0L, 10L), (1L, 0L, 4L), (1L, 100L, 110L),
      (1L, 100L, 110L)).toDF("key", "s", "e")
    val got = Temporal.mergeIntervals(iv, Seq("key"), "s", "e")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((0L, 10L, 3L), (100L, 110L, 2L)))
  }

  test("mergeIntervals: NULL/inverted intervals drop; point events sessionize") {
    val iv = Seq((1L, Option(9L), Option(5L)), (1L, Option.empty[Long], Option(5L)),
      (1L, Option(1L), Option(1L)), (1L, Option(2L), Option(2L)),
      (1L, Option(40L), Option(40L))).toDF("key", "s", "e")
    val got = Temporal.mergeIntervals(iv, Seq("key"), "s", "s",
        gapToleranceMs = 10L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // s==e sessionization on the START column: NULL start drops, the
    // inverted row still contributes its point (s,s); points 1,2,9 chain
    // within the 10ms gap, 40 stands alone
    assert(got == Set((1L, 9L, 3L), (40L, 40L, 1L)))
  }

  test("rangeJoin: timestamp timeline agrees with the integral-ms timeline") {
    import org.apache.spark.sql.functions.timestamp_millis
    val p = pts(5000L, 12000L)
    val i = ivs((1L, 4000L, 6000L))
    val tp = p.withColumn("p", timestamp_millis($"p"))
    val ti = i.withColumn("s", timestamp_millis($"s")).withColumn("e", timestamp_millis($"e"))
    val fromTs = Temporal.rangeJoin(tp, ti, "p", "s", "e", bucketMs = 1000L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromTs == pairs(p, i, w = 1000L))
  }
}
