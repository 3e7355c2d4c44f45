package graft.dsl

import java.time.Duration

/** Window option types (SURVEY §2.7).
  *
  * Reference: `core/Stream/TumblingWindowOptions.cs:31-39`,
  * `HoppingWindowOptions.cs:33-42`, `JoinWindowOptions.cs:35-97`,
  * `TimeWindowOptions.GracePeriodMs` (`TimeWindowOptions.cs:53`).
  * Spark mapping: `window(ts, size, advance)` / `session_window(ts, gap)`;
  * grace → `withWatermark`.
  */
sealed trait WindowDef {
  def grace: Duration
  /** Spark interval string for `window()`/`withWatermark()`. */
  protected def ms(d: Duration): String = s"${d.toMillis} milliseconds"
  def graceExpr: String = ms(grace)
}

final case class TumblingWindow(size: Duration, grace: Duration = Duration.ZERO)
    extends WindowDef {
  def sizeExpr: String = ms(size)
}

object TumblingWindow {
  /** `TumblingWindowOptions.Of(sizeMs)` */
  def of(sizeMs: Long): TumblingWindow = TumblingWindow(Duration.ofMillis(sizeMs))
}

final case class HoppingWindow(size: Duration, advance: Duration,
    grace: Duration = Duration.ZERO) extends WindowDef {
  def sizeExpr: String = ms(size)
  def advanceExpr: String = ms(advance)
}

object HoppingWindow {
  /** `HoppingWindowOptions.Of(sizeMs, advanceMs)` */
  def of(sizeMs: Long, advanceMs: Long): HoppingWindow =
    HoppingWindow(Duration.ofMillis(sizeMs), Duration.ofMillis(advanceMs))
}

/** Session windows — Spark-native superset; the reference only roadmaps them
  * (`feature.md:7`, store interfaces in `core/State/ISessionStore.cs`).
  */
final case class SessionWindow(gap: Duration, grace: Duration = Duration.ZERO)
    extends WindowDef {
  def gapExpr: String = ms(gap)
}

/** Sliding windows — superset; absent in the reference (roadmap:
  * `1_2_0.md` sliding-window aggs). Modeled on Kafka Streams KIP-450:
  * for each record at time t, the aggregate covers [t − size, t] (both
  * inclusive). We emit the right-edge-aligned windows (one per distinct
  * record timestamp); KIP-450's additional "early" left-edge windows are
  * the same aggregates observed before the right edge arrives — a
  * per-update-cadence difference, not a final-result one.
  */
final case class SlidingWindow(size: Duration, grace: Duration = Duration.ZERO)
    extends WindowDef {
  def sizeMs: Long = size.toMillis
}

object SlidingWindow {
  def of(sizeMs: Long): SlidingWindow = SlidingWindow(Duration.ofMillis(sizeMs))
}

/** USER-DEFINED window assignment — the reference's `WindowOptions`
  * subclassing surface (`core/Stream/WindowOptions.cs`; exercised by its
  * `CustomWindowTests.cs` DailyTimeWindows anchored at a wall-clock hour):
  * `assign` maps an event-time (epoch ms) to EVERY [startMs, endMs)
  * window containing it. `maxSize` bounds the longest assignable window —
  * it drives the streaming watermark delay (lateness is measured from the
  * window END, so the delay is maxSize + grace, exactly like the fixed
  * shapes). The function ships in the task closure: keep it pure and
  * deterministic (it runs once per record per task, possibly re-executed).
  */
final case class CustomWindow(assign: Long => Seq[(Long, Long)],
    maxSize: Duration, grace: Duration = Duration.ZERO) extends WindowDef {
  def sizeExpr: String = ms(maxSize)
}

/** Stream-stream join window: match other-side records in
  * [ts − before, ts + after] (`core/Stream/JoinWindowOptions.cs:35-53`).
  */
final case class JoinWindows(before: Duration, after: Duration,
    grace: Duration = Duration.ZERO) extends WindowDef {
  def beforeMs: Long = before.toMillis
  def afterMs: Long = after.toMillis
}

object JoinWindows {
  /** `JoinWindowOptions.Of(timeDifference)` — symmetric. */
  def of(timeDifferenceMs: Long): JoinWindows = {
    val d = Duration.ofMillis(timeDifferenceMs)
    JoinWindows(d, d)
  }
}
