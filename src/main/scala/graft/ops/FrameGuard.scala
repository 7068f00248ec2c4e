package graft.ops

import org.apache.spark.sql.DataFrame

/** Runtime guard for the three DELIBERATELY unpartitioned windows
  * (trailing/cumulative frames over calendar-day aggregates —
  * `daily_error_rate`, `daily_value_seasonal`,
  * `daily_value_changepoint`). An unpartitioned WindowExec funnels its
  * whole input through one task; that is fine exactly as long as the
  * input is the day-grain aggregate (grows with calendar time, never
  * with data volume), and silently catastrophic the day someone feeds
  * it the fact table. The round-8 intent comments stated the
  * invariant; this turns it into a CHECKED one at any scale: count the
  * frame before the window and refuse to proceed past `bound`.
  *
  * The count is not wasted work — the frame is persisted first, so
  * the window (and any sibling consumer) reuses the materialized
  * aggregate instead of recomputing the fact scan. Cleanup rides the
  * repo's between-queries contract (`spark.catalog.clearCache()` in
  * Verify/Bench; library callers own cache cleanup).
  *
  * The default bound, 100k rows (~273 years of days), is orders of
  * magnitude above any legitimate calendar frame and orders of
  * magnitude below any fact table that could hurt a single task —
  * misuse fails fast with the query named, long before the window
  * spills. */
object FrameGuard {

  def assertCalendarBounded(df: DataFrame, what: String,
                            bound: Long = 100000L): DataFrame = {
    // persist BEFORE the count (not after): the happy path then pays
    // one aggregate computation, reused by the window — counting an
    // unpersisted frame first would recompute the fact scan when the
    // bound passes, i.e. tax every legitimate call to cheapen the
    // failure path. The failure path instead RELEASES the cache: a
    // refused fact-sized frame must not squat in the block manager
    // until a global clearCache (it is exactly the frame too big to
    // keep around).
    val g = df.persist()
    val n = try g.count() catch {
      case t: Throwable => g.unpersist(blocking = false); throw t
    }
    if (n > bound) {
      g.unpersist(blocking = false)
      throw new IllegalArgumentException(
        s"requirement failed: $what: unpartitioned-window frame has $n rows (bound $bound) — " +
          "this window is single-task by design and its input must stay " +
          "a calendar-bounded aggregate, not a fact-sized frame")
    }
    g
  }
}
