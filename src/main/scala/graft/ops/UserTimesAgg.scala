package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The reference's partial-aggregation buffer as a typed Spark
  * `Aggregator[IN, BUF, OUT]`: first/last/count of an epoch-millis
  * stream per key — the `UserTimeRec` + Combiner/Reducer machinery
  * (`/root/reference/.../UserTimeRec.java:120-126`,
  * `UserTimeCombiner.java:25-30`) in one mergeable object, with the
  * corrected min→first / max→last semantics (the reference's Java
  * merge is inverted; SURVEY.md §2.4).
  *
  * Registered via `functions.udaf(...)` — Catalyst plans it
  * partial→merge→final exactly like the hand-wired MapReduce stages.
  * (For the driver tables the built-in min/max/count triple is the
  * faster plan — this exists to cover the typed-UDAF extension
  * surface, SURVEY.md §2.9.)
  */
object UserTimesAgg extends Aggregator[Long, UserTimesBuf, UserTimesBuf] {
  override def zero: UserTimesBuf = UserTimesBuf(Long.MaxValue, Long.MinValue, 0L)
  override def reduce(b: UserTimesBuf, ms: Long): UserTimesBuf =
    UserTimesBuf(math.min(b.first_ms, ms), math.max(b.last_ms, ms), b.n + 1)
  override def merge(a: UserTimesBuf, b: UserTimesBuf): UserTimesBuf =
    UserTimesBuf(math.min(a.first_ms, b.first_ms), math.max(a.last_ms, b.last_ms), a.n + b.n)
  override def finish(r: UserTimesBuf): UserTimesBuf = r
  override def bufferEncoder: Encoder[UserTimesBuf] = Encoders.product[UserTimesBuf]
  override def outputEncoder: Encoder[UserTimesBuf] = Encoders.product[UserTimesBuf]
}

final case class UserTimesBuf(first_ms: Long, last_ms: Long, n: Long)
