package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming (§2.7 capability class):
  * `flatMapGroupsWithState` over a keyed event stream — per-user running
  * session accumulation with gap-based closure, the state shape the
  * reference's daily-rerun pipeline can't express but a streaming engine
  * must offer.
  */
object Stateful {

  final case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)

  final case class SessionState(
      start: Timestamp, last: Timestamp, nEvents: Long, sumValue: Double)

  /** A closed (emitted) user session. */
  final case class ClosedSession(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  /** Per-user gap-closed sessions over a (possibly streaming) Dataset of
    * events. Events farther than `gapMillis` from the running session close
    * it and open a new one; the final open session is emitted on timeout
    * (streaming) or at end-of-group (batch test harness).
    */
  def userSessions(
      spark: SparkSession,
      events: Dataset[Event],
      gapMillis: Long): Dataset[ClosedSession] = {
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val keyEnc = Encoders.scalaLong

    def fn(userId: Long, it: Iterator[Event], state: GroupState[SessionState]): Iterator[ClosedSession] = {
      var cur = state.getOption
      val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
      it.toSeq.sortBy(_.ts.getTime).foreach { e =>
        cur match {
          case Some(s) if e.ts.getTime - s.last.getTime <= gapMillis =>
            cur = Some(s.copy(last = e.ts, nEvents = s.nEvents + 1,
              sumValue = s.sumValue + e.value))
          case Some(s) =>
            out += ClosedSession(userId, s.start, s.last, s.nEvents, s.sumValue)
            cur = Some(SessionState(e.ts, e.ts, 1L, e.value))
          case None =>
            cur = Some(SessionState(e.ts, e.ts, 1L, e.value))
        }
      }
      if (state.hasTimedOut) {
        cur.foreach(s => out += ClosedSession(userId, s.start, s.last, s.nEvents, s.sumValue))
        state.remove()
      } else {
        cur.foreach(state.update)
      }
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Batch-mode convenience: run sessions over a bounded Dataset and ALSO
    * flush the still-open sessions (batch has no timeouts).
    */
  def userSessionsBatch(
      spark: SparkSession,
      events: Dataset[Event],
      gapMillis: Long): Dataset[ClosedSession] = {
    import spark.implicits._
    // In batch, flatMapGroupsWithState sees each key exactly once; flush by
    // appending a sentinel far-future event per user that forces closure.
    val maxTs = Timestamp.valueOf("9999-01-01 00:00:00")
    val sentinels = events.groupByKey(_.user_id).keys
      .map(u => Event(u, maxTs, "__flush", 0.0))
    userSessions(spark, events.union(sentinels), gapMillis)
  }
}
