package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming SESSIONIZATION — the continuous analog of the q38
  * batch operator: gap-based sessions per user, emitted exactly once when
  * the watermark proves no further event can join them.
  *
  * Semantics match the batch lag+running-sum formulation: events of one
  * user sort by (ts, event_id); a gap > `gapUs` starts a new session;
  * `session_id` numbers a user's sessions 1..n in time order. A session is
  * FINAL when `last event + gap < watermark` — any event that could still
  * extend it would have `ts ≤ last + gap < watermark` and Spark drops
  * sub-watermark input — so append-mode emission is exactly-once and
  * re-read-idempotent, like [[StreamingMetrics]].
  *
  * State per user is the NON-finalizable suffix of its events (those within
  * `gap` of the watermark horizon) plus a session counter — the event
  * buffer is bounded by the rate inside (lateness + gap), never by stream
  * length; the counter record itself persists across idle periods (bytes
  * per user ever seen — the price of the global 1..n numbering). Idle
  * users finalize through an EVENT-TIME timeout at the open session's
  * last event + gap (processing-time timeouts would make every
  * micro-batch schedule another — the processAllAvailable livelock
  * documented in [[StreamingFilter]]).
  */
object StreamingSessionize {

  final case class SessEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long)

  final case class SessionOut(
      user_id: Long,
      session_id: Long, // 1-based, in time order per user
      n_events: Long,
      start_us: Long,
      end_us: Long,
      dur_us: Long
  )

  final case class UserState(pendingUs: List[(Long, Long)], nextSession: Long)

  /** @param lateness watermark delay (bounds disorder AND state size)
    * @param gapMinutes session gap (batch q38 uses 30) */
  def apply(
      events: Dataset[SessEvent],
      lateness: String = "10 minutes",
      gapMinutes: Int = 30
  ): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def emitFinalized(
        userId: Long,
        state: GroupState[UserState],
        incoming: Seq[(Long, Long)]
    ): Iterator[SessionOut] = {
      val prior = state.getOption.getOrElse(UserState(Nil, 1L))
      // merge + order by (ts, event_id): the total order batch q38 uses
      val all = (prior.pendingUs ++ incoming).distinct.sorted
      if (all.isEmpty) {
        // defensive (unreachable: timeouts are only armed while sessions
        // are open) — never drop the session counter
        state.update(prior)
        return Iterator.empty
      }

      val wmUs = state.getCurrentWatermarkMs() * 1000L
      // split into gap-delimited sessions
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(all.head))
      all.tail.foreach { e =>
        if (e._1 - sessions.last.last._1 > gapUs)
          sessions += scala.collection.mutable.ArrayBuffer(e)
        else sessions.last += e
      }
      // a session is final when nothing at-or-above the watermark can join
      val (done, open) = sessions.partition(s => s.last._1 + gapUs < wmUs)
      var seq = prior.nextSession
      val out = done.map { s =>
        val r = SessionOut(userId, seq, s.size.toLong, s.head._1, s.last._1,
          s.last._1 - s.head._1)
        seq += 1
        r
      }
      val pending = open.flatten.toList
      // state is kept even when no session is open: the session counter
      // must survive idle periods, or a returning user would restart at
      // session_id=1 and emit duplicate (user_id, session_id) keys. The
      // lingering record is (Nil, counter) — bytes per user ever seen, the
      // inherent price of a global per-user 1..n numbering (drop the
      // numbering contract if user cardinality forbids it).
      state.update(UserState(pending, seq))
      if (pending.nonEmpty) {
        // wake when the earliest OPEN session could finalize: its LAST
        // event + gap (waking at its first event + gap is always too early
        // for multi-event sessions and re-arms every micro-batch); clamped
        // above the current watermark (Spark rejects earlier timestamps)
        val wake = open.map(_.last._1).min / 1000L + gapUs / 1000L + 1L
        state.setTimeoutTimestamp(
          math.max(wake, state.getCurrentWatermarkMs() + 1L))
      }
      out.iterator
    }

    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[SessEvent], state: GroupState[UserState]) =>
          if (state.hasTimedOut) emitFinalized(userId, state, Nil)
          else {
            val incoming = it.map(e =>
              (e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L,
                e.event_id)).toSeq
            emitFinalized(userId, state, incoming)
          }
      }
  }
}
