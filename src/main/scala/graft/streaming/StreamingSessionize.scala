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
  * State per user is BOUNDED BY THE LATENESS WINDOW, not by session
  * length: an open session's sub-watermark prefix is immutable (no
  * incoming event can precede the watermark, so the prefix's gap structure
  * is frozen — only the first open session can even contain such events)
  * and is COMPACTED each invocation into three numbers
  * (event count, start, last frozen timestamp). A continuously-active
  * user who never gaps therefore holds only the events inside the
  * lateness horizon plus the O(1) compacted head — not the whole open
  * session. The session-counter record itself persists across idle
  * periods (bytes per user ever seen — the price of the global 1..n
  * numbering). Idle users finalize through an EVENT-TIME timeout at the
  * open session's last event + gap (processing-time timeouts would make
  * every micro-batch schedule another — the processAllAvailable livelock
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

  /** State schema v2 (adds the compacted head) — NOT restore-compatible
    * with checkpoints written by the pre-compaction shape: drain the query
    * (watermark past every open session) or discard operator state when
    * upgrading, as with any flatMapGroupsWithState encoder change.
    *
    * @param pendingUs open-session events not yet below the watermark
    * @param headN compacted frozen-prefix event count of the FIRST open
    *              session (0 = no compacted head)
    * @param headStartUs / headLastUs the compacted prefix's start and last
    *              event times */
  final case class UserState(
      pendingUs: List[(Long, Long)],
      nextSession: Long,
      headN: Long,
      headStartUs: Long,
      headLastUs: Long
  )

  /** Session under construction: aggregate counts (which include any
    * compacted prefix) + the uncompacted events it holds. */
  private final case class Sess(
      n: Long, startUs: Long, lastUs: Long, events: List[(Long, Long)])

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
      val prior = state.getOption.getOrElse(UserState(Nil, 1L, 0L, 0L, 0L))
      // merge + order by (ts, event_id): the total order batch q38 uses.
      // Incoming events are ≥ watermark (Spark's late filter), compacted
      // events were < watermark — the two can never alias, so distinct
      // still dedups cross-batch redeliveries of pending events.
      val all = (prior.pendingUs ++ incoming).distinct.sorted

      // rebuild the session chain, seeded with the compacted head
      val sessions = scala.collection.mutable.ArrayBuffer.empty[Sess]
      if (prior.headN > 0)
        sessions += Sess(prior.headN, prior.headStartUs, prior.headLastUs, Nil)
      all.foreach { e =>
        if (sessions.nonEmpty && e._1 - sessions.last.lastUs <= gapUs) {
          val s = sessions.last
          sessions(sessions.length - 1) =
            Sess(s.n + 1, s.startUs, e._1, e :: s.events)
        } else sessions += Sess(1L, e._1, e._1, List(e))
      }
      if (sessions.isEmpty) {
        // defensive (unreachable: timeouts are only armed while sessions
        // are open) — never drop the session counter
        state.update(prior)
        return Iterator.empty
      }

      val wmUs = state.getCurrentWatermarkMs() * 1000L
      // a session is final when nothing at-or-above the watermark can join
      val (done, open) = sessions.partition(s => s.lastUs + gapUs < wmUs)
      var seq = prior.nextSession
      val out = done.map { s =>
        val r = SessionOut(userId, seq, s.n, s.startUs, s.lastUs,
          s.lastUs - s.startUs)
        seq += 1
        r
      }

      // COMPACTION: only the first open session can hold sub-watermark
      // events (a later session's first event would prove the earlier one
      // final). Fold them — and any prior head — into (n, start, last).
      var headN = 0L; var headStart = 0L; var headLast = 0L
      var pending = List.empty[(Long, Long)]
      open.zipWithIndex.foreach { case (s, idx) =>
        if (idx == 0) {
          val (frozen, live) = s.events.partition(_._1 < wmUs)
          val priorHeadN = s.n - s.events.length // head contribution, if seeded
          val frozenN = priorHeadN + frozen.length
          if (frozenN > 0) {
            headN = frozenN
            headStart = s.startUs
            headLast = frozen.map(_._1).foldLeft(
              if (priorHeadN > 0) prior.headLastUs else Long.MinValue)(math.max)
          }
          pending = pending ++ live
        } else pending = pending ++ s.events
      }
      // state is kept even when no session is open: the session counter
      // must survive idle periods, or a returning user would restart at
      // session_id=1 and emit duplicate (user_id, session_id) keys. The
      // lingering record is (Nil, counter, no head) — bytes per user ever
      // seen, the inherent price of a global per-user 1..n numbering (drop
      // the numbering contract if user cardinality forbids it).
      state.update(UserState(pending.sorted, seq, headN, headStart, headLast))
      if (open.nonEmpty) {
        // wake when the earliest OPEN session could finalize: its LAST
        // event + gap (waking at its first event + gap is always too early
        // for multi-event sessions and re-arms every micro-batch); clamped
        // above the current watermark (Spark rejects earlier timestamps)
        val wake = open.map(_.lastUs).min / 1000L + gapUs / 1000L + 1L
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
