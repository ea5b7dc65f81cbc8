package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming CONVERSATION GATE — the continuous analog of the
  * q92 batch operator ([[graft.transcript.ConvGate]]): per-conversation
  * exact integer trace signals and the all-integer keep verdict, emitted
  * EXACTLY ONCE when the watermark proves the conversation over (no turn
  * for `closeGapMinutes` of event time — the transcript analog of a
  * session gap).
  *
  * Unlike [[StreamingSessionize]] — whose per-user stream is unbounded and
  * therefore compacts its open-session prefix — a conversation is a
  * BOUNDED object (the 5000-turn mega-conversation is ~300 KB of state),
  * and the gate's streak/gap signals need the full (turn_idx, ts) order,
  * so the state is simply the conversation's turns buffered until close.
  * That buys bit-exact batch parity: at close the turns sort by
  * (turn_idx, ts) — the batch window order — and fold through the same
  * integer arithmetic. Duplicate input rows are counted like the batch
  * operator counts them (no dedup — a genuine duplicate turn is a signal,
  * not a redelivery; Spark does not redeliver within a run).
  *
  * Emission is append-mode exactly-once by the sessionize argument: a
  * conversation finalizes only when `last turn + closeGap < watermark`,
  * and any turn that could still extend it would be sub-watermark and
  * dropped by Spark's late-data filter. Idle conversations close through
  * an EVENT-TIME timeout armed at `last turn + closeGap + 1` (clamped
  * above the current watermark — the [[StreamingSessionize]] pattern;
  * processing-time timeouts livelock processAllAvailable, see
  * [[StreamingFilter]]).
  */
object StreamingConvGate {

  final case class TurnIn(
      conv_id: String,
      turn_idx: Int,
      role: String,
      tool: String,
      ts: java.sql.Timestamp)

  /** Mirrors the q92 batch output column-for-column. */
  final case class GateOut(
      conv_id: String,
      n_turns: Long,
      n_tool_calls: Long,
      n_distinct_tools: Long,
      tools: String,
      n_gaps: Long,
      gap_min: Long,
      gap_max: Long,
      gap_sum: Long,
      max_role_streak: Long,
      time_ok: Boolean,
      tool_ok: Boolean,
      streak_ok: Boolean,
      keep: Boolean)

  /** Buffered turns: (turn_idx, tsMs, role, tool). */
  final case class ConvState(turns: List[(Int, Long, String, String)], lastTsMs: Long)

  /** The batch fold, verbatim in driver-side arithmetic: sort by
    * (turn_idx, ts) and take adjacent gaps, role streaks, tool roster. */
  private[streaming] def compute(convId: String,
      raw: List[(Int, Long, String, String)]): GateOut = {
    val turns = raw.sortBy(t => (t._1, t._2, t._3, t._4))
    val n = turns.size.toLong
    val toolTurns = turns.filter(_._3 == "tool")
    val nTool = toolTurns.size.toLong
    val roster = toolTurns.map(_._4).distinct.sorted
    val gaps = turns.iterator.sliding(2).withPartial(false)
      .map { case Seq(a, b) => b._2 - a._2 }.toList
    var maxStreak = 0L; var cur = 0L; var prevRole: String = null
    turns.foreach { t =>
      cur = if (t._3 == prevRole) cur + 1 else 1
      prevRole = t._3
      if (cur > maxStreak) maxStreak = cur
    }
    val gapMin = if (gaps.isEmpty) 0L else gaps.min
    val timeOk = gapMin >= 0L
    val toolOk = nTool * 4 <= n
    val streakOk = maxStreak <= 2L
    GateOut(convId, n, nTool, roster.size.toLong, roster.mkString(","),
      gaps.size.toLong, gapMin,
      if (gaps.isEmpty) 0L else gaps.max, gaps.sum,
      maxStreak, timeOk, toolOk, streakOk, timeOk && toolOk && streakOk)
  }

  /** @param lateness watermark delay (bounds disorder)
    * @param closeGapMinutes event-time quiescence that closes a
    *        conversation (the q38 session gap analog) */
  def apply(
      turns: Dataset[TurnIn],
      lateness: String = "10 minutes",
      closeGapMinutes: Int = 60
  ): Dataset[GateOut] = {
    import turns.sparkSession.implicits._
    val closeMs = closeGapMinutes * 60000L

    turns
      .withWatermark("ts", lateness)
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (cid: String, it: Iterator[TurnIn], state: GroupState[ConvState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            val wm = state.getCurrentWatermarkMs()
            if (st.lastTsMs + closeMs < wm) {
              state.remove()
              Iterator.single(compute(cid, st.turns))
            } else {
              // defensive re-arm (the clamp below makes this unreachable)
              state.setTimeoutTimestamp(
                math.max(st.lastTsMs + closeMs + 1L, wm + 1L))
              Iterator.empty
            }
          } else {
            val inc = it.map(t =>
              (t.turn_idx, t.ts.getTime, t.role, t.tool)).toList
            val prior = state.getOption.getOrElse(ConvState(Nil, Long.MinValue))
            val all = prior.turns ++ inc
            val lastTs = math.max(prior.lastTsMs, inc.map(_._2).max)
            state.update(ConvState(all, lastTs))
            state.setTimeoutTimestamp(math.max(
              lastTs + closeMs + 1L, state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }
}
