package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Streaming sequenceCount: the unbounded-stream counterpart of the batch
  * j08 query — per-user running count of non-overlapping open→close event
  * chains (ClickHouse `sequenceCount('(?1).*(?2)')` analog [public: CH
  * docs]).
  *
  * Where the batch form uses the bracket-matching identity to avoid state
  * (count = totalB − max prefix excess, one window pass), the streaming
  * form keeps the bracket machine itself: per user a (open, matched) pair
  * — TWO longs, regardless of how many events the user ever produces.
  * That bounded-state property is exactly why the greedy/bracket semantic
  * is the production choice for unbounded streams: the "best possible"
  * retrospective matching would need the whole history, the greedy one
  * needs a counter. The two agree on every complete log — pinned in
  * StreamingSpec against the same brute-force greedy scan that
  * PropertiesSpec proves equal to j08's closed form.
  *
  * Ordering contract: cross-batch order is arrival order (the stream's
  * truth); within a micro-batch, rows are sorted by (ts_micros, event_id)
  * so a batch boundary never reorders a user's events relative to the
  * batch-at-once result. A per-batch sort of ONE user's slice is the same
  * bounded work every funnel/session operator does; no cross-user or
  * cross-batch buffering exists.
  *
  * Emits the updated running count for each user touched by the batch
  * (Update-mode shape — downstream sinks upsert on user_id). `ttl` bounds
  * state for cold users; an expired user restarts from (0, 0), which
  * undercounts straddling chains — the standard TTL trade, document per
  * deployment (same posture as LatestPerKeyProcessor).
  */
object StreamingSequenceCount {

  final case class EventIn(user_id: Long, ts_micros: Long, event_id: Long,
                           event_type: String)
  final case class ChainState(open: Long, matched: Long)
  final case class ChainCount(user_id: Long, open: Long, n_chains: Long)

  final class Processor(openType: String, closeType: String,
                        ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, EventIn, ChainCount] {
    @transient private var st: ValueState[ChainState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[ChainState](
        "chain", Encoders.product[ChainState], ttl)

    override def handleInputRows(key: Long, rows: Iterator[EventIn],
                                 timerValues: TimerValues): Iterator[ChainCount] = {
      var s = Option(st.get()).getOrElse(ChainState(0L, 0L))
      rows.toArray.sortBy(e => (e.ts_micros, e.event_id)).foreach { e =>
        if (e.event_type == openType) s = ChainState(s.open + 1, s.matched)
        else if (e.event_type == closeType && s.open > 0)
          s = ChainState(s.open - 1, s.matched + 1)
      }
      st.update(s)
      Iterator.single(ChainCount(key, s.open, s.matched))
    }
  }

  /** Per-user running chain counts over an unbounded event stream (needs the
    * RocksDB state store provider, like every transformWithState operator
    * here). */
  def chainCounts(events: Dataset[EventIn],
                  openType: String = "signup", closeType: String = "purchase",
                  ttl: TTLConfig = TTLConfig.NONE)
                 (implicit s: SparkSession): Dataset[ChainCount] = {
    import s.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new Processor(openType, closeType, ttl),
                          StreamOps.timeModeFor(ttl), OutputMode.Update())
  }

  // -------------------------------------------------------------------
  // Time-bounded span-disjoint counting: the streaming twin of
  // SequenceMatch.countChainsBounded (batch consumer: j18).
  // -------------------------------------------------------------------

  final case class BoundedState(bestA: Long, n: Long, nEvents: Long)
  final case class BoundedCount(user_id: Long, n_chains: Long, n_events: Long)

  /** Streaming twin of
    * [[graft.operators.SequenceMatch.countChainsBounded]]: span-disjoint
    * time-bounded A→B chains counted by the SAME 2-long restart
    * automaton the batch fold runs — best-opener-since-restart (LATEST
    * A for upper bounds, EARLIEST for lower) + count — so it streams by
    * construction; the fold is already a left fold in (ts, tie) order.
    * In-order delivery ⇒ emissions equal the batch j18 exactly (pinned
    * across a batch cut in StreamingSpec). */
  final class BoundedProcessor(typeA: String, typeB: String, op: String,
                               boundMicros: Long,
                               ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, EventIn, BoundedCount] {
    require(Set("<=", "<", ">", ">=")(op), s"unsupported time operator '$op'")
    private val upper = op == "<=" || op == "<"
    // max-mode sentinel −2^62 / min-mode +2^62 — the batch fold's values
    private val Sent =
      if (upper) -4611686018427387904L else 4611686018427387904L
    @transient private var st: ValueState[BoundedState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[BoundedState](
        "boundedchain", Encoders.product[BoundedState], ttl)

    private def isSet(bestA: Long): Boolean =
      if (upper) bestA > Sent else bestA < Sent

    private def gapOk(bestA: Long, t: Long): Boolean = op match {
      case "<=" => t <= bestA + boundMicros
      case "<"  => t < bestA + boundMicros
      case ">"  => t > bestA + boundMicros
      case ">=" => t >= bestA + boundMicros
    }

    override def handleInputRows(key: Long, rows: Iterator[EventIn],
                                 timerValues: TimerValues): Iterator[BoundedCount] = {
      var s = Option(st.get()).getOrElse(BoundedState(Sent, 0L, 0L))
      rows.toArray.sortBy(e => (e.ts_micros, e.event_id)).foreach { e =>
        // B-check BEFORE the A-update (an event cannot chain with itself)
        if (e.event_type == typeB && isSet(s.bestA) &&
            gapOk(s.bestA, e.ts_micros))
          s = s.copy(bestA = Sent, n = s.n + 1L)
        else if (e.event_type == typeA)
          s = s.copy(bestA =
            if (!isSet(s.bestA)) e.ts_micros
            else if (upper) math.max(s.bestA, e.ts_micros)
            else math.min(s.bestA, e.ts_micros))
        s = s.copy(nEvents = s.nEvents + 1L)
      }
      st.update(s)
      Iterator.single(BoundedCount(key, s.n, s.nEvents))
    }
  }

  /** Per-user running span-disjoint bounded chain count — defaults mirror
    * the batch j18 (signup→click within 4 hours). */
  def boundedChainCounts(events: Dataset[EventIn],
                         typeA: String = "signup", typeB: String = "click",
                         op: String = "<=",
                         boundMicros: Long = 14400L * 1000000L,
                         ttl: TTLConfig = TTLConfig.NONE)
                        (implicit s: SparkSession): Dataset[BoundedCount] = {
    import s.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new BoundedProcessor(typeA, typeB, op, boundMicros, ttl),
                          StreamOps.timeModeFor(ttl), OutputMode.Update())
  }
}
