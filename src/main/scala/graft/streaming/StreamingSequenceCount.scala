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
}
