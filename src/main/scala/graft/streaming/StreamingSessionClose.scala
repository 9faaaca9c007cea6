package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Timer-closed sessionization: the unbounded-stream twin of the batch
  * `j03_session` query (`session_window`, 30-minute gap) — and the first
  * twin to exercise the TIMER facility of `transformWithState`
  * [public: Spark 4 StatefulProcessorHandle.registerTimer /
  * handleExpiredTimer, the documented sessionization use case].
  *
  * What is NEW here relative to the other 30+ twins (which are all
  * Update-mode upserts re-emitting a running value): sessions are
  * emitted EXACTLY ONCE, on CLOSE, in Append mode — a gap-close when a
  * later in-session event arrives, or a WATERMARK-close when the
  * event-time watermark passes `last_event + gap` and the registered
  * event-time timer fires with no successor event. The changelog is
  * final-result-only; a downstream consumer never sees a session twice.
  *
  * Semantics, µs-exact (the fixture carries microsecond timestamps, so
  * millisecond arithmetic would diverge from the batch `session_window`
  * which works in Spark's native µs): an event at `t` joins the open
  * session iff `t − last < gap` (µs integers); otherwise the open
  * session closes as `[start, last + gap)` and a new one opens — the
  * exact j03/`session_window` boundary rule (a gap of EXACTLY 30
  * minutes starts a new session; `s_end = last + gap`). Timers are
  * registered in ms (the API's unit) rounded UP, and the close decision
  * never trusts the timer's own timestamp: it re-checks
  * `watermark ≥ end` in µs-vs-ms-floor terms, so a stale timer (from a
  * superseded `last`) fires harmlessly and the final timer closes the
  * session exactly once.
  *
  * Honest caveats (the EMA/funnel in-order class): events must arrive
  * in event-time order ACROSS batches for the gap-splits to match batch
  * (within a batch, arrival order is free — rows are sorted here);
  * late data beyond the watermark would have joined a session the
  * watermark already closed. Both are the standard Structured Streaming
  * sessionization contract, stated rather than hidden. The trailing
  * (never-closed) sessions are emitted only when the watermark passes
  * them — the StreamingSpec pin advances it with a sentinel event. */
object StreamingSessionClose {

  final case class EventIn(user_id: Long, ts: Timestamp)
  final case class SessionOut(user_id: Long, s_start: Timestamp,
                              s_end: Timestamp, n_events: Long)
  /** Open-session state: all µs since epoch. */
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long)

  private def us(t: Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.getNanos / 1000L
  private def tsOf(usVal: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(usVal, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(usVal, 1000000L) * 1000L).toInt)
    t
  }

  final class Processor(gapUs: Long)
      extends StatefulProcessor[Long, EventIn, SessionOut] {
    @transient private var st: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[OpenSession](
        "sess", Encoders.product[OpenSession], TTLConfig.NONE)

    private def closed(key: Long, s: OpenSession): SessionOut =
      SessionOut(key, tsOf(s.startUs), tsOf(s.lastUs + gapUs), s.n)

    override def handleInputRows(key: Long, rows: Iterator[EventIn],
                                 timerValues: TimerValues): Iterator[SessionOut] = {
      // within-batch arrival order is free; event-time order is the contract
      val sorted = rows.toSeq.sortBy(e => us(e.ts))
      var out = List.empty[SessionOut]
      var cur = Option(st.get())
      sorted.foreach { e =>
        val t = us(e.ts)
        cur match {
          case Some(s) if t - s.lastUs < gapUs =>
            // joins the open session (monotone input => t >= lastUs, but
            // max() keeps a same-batch out-of-order stray from shrinking it)
            cur = Some(OpenSession(s.startUs, math.max(s.lastUs, t), s.n + 1))
          case Some(s) =>
            out ::= closed(key, s) // gap-close
            cur = Some(OpenSession(t, t, 1L))
          case None =>
            cur = Some(OpenSession(t, t, 1L))
        }
      }
      cur.foreach { s =>
        st.update(s)
        // ms-ceil so the timer can never fire BEFORE the µs-exact end
        getHandle.registerTimer(Math.floorDiv(s.lastUs + gapUs, 1000L) + 1L)
      }
      out.reverseIterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      // decide on the WATERMARK, not the timer's timestamp: stale timers
      // (registered for a superseded `last`) fire harmlessly
      val s = st.get()
      if (s != null &&
          timerValues.getCurrentWatermarkInMs * 1000L >= s.lastUs + gapUs) {
        st.clear()
        Iterator.single(closed(key, s))
      } else Iterator.empty
    }
  }

  /** Append-mode closed-session stream. `events` must carry a watermark on
    * `ts` (event-time timers require it); `gap` in microseconds. */
  def sessions(events: Dataset[EventIn], gapUs: Long)
              (implicit s: SparkSession): Dataset[SessionOut] = {
    import s.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new Processor(gapUs),
                          TimeMode.EventTime(), OutputMode.Append())
  }
}
