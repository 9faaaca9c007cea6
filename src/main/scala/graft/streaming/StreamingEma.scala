package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Streaming exponential moving average: the unbounded-stream
  * counterpart of the batch `e20_exp_moving_avg` declared query
  * (ClickHouse `exponentialMovingAverage` analog) — smoothed live
  * metrics are the canonical streaming use of EMA.
  *
  * The state is 4 longs per key: the (ts, id) of the last folded event
  * and the running scaled EMA plus count — the ENTIRE recursion state,
  * bounded at any stream length. Each micro-batch's rows are sorted by
  * the batch query's exact (ts, event_id) total order before folding
  * through the IDENTICAL integer step (`acc + (x − acc) div 8` on
  * 2^16-scaled cents): one recursion, one scale, one step function
  * across both paths.
  *
  * EMA is order-SENSITIVE (unlike the M4/timing-quantile twins'
  * commutative states), so the parity contract is: rows arriving
  * in (ts, id) order across batches — the in-order-replay regime —
  * reproduce the batch fold EXACTLY (equality-pinned in StreamingSpec
  * across a mid-stream batch cut). Out-of-order rows (ts, id) ≤ the
  * last folded event are DROPPED, never retro-folded — the same
  * no-retroactivity posture as the contamination probe; a production
  * deployment that needs late-data tolerance puts a watermark-sized
  * sort buffer in front (documented, not silently approximated).
  */
object StreamingEma {

  final case class EmaIn(key: Long, tsUs: Long, eventId: Long, cents: Long)
  final case class EmaState(lastTs: Long, lastId: Long, ema: Long, n: Long)
  final case class EmaOut(key: Long, ema_scaled: Long, ema_cents: Long, n: Long)

  final class Processor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, EmaIn, EmaOut] {
    @transient private var st: ValueState[EmaState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[EmaState]("ema", Encoders.product[EmaState], ttl)

    override def handleInputRows(key: Long, rows: Iterator[EmaIn],
                                 timerValues: TimerValues): Iterator[EmaOut] = {
      var s = Option(st.get()).orNull
      // the batch query's (ts, event_id) total order within the batch
      rows.toArray.sortBy(r => (r.tsUs, r.eventId)).foreach { r =>
        val x = r.cents * 65536L
        s = if (s == null) EmaState(r.tsUs, r.eventId, x, 1L)
        else if (r.tsUs > s.lastTs || (r.tsUs == s.lastTs && r.eventId > s.lastId))
          EmaState(r.tsUs, r.eventId, s.ema + (x - s.ema) / 8L, s.n + 1L)
        else s // out-of-order: dropped, never retro-folded
      }
      st.update(s)
      Iterator.single(EmaOut(key, s.ema, s.ema / 65536L, s.n))
    }
  }

  /** Per-key running EMA (α = 1/8, exact integer recursion) over an
    * unbounded stream (needs the RocksDB state store provider, like
    * every transformWithState operator here). */
  def ema(values: Dataset[EmaIn], ttl: TTLConfig = TTLConfig.NONE)
         (implicit s: SparkSession): Dataset[EmaOut] = {
    import s.implicits._
    values.groupByKey(_.key)
      .transformWithState(new Processor(ttl),
                          StreamOps.timeModeFor(ttl), OutputMode.Update())
  }
}
