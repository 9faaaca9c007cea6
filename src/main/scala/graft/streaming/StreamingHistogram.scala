package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

import graft.operators.AdaptiveHistogram
import graft.operators.AdaptiveHistogram.HistState

/** Streaming adaptive histogram: the unbounded-stream counterpart of the
  * batch [[graft.operators.AdaptiveHistogram]] (ClickHouse `histogram(N)`
  * analog, Ben-Haim & Tom-Tov JMLR 2010) — the second law-pinned sketch
  * family's streaming twin, beside [[StreamingHeavyHitters]].
  *
  * Per-group ValueState is THE SAME `HistState` the batch aggregator
  * carries (≤ n (sum, count) bins regardless of rows seen), and each
  * micro-batch folds its rows through the identical
  * `AdaptiveHistogram.insertOne` step — one state shape, one merge
  * policy, one code path for the bin math. The batch guarantees carry
  * over verbatim: weight/sum conservation, ≤ n strictly-increasing
  * bins, and the EXACT REGIME (≤ n distinct values seen ⇒ the exact
  * value histogram under ANY fold order — equality-pinned against the
  * batch d58 aggregation in StreamingSpec). As with the batch form, the
  * fine bin structure of the COMPRESSED regime depends on fold order,
  * so it is law-pinned, not equality-pinned.
  *
  * Emits the current bins per touched group each batch (Update-mode
  * shape — sinks upsert on (group, rank)). `ttl` bounds state for cold
  * groups; an expired group restarts from the empty histogram. */
object StreamingHistogram {

  final case class ValueIn(group: String, v: Long)
  final case class BinOut(group: String, rank: Int, sum: Long, count: Long,
                          n_bins: Int)

  final class Processor(n: Int, ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, ValueIn, BinOut] {
    require(n >= 1, s"need n >= 1 bins, got $n")
    @transient private var st: ValueState[HistState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[HistState](
        "hist", Encoders.product[HistState], ttl)

    override def handleInputRows(key: String, rows: Iterator[ValueIn],
                                 timerValues: TimerValues): Iterator[BinOut] = {
      var s = Option(st.get())
        .getOrElse(HistState(Array.empty[Long], Array.empty[Long]))
      rows.foreach(r => s = AdaptiveHistogram.insertOne(s, r.v, n))
      st.update(s)
      s.sums.indices.iterator.map(i =>
        BinOut(key, i + 1, s.sums(i), s.cnts(i), s.sums.length))
    }
  }

  /** Per-group running n-bin histogram over an unbounded stream (RocksDB
    * state store provider required, like every transformWithState
    * operator here). */
  def histogram(values: Dataset[ValueIn], n: Int,
                ttl: TTLConfig = TTLConfig.NONE)
               (implicit s: SparkSession): Dataset[BinOut] = {
    import s.implicits._
    values.groupByKey(_.group)
      .transformWithState(new Processor(n, ttl), StreamOps.timeModeFor(ttl),
                          OutputMode.Update())
  }
}
