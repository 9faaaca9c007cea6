package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

/** Streaming twin of k49's CCNet quality terciles — the per-source
  * CUTOFF state (the last r14 declared query without a twin that admits
  * bounded state; k50's CC is iterative and legitimately exempt).
  *
  * Input is the SCORE stream (doc, source, ROUND-4 quality score): the
  * scoring side already has its own twin with a parity pin
  * ([[StreamingUnigramLm]] — k49's score IS k40's chain), so this
  * processor contributes exactly the state k49 adds over k40: the
  * per-source score-GRID histogram and the tercile cutoffs derived
  * from it.
  *
  * State shape: keyed by SOURCE, a MapState rounded-score → doc count —
  * the batch plan's (source × rounded-score) GRID carried incrementally
  * (the d28 grid-histogram posture): bounded by the ROUND-4 score
  * DOMAIN per source, never by the corpus; TTL-able. No doc ids in
  * state.
  *
  * Semantics are PROBE-AT-ARRIVAL (the StreamingUnigramLm contract
  * lifted to order statistics): the batch's docs fold into the grid
  * FIRST, then every doc of the batch buckets against the POST-batch
  * cutoffs — c1/c2 = min score whose cumulative count reaches
  * ⌈n/3⌉ / ⌈2n/3⌉ over ALL docs seen so far, exactly k49's tie-sharing
  * cutoff rule (ties at a cutoff share a bucket; never a positional
  * NTILE). A one-batch replay therefore reproduces batch k49's
  * cutoffs and buckets bit-for-bit (pinned in StreamingSpec); across
  * batch cuts, earlier docs keep their at-arrival bucket — the stream
  * answers "which tercile was this doc in when it arrived", the
  * ingest-time routing decision (the retrospective re-bucketing is the
  * batch query's job).
  *
  * Per-source per-batch working memory: the batch's (doc, score) rows
  * (emission needs them — inherent to probe-at-arrival) plus one
  * grid-sized array for the cumulative walk; the rows fold to compact
  * tuples, never whole input objects (the StreamingBigramLm
  * discipline). */
object StreamingQualityBuckets {

  final case class ScoredDoc(doc_id: Long, source: String, score: Double)
  final case class Count(n: Long)
  final case class BucketOut(doc_id: Long, source: String, score: Double,
                             c1: Double, c2: Double, bucket: String)

  final class SourceProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, ScoredDoc, BucketOut] {
    @transient private var grid: MapState[Double, Count] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      grid = getHandle.getMapState[Double, Count](
        "grid", Encoders.scalaDouble, Encoders.product[Count], ttl)

    override def handleInputRows(key: String, rows: Iterator[ScoredDoc],
                                 timerValues: TimerValues): Iterator[BucketOut] = {
      // fold the batch: compact (doc, score) tuples + per-score counts
      val docs = Vector.newBuilder[(Long, Double)]
      val add = scala.collection.mutable.HashMap.empty[Double, Long]
      rows.foreach { r =>
        docs += ((r.doc_id, r.score))
        add.update(r.score, add.getOrElse(r.score, 0L) + 1L)
      }
      add.foreach { case (s, c) =>
        val cur = if (grid.containsKey(s)) grid.getValue(s).n else 0L
        grid.updateValue(s, Count(cur + c))
      }
      // post-batch cutoffs: one grid-sized ascending cumulative walk —
      // c_k = min score with cum ≥ rank, the batch plan's conditional-min
      val cells = grid.iterator().map { case (s, c) => s -> c.n }
        .toArray.sortBy(_._1)
      val n = cells.iterator.map(_._2).sum
      val r1 = (n + 2) / 3
      val r2 = (2 * n + 2) / 3
      var cum = 0L
      var c1 = Double.NaN
      var c2 = Double.NaN
      cells.foreach { case (s, c) =>
        cum += c
        if (c1.isNaN && cum >= r1) c1 = s
        if (c2.isNaN && cum >= r2) c2 = s
      }
      val (k1, k2) = (c1, c2)
      docs.result().iterator.map { case (id, s) =>
        val b = if (s <= k1) "head" else if (s <= k2) "middle" else "tail"
        BucketOut(id, key, s, k1, k2, b)
      }
    }
  }

  /** At-arrival tercile assignment over an unbounded scored-doc stream
    * (RocksDB state store provider required). The only shuffle is the
    * groupByKey on source — the batch plan's grid exchange. */
  def buckets(scored: Dataset[ScoredDoc], ttl: TTLConfig = TTLConfig.NONE)
             (implicit s: SparkSession): Dataset[BucketOut] = {
    import s.implicits._
    scored.groupByKey(_.source)
      .transformWithState(new SourceProcessor(ttl), StreamOps.timeModeFor(ttl),
                          OutputMode.Update())
  }
}
