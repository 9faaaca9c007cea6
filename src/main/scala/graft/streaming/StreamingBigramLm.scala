package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of k48's bigram-LM conditional surprise filter — the
  * CONDITIONAL sibling of [[StreamingUnigramLm]] (k40's twin).
  *
  * State shape: keyed by the bigram HEAD token, exactly the two corpus
  * aggregates the batch plan carries as type-level windows —
  *
  *  - `ht` (ValueState, one long): the head's corpus count, the batch
  *    plan's `sum(c) over (partition by a)`;
  *  - `ct` (MapState successor → long): the per-(a,b) corpus counts,
  *    the batch plan's `sum(c) over (partition by a, b)` — the map is
  *    bounded by the head's SUCCESSOR fan-out (Σ over heads = the
  *    bigram-type domain, the same bound as the batch cf frame), and
  *    TTL-able per deployment.
  *
  * Keying by head instead of by pair puts BOTH aggregates behind ONE
  * exchange (the batch plan pays two window exchanges; a pair-keyed
  * processor would need a second head-keyed stream for `ht` and a
  * sink-side join to reassemble — rejected as decoration). No document
  * text is ever held in state.
  *
  * Semantics are PROBE-AT-ARRIVAL (the StreamingUnigramLm contract): a
  * document scores against the corpus accumulated THROUGH ITS OWN
  * micro-batch — `ct`/`ht` are updated with the whole batch FIRST, then
  * every row of the batch reads the post-batch counts, so a one-batch
  * replay reproduces batch k48's corpus MLE exactly; later documents
  * never retroactively re-score earlier ones.
  *
  * Emissions are the per-doc SUFFICIENT STATISTICS, not the score: one
  * [[PairHit]] per (doc, bigram type) carrying the doc's multiplicity
  * and the post-batch (ct, ht). The score −Σ c·ln(ct/ht) / Σc is one
  * sink-side rollup — unlike the unigram twin there is NO second total
  * stream to pair with (the conditional's denominator is per-head and
  * rides the same emission).
  */
object StreamingBigramLm {

  final case class DocIn(doc_id: Long, text: String)
  final case class BgRow(a: String, b: String, doc_id: Long, c: Long)
  final case class Count(n: Long)
  final case class PairHit(doc_id: Long, a: String, b: String, c: Long,
                           ct: Long, ht: Long)

  /** Per-document bigram-type counts, identical to the batch `tf`
    * aggregate (adjacent pairs on single-space split; docs under two
    * tokens contribute nothing — the batch absence rule). */
  def tf(d: DocIn): Seq[BgRow] = {
    val t = d.text.split(" ", -1)
    if (t.length < 2) Seq.empty
    else (0 until t.length - 1).map(i => (t(i), t(i + 1)))
      .groupBy(identity).iterator
      .map { case ((a, b), occ) => BgRow(a, b, d.doc_id, occ.length.toLong) }
      .toSeq
  }

  /** Keyed by head token: fold the batch into `ht` and the successor
    * map first, then emit every row against the POST-batch counts. */
  final class HeadProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, BgRow, PairHit] {
    @transient private var ht: ValueState[Count] = _
    @transient private var ct: MapState[String, Count] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      ht = getHandle.getValueState[Count]("ht", Encoders.product[Count], ttl)
      ct = getHandle.getMapState[String, Count](
        "ct", Encoders.STRING, Encoders.product[Count], ttl)
    }

    override def handleInputRows(key: String, rows: Iterator[BgRow],
                                 timerValues: TimerValues): Iterator[PairHit] = {
      // Probe-at-arrival REQUIRES buffering the batch (rows read post-batch
      // counts), but the buffer is two folded maps, not the row objects:
      // per-(doc, successor) multiplicities and per-successor batch totals.
      // Per-head per-batch memory bound: O(|{(doc, b)} incidence of this
      // head in THIS batch| + |successor types in this batch|) longs — the
      // type-level bound (≪ raw occurrences; a doc repeating "the cat" 100×
      // costs one entry), and rows merging to one entry is rollup-equivalent
      // because merged rows share the same post-batch (ct, ht).
      val dc = scala.collection.mutable.LinkedHashMap.empty[(Long, String), Long]
      val bc = scala.collection.mutable.HashMap.empty[String, Long]
      var batchTotal = 0L
      rows.foreach { r =>
        dc.update((r.doc_id, r.b), dc.getOrElse((r.doc_id, r.b), 0L) + r.c)
        bc.update(r.b, bc.getOrElse(r.b, 0L) + r.c)
        batchTotal += r.c
      }
      val newHt = Option(ht.get()).map(_.n).getOrElse(0L) + batchTotal
      ht.update(Count(newHt))
      val post = bc.map { case (b, add) =>
        val cur = if (ct.containsKey(b)) ct.getValue(b).n else 0L
        val nv = cur + add
        ct.updateValue(b, Count(nv))
        b -> nv
      }
      dc.iterator.map { case ((doc, b), c) =>
        PairHit(doc, key, b, c, post(b), newHt) }
    }
  }

  /** Per-(doc, bigram) corpus-count hits over an unbounded document
    * stream (RocksDB state store provider required). The tf map is
    * map-side; the only shuffle is the groupByKey on the head token. */
  def pairHits(docs: Dataset[DocIn], ttl: TTLConfig = TTLConfig.NONE)
              (implicit s: SparkSession): Dataset[PairHit] = {
    import s.implicits._
    docs.flatMap(tf _)
      .groupByKey(_.a)
      .transformWithState(new HeadProcessor(ttl), StreamOps.timeModeFor(ttl),
                          OutputMode.Update())
  }
}
