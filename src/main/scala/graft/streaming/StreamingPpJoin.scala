package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

/** Streaming EXACT Jaccard dedup — PPJoin prefix filtering as stream state
  * [public: Chaudhuri et al. ICDE'06 SSJoin; Xiao et al. WWW'08 PPJoin].
  * Flags each incoming document whose token-set Jaccard against ANY
  * previously accepted document reaches the threshold, with the EXACT
  * similarity verified on the stored token arrays — the exact-at-scale
  * guarantee of `Dedup.tokenJaccardPairsPrefix`, in the streaming regime
  * where StreamingNearDedup gives only the approximate (SimHash/MinHash)
  * routing.
  *
  * Design, mirroring the batch prefix index:
  *  - a doc's tokens get a FIXED total order — (md5(token), token) — and
  *    only the first `|A| − ⌈t·|A|⌉ + 1` tokens (the prefix) are indexed /
  *    probed. The batch path orders by document frequency; a stream cannot:
  *    df evolves, and the prefix lemma needs index-time and probe-time
  *    orders to AGREE — any shared total order keeps the lemma (two sets
  *    with |A∩B| ≥ ⌈t·max(|A|,|B|)⌉ share a token in both prefixes), a
  *    hash order just prunes less than df-ascending would. Completeness is
  *    unconditional; the price is common tokens sometimes landing in a
  *    prefix.
  *  - state lives PER (block, prefix-token): the ListState holds
  *    (doc_id, full token array) for every accepted doc that indexed this
  *    token — ~(1−t)·|A| state copies per doc, the standard PPJoin index
  *    cost. A new doc probes exactly its own prefix's buckets, never the
  *    corpus.
  *  - candidates are verified IN the processor against the stored arrays
  *    (length filter first, then exact intersection), so every emitted hit
  *    carries the true Jaccard — no second verify stage, no false
  *    positives.
  *
  * A pair sharing several prefix tokens emits one hit per shared bucket;
  * consumers dedup on (doc_id, dup_of) — the same append-only convention
  * as StreamingNearDedup. Replay-idempotent: a re-delivered doc_id neither
  * re-emits nor duplicates its bucket entry.
  *
  * State bound, stated honestly: a bucket holds every accepted doc whose
  * PREFIX contains that token, so the worst bucket is the in-prefix
  * document frequency of the commonest token — and the md5 order prunes
  * common tokens less well than the batch path's df order, so a
  * boilerplate-heavy stream concentrates state (and per-doc verify work)
  * in those buckets. This is the exactness price: any cap that dropped
  * bucket entries would silently un-flag true duplicates (the same
  * argument as GroupEmit's cap — but there an oracle-checked DEGRADATION
  * is declared; here the contract is exactness). Deployments bound state
  * with `ttl` (accepting that expired docs stop matching) or route
  * boilerplate-heavy streams through StreamingNearDedup first.
  */
object StreamingPpJoin {

  final case class PpDoc(doc_id: Long, text: String, block: String)
  final case class PrefixRow(block: String, tok: String, doc_id: Long,
                             tokens: Array[String])
  final case class PpHit(doc_id: Long, dup_of: Long, jaccard: Double)
  final case class Entry(doc_id: Long, tokens: Array[String])

  private def hexMd5(md: java.security.MessageDigest, s: String): String =
    md.digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  /** Distinct tokens in the fixed (md5, token) order — the stream-stable
    * total order both index and probe prefixes use. */
  def orderedTokens(text: String, sep: String = " "): Array[String] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    text.split(sep).distinct.sortBy(t => (hexMd5(md, t), t))
  }

  /** Prefix length |A| − ⌈t·|A|⌉ + 1 (the batch path's ceil epsilon kept:
    * conservative under float t·|A|, never shorter than theory). */
  def prefixLen(n: Int, threshold: Double): Int =
    n - math.ceil(threshold * n - 1e-9).toInt + 1

  /** Per-(block, prefix-token) state machine: verify the incoming doc
    * against every stored candidate exactly, then index it. */
  final class Processor(threshold: Double, ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[(String, String), PrefixRow, PpHit] {
    @transient private var seen: ListState[Entry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[Entry]("seen", Encoders.product[Entry], ttl)

    override def handleInputRows(key: (String, String),
                                 rows: Iterator[PrefixRow],
                                 timerValues: TimerValues): Iterator[PpHit] = {
      val out = Seq.newBuilder[PpHit]
      rows.foreach { r =>
        val entries = seen.get().toSeq
        if (!entries.exists(_.doc_id == r.doc_id)) {
          val bs: Set[String] = r.tokens.toSet
          val lb = r.tokens.length
          entries.foreach { e =>
            val la = e.tokens.length
            // PPJoin length filter: J ≥ t ⟹ min ≥ t·max (same epsilon as
            // the batch join) — skips the intersection for length-hopeless
            // candidates
            if (la >= threshold * lb - 1e-9 && lb >= threshold * la - 1e-9) {
              val i = e.tokens.count(bs)
              val j = i.toDouble / (la + lb - i)
              if (j >= threshold) out += PpHit(r.doc_id, e.doc_id, j)
            }
          }
          seen.appendValue(Entry(r.doc_id, r.tokens))
        }
      }
      out.result().iterator
    }
  }

  /** Wire a (streaming) doc Dataset through the exact prefix-indexed dedup.
    * Requires the RocksDB state store provider (transformWithState). */
  def dedupStream(docs: Dataset[PpDoc], threshold: Double,
                  ttl: TTLConfig = TTLConfig.NONE)
                 (implicit s: SparkSession): Dataset[PpHit] = {
    import s.implicits._
    docs
      .flatMap { d =>
        val ts = orderedTokens(d.text)
        ts.take(math.max(prefixLen(ts.length, threshold), 0))
          .map(tok => PrefixRow(d.block, tok, d.doc_id, ts))
      }
      .groupByKey(r => (r.block, r.tok))
      .transformWithState(new Processor(threshold, ttl),
                          StreamOps.timeModeFor(ttl), OutputMode.Append())
  }
}
