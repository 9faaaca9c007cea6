package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

/** Streaming near-dedup: flag each incoming document that is a SimHash
  * near-duplicate of ANY document previously accepted into the corpus —
  * the shape a live training-data ingest needs (dedup of an unbounded
  * stream against the accumulated corpus), where the batch operators
  * (k19 / SimHashDedup) dedup a fixed corpus against itself.
  *
  * Same banded-signature design as the batch path [public: Charikar'02,
  * Manku et al. WWW'07]: a 60-bit per-doc SimHash, split into 4 bands of
  * 15 bits. State lives PER BAND-BUCKET (key = band#, 15-bit value), so
  *  - a new doc probes exactly 4 buckets, never the whole corpus;
  *  - state per bucket is collision-bounded exactly like the batch
  *    GroupEmit buckets — the stream-state mirror of sub-quadratic LSH;
  *  - any pair within Hamming ≤ `maxHamming` ≤ 6ish shares at least one
  *    intact band with high probability (≤ 3 differing bits: guaranteed
  *    by pigeonhole over 4 bands).
  *
  * Signatures are computed per-row in executor Scala (no aggregation
  * before transformWithState — Spark restricts that) and are BIT-IDENTICAL
  * to the batch `SimHashDedup.fingerprints` column pipeline: asserted in
  * StreamingSpec over the documents fixture, which anchors the streaming
  * semantics to the oracle-checked batch truth.
  *
  * A doc colliding in several bands emits one hit per colliding band;
  * consumers that need unique pairs dedup on (doc_id, dup_of) — kept this
  * way so the operator stays append-only without a second stateful stage.
  */
object StreamingNearDedup {

  final case class DocIn(doc_id: Long, text: String)
  final case class BandedSig(band: Int, bkey: Long, doc_id: Long, sig: Long)
  final case class SeenSig(doc_id: Long, sig: Long)
  final case class DupHit(doc_id: Long, dup_of: Long, hamming: Int)

  private def hexMd5(md: java.security.MessageDigest, s: String): String =
    md.digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  private def timeModeFor(ttl: TTLConfig) = StreamOps.timeModeFor(ttl)

  /** 60-bit SimHash of the DISTINCT token set — the executor-side scalar
    * twin of SimHashDedup.fingerprints (md5 first 15 hex chars → 60-bit
    * int, ±1 vote per bit, bit set on positive vote). */
  def simhash60(text: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](60)
    text.split(" ", -1).distinct.foreach { t =>
      val h = java.lang.Long.parseLong(hexMd5(md, t).substring(0, 15), 16)
      var b = 0
      while (b < 60) { votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1); b += 1 }
    }
    (0 until 60).foldLeft(0L)((acc, b) => if (votes(b) > 0) acc | (1L << b) else acc)
  }

  /** The 4 × 15-bit band keys of a signature (same split as
    * SimHashDedup.candidatePairs). */
  def bands(sig: Long): Seq[(Int, Long)] =
    (0 until 4).map(b => (b, (sig >> (b * 15)) & 32767L))

  /** Per-band-bucket state machine: every accepted signature is remembered;
    * an incoming doc emits a DupHit per stored signature within
    * `maxHamming` (full-signature distance — bands only route). */
  final class Processor(maxHamming: Int, ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[(Int, Long), BandedSig, DupHit] {
    @transient private var seen: ListState[SeenSig] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[SeenSig](
        "seen", Encoders.product[SeenSig], ttl)

    override def handleInputRows(key: (Int, Long), rows: Iterator[BandedSig],
                                 timerValues: TimerValues): Iterator[DupHit] = {
      val out = Seq.newBuilder[DupHit]
      rows.foreach { r =>
        // replay-idempotent (at-least-once sources re-deliver): a doc_id
        // already in this bucket neither re-emits its hits nor appends a
        // duplicate state entry — otherwise every replay would double all
        // future DupHits for this doc and grow state without bound.
        // Materializing the bucket is fine: its size is LSH-bounded.
        val entries = seen.get().toSeq
        if (!entries.exists(_.doc_id == r.doc_id)) {
          entries.foreach { p =>
            val d = java.lang.Long.bitCount(p.sig ^ r.sig)
            if (d <= maxHamming) out += DupHit(r.doc_id, p.doc_id, d)
          }
          seen.appendValue(SeenSig(r.doc_id, r.sig))
        }
      }
      out.result().iterator
    }
  }

  /** Wire a (streaming) doc Dataset through the banded dedup. Requires the
    * RocksDB state store provider (transformWithState). */
  def dedupStream(docs: Dataset[DocIn], maxHamming: Int = 6,
                  ttl: TTLConfig = TTLConfig.NONE)
                 (implicit s: SparkSession): Dataset[DupHit] = {
    import s.implicits._
    docs
      .flatMap { d =>
        val sig = simhash60(d.text)
        bands(sig).map { case (b, k) => BandedSig(b, k, d.doc_id, sig) }
      }
      .groupByKey(bs => (bs.band, bs.bkey))
      .transformWithState(new Processor(maxHamming, ttl), timeModeFor(ttl),
                          OutputMode.Append())
  }

  // ---- MinHash twin (the k14/k15 signature family, streamed) ----

  final case class MinHashHit(doc_id: Long, dup_of: Long)

  /** The k14/k15 MinHash band of a document, executor-side: for each of the
    * 4 salted hash functions, min over the token set of md5("salt:token") —
    * string-min over hex, EXACTLY the Spark `min(md5(...))` aggregate and
    * the DuckDB `MIN(MD5('salt:'||t))`, so the streaming band key equals the
    * batch k15 band (asserted in StreamingSpec). */
  def minhashBand(text: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val tokens = text.split(" ", -1)
    (0 until 4).map(salt =>
      tokens.iterator.map(t => hexMd5(md, s"$salt:$t")).min).mkString
  }

  /** Per-band-bucket membership state: an incoming doc whose banded MinHash
    * signature was seen before is a near-dup candidate of every earlier
    * holder (estimated Jaccard ≥ the band's LSH threshold). */
  final class MinHashProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, (String, Long), MinHashHit] {
    @transient private var seen: ListState[java.lang.Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[java.lang.Long](
        "seen", Encoders.LONG, ttl)

    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
                                 timerValues: TimerValues): Iterator[MinHashHit] = {
      val out = Seq.newBuilder[MinHashHit]
      rows.foreach { case (_, id) =>
        // same replay-idempotence as Processor: re-delivered ids neither
        // re-emit nor duplicate state
        val entries = seen.get().toSeq
        if (!entries.contains(id)) {
          entries.foreach(prev => out += MinHashHit(id, prev))
          seen.appendValue(id)
        }
      }
      out.result().iterator
    }
  }

  /** Streaming k15: flag docs whose MinHash band collides with any earlier
    * doc. Pairs with the batch k15 candidate generator the way
    * [[dedupStream]] pairs with k19. */
  def minhashDedupStream(docs: Dataset[DocIn], ttl: TTLConfig = TTLConfig.NONE)
                        (implicit s: SparkSession): Dataset[MinHashHit] = {
    import s.implicits._
    docs
      .map(d => (minhashBand(d.text), d.doc_id))
      .groupByKey(_._1)
      .transformWithState(new MinHashProcessor(ttl), timeModeFor(ttl),
                          OutputMode.Append())
  }
}
