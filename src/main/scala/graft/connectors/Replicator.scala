package graft.connectors

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** End-to-end MySQL→ClickHouse-style replication, composed from the
  * library's parts — the reference domain's core use-case as one surface:
  *
  *  1. [[bootstrapDdl]] — CREATE the sink table through the §1.2 type
  *     matrix (ReplacingMergeTree versioned by the event timestamp, the
  *     engine whose FINAL semantics equal our latest-per-key collapse);
  *     schema changes mid-stream go through [[DdlPropagate]].
  *  2. [[snapshotEvents]] — the initial bulk copy, expressed as synthetic
  *     'c' events at position 0 so seed and tail share ONE code path (a
  *     real deployment feeds both into the same stream, exactly like the
  *     MemoryStream test does).
  *  3. [[start]] — the continuous tail: latest-per-key state machine
  *     (tombstones INCLUDED, so deletes reach the sink) into the
  *     idempotent per-batch sink (replayed batch ids overwrite their own
  *     output — at-least-once delivery collapses to exactly-once state,
  *     the same contract a ReplacingMergeTree insert gives).
  *  4. [[materializedState]] — read the sink back and collapse, which is
  *     what ClickHouse's `FINAL` does at query time.
  *
  * THE REPLICATOR INVARIANT (proven in ConnectorsSpec over MemoryStream):
  * materializedState(sink) == CdcCollapse.effectiveState(snapshot ++ log)
  * — the streamed, checkpointed, batch-committed pipeline must land in
  * exactly the state a from-scratch log replay computes, deletes included.
  *
  * Scale: state is one row per live key (RocksDB-backed via the
  * transformWithState variant in StreamOps); the sink shuffles only
  * changed rows per micro-batch; the snapshot phase is a plain partitioned
  * batch read (Jdbc.scala's partitionColumn bounds at 100 TB).
  */
object Replicator {

  /** CREATE TABLE for the sink, versioned ReplacingMergeTree keyed by the
    * replication key — FINAL on this table IS latestPerKey. */
  def bootstrapDdl(table: String, schema: StructType,
                   orderBy: Seq[String]): String =
    ClickHouseDdl.createTable(
      table, schema,
      ClickHouseDdl.ReplacingMergeTree(Some("tsMicros")), orderBy)

  /** A snapshot row becomes a synthetic create at position 0 / ts 0: any
    * real binlog event for the key (position ≥ 1) wins over the seed, so
    * snapshot-then-tail needs no fencing. */
  def snapshotEvents(rows: Dataset[(Long, String)])
                    (implicit s: SparkSession): Dataset[CdcEvent] = {
    import s.implicits._
    rows.map { case (key, payload) => CdcEvent(key, 0L, 0L, "c", payload) }
  }

  /** The continuous tail: collapse to effective changes (deletes included)
    * and commit idempotently per batch. */
  def start(events: Dataset[CdcEvent], outDir: String, checkpointDir: String)
           (implicit s: SparkSession): StreamingQuery =
    graft.streaming.StreamOps.startParquetUpsertSink(
      graft.streaming.StreamOps
        .latestPerKeyStream(events, emitTombstones = true).toDF(),
      outDir, checkpointDir,
      // flatMapGroupsWithState declares Append; the per-batch overwrite
      // commit is idempotent under either mode
      org.apache.spark.sql.streaming.OutputMode.Append())

  /** Replay the sink's batch outputs into the current effective state —
    * the query-time collapse ClickHouse FINAL performs. A replica with no
    * committed batch yet is an EMPTY state, not an AnalysisException (the
    * parquet glob matches nothing before the first micro-batch lands). */
  def materializedState(outDir: String)
                       (implicit s: SparkSession): Dataset[CdcEvent] = {
    import s.implicits._
    val batches = Option(new java.io.File(outDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch_"))
    if (batches.isEmpty) s.emptyDataset[CdcEvent]
    else CdcCollapse.effectiveState(
      s.read.parquet(batches.map(_.getPath).toIndexedSeq: _*).as[CdcEvent])
  }
}
