package graft.connectors

import org.apache.spark.sql.{Dataset, SparkSession}

/** Binlog-style CDC envelope and its pure collapse semantics
  * (SURVEY §2.2 "Binlog CDC ingestion"). [public: MySQL ROW binlog format;
  * Debezium envelope shape]
  *
  * `position` is the global binlog offset (total order), `op` ∈ c/u/d.
  * The collapse rules are exactly what CdcOps.i02/i03 prove against the
  * DuckDB oracle on the events fixture; here they are factored as typed,
  * reusable functions so the streaming upsert (graft.streaming.StreamOps)
  * and a future live binlog tail share one implementation.
  */
final case class CdcEvent(
    key: Long,
    position: Long,
    tsMicros: Long,
    op: String, // "c" | "u" | "d"
    payload: String)

object CdcCollapse {

  /** Latest event per key by (tsMicros, position) — ReplacingMergeTree FINAL. */
  def latestPerKey(events: Dataset[CdcEvent])(implicit s: SparkSession): Dataset[CdcEvent] = {
    import s.implicits._
    events.groupByKey(_.key).reduceGroups { (a, b) =>
      val cmp = Ordering.Tuple2[Long, Long]
        .compare((a.tsMicros, a.position), (b.tsMicros, b.position))
      if (cmp >= 0) a else b
    }.map(_._2)
  }

  /** Apply tombstones: keys whose latest op is a delete disappear
    * (CollapsingMergeTree / replication DELETE semantics). */
  def applyTombstones(latest: Dataset[CdcEvent])(implicit s: SparkSession): Dataset[CdcEvent] =
    latest.filter(_.op != "d")

  /** Full upsert collapse: the effective table state after replaying the log. */
  def effectiveState(events: Dataset[CdcEvent])(implicit s: SparkSession): Dataset[CdcEvent] =
    applyTombstones(latestPerKey(events))
}
