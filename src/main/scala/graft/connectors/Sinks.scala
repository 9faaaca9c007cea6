package graft.connectors

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Batch sinks (SURVEY §2.2 "File sinks" / "ClickHouse JDBC sink").
  *
  * File sinks are thin, declarative wrappers over DataFrameWriter — the
  * point at scale is the `partitionBy` layout (one directory per partition
  * value = ClickHouse PARTITION BY analog) and explicit save modes.
  */
object Sinks {

  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
              mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def csv(df: DataFrame, path: String, header: Boolean = true,
          mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", header.toString).csv(path)

  def json(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** ClickHouse writer plan: DDL + batched idempotent inserts.
    *
    * Offline the JDBC leg cannot run (no server, no driver jar); the
    * statement generation and retry policy are the testable surface. On a
    * cluster: `df.write.format("jdbc")` or `foreachBatch` streaming upsert,
    * with ReplacingMergeTree absorbing at-least-once replays (exactly-once
    * effective semantics — the same collapse proven by i02).
    */
  final case class ClickHouseWriteConfig(
      url: String,
      table: String,
      batchSize: Int = 100000,
      maxRetries: Int = 3,
      retryBackoffMs: Long = 1000) {
    require(batchSize > 0 && maxRetries >= 0)

    /** Exponential backoff schedule, capped at 30 s per attempt. */
    def backoffSchedule: Seq[Long] =
      (0 until maxRetries).map(i => math.min(retryBackoffMs << i, 30000L))
  }
}
