package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic MySQL→ClickHouse-style replication semantics over arbitrary
  * DataFrames — the reference domain's core operators as a reusable library
  * surface. The fixture-bound §2.1 i-block queries are thin instantiations
  * of these (equivalence enforced by the DuckDB oracle through them).
  *
  * Scale: every operator shuffles by the key columns only; latest-per-key is
  * one hash shuffle + per-group top-1 (WindowGroupLimit pushes the rn=1
  * filter below the full sort at execution).
  */
object Replication {

  /** Latest-row-wins per key — ClickHouse `ReplacingMergeTree … FINAL` /
    * replication upsert. `orderCols` are version columns, newest first wins
    * (pass e.g. `desc("ts"), desc("pos")`). */
  def latestPerKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Collapse + delete handling: keys whose latest row is a tombstone
    * disappear (CollapsingMergeTree analog). */
  def effectiveState(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
                     isTombstone: Column): DataFrame =
    latestPerKey(df, keyCols, orderCols).filter(!isTombstone)

  /** SCD-2 interval build: each change row gets `valid_from`=its version ts
    * and `valid_to`=the next change's ts (null = current). */
  def scd2(df: DataFrame, keyCols: Seq[String], tsCol: String,
           tieBreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(asc(tsCol) +: tieBreak: _*)
    df.withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
  }

  /** Incremental watermark slice: the resume-from-checkpoint read. */
  def incrementalSlice(df: DataFrame, watermarkCol: String, exclusiveFrom: Column): DataFrame =
    df.filter(col(watermarkCol) > exclusiveFrom)

  /** Per-partition bookkeeping rollup (ClickHouse PARTITION BY analog). */
  def partitionStats(df: DataFrame, tsCol: String, granularity: String,
                     valueCol: String): DataFrame =
    df.groupBy(date_trunc(granularity, col(tsCol)).as("part"))
      .agg(count(lit(1)).as("n"),
           sum(col(valueCol).cast("decimal(18,6)")).cast("double").as("sum_value"))
}
