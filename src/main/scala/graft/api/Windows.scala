package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic windowed-analytics helpers. */
object Windows {

  /** As-of join: each `right` row enriched with the latest `left` value at
    * or before its timestamp, per key — backward as-of, the
    * trades-get-latest-quote / purchases-get-latest-signup operator.
    *
    * NOT a range join: the naive join + per-key max materializes
    * |left_k| × |right_k| rows per key (quadratic in per-key activity —
    * one hot key at 100× data skews a single task). Here both inputs are
    * UNIONed and a running `last(value) IGNORE NULLS` window carries the
    * as-of value forward: one shuffle on the key, linear per-key work,
    * WindowExec's spillable buffer. Ties at equal ts resolve
    * left-before-right (a left row AT the right row's ts is visible —
    * standard `asof backward` inclusive semantics). NULL keys never match
    * (join parity), and NULL-ts left rows contribute nothing.
    *
    * Returns `right`'s columns plus `outCol` (left's `valueCol` type). */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           valueCol: String, outCol: String = "asof_value"): DataFrame = {
    val vType = left.schema(valueCol).dataType
    val rowT = struct(right.columns.map(col): _*)
    val r = right.select(col(keyCol).as("__k"), col(tsCol).as("__t"),
                         lit(null).cast(vType).as("__v"), lit(1).as("__kind"),
                         rowT.as("__row"))
    val l = left.select(col(keyCol).as("__k"), col(tsCol).as("__t"),
                        col(valueCol).as("__v"), lit(0).as("__kind"),
                        lit(null).cast(r.schema("__row").dataType).as("__row"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__kind").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__kind") === 1)
      .select(right.columns.map(c => col(s"__row.$c").as(c)) :+
              when(col("__k").isNull, lit(null).cast(vType))
                .otherwise(col("__asof")).as(outCol): _*)
  }

  /** Top-k rows per group. Plans as WindowGroupLimit: per-partition top-k
    * runs before the full window sort materializes, so only k·groups rows
    * survive the shuffle. */
  def topKPerGroup(df: DataFrame, partitionCols: Seq[String],
                   orderCols: Seq[Column], k: Int,
                   rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Batch sessionization with Spark session_window semantics:
    * session end = last event + gap. */
  def sessionize(df: DataFrame, tsCol: String, keyCol: String, gap: String): DataFrame =
    df.groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("session_window.start").as("s_start"),
              col("session_window.end").as("s_end"), col("n_events"))
}
