package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic windowed-analytics helpers. */
object Windows {

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
