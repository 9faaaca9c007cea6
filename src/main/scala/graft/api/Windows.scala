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

  /** Order-statistics rank against a population: each `probes` row enriched
    * with the count of `values` rows whose `valueCol` strictly exceeds the
    * probe's `probeCol` — the "how many X exceed Y" operator, and the
    * scale-safe plan for the non-equi-join shape
    * `probes LEFT JOIN values ON v > p` + COUNT.
    *
    * NOT a theta join: Spark plans `ON v > p` as a nested-loop join and for
    * an outer build may only broadcast the *population* side — fatal when
    * the population is the fact table (15M+ rows at 100× blows any
    * broadcast threshold; the non-broadcast fallback is cartesian-shaped).
    * Here both inputs are UNIONed, range-partitioned descending on the
    * value, and a two-pass prefix sum computes the exact count:
    * per-range-partition running counts, plus a per-partition offset
    * (a #partitions-row aggregate, broadcast back). One range exchange +
    * one pid-hash exchange; the fact side is never broadcast and never
    * joined against itself; per-partition work is linear.
    *
    * Semantics mirror the left non-equi join + COUNT(value_pk): NULL
    * population values never count (filter them before calling if the
    * counted column differs from `valueCol`); a NULL probe matches nothing
    * (count 0); comparison is strict, so equal values do not count.
    * Returns `probes`' columns plus `outCol` (LONG). */
  def rankAgainst(probes: DataFrame, values: DataFrame, probeCol: String,
                  valueCol: String, outCol: String = "n_greater"): DataFrame = {
    val rowT = struct(probes.columns.map(col): _*)
    val p = probes.select(col(probeCol).as("__b"), lit(0L).as("__w"),
                          lit(0).as("__kind"), rowT.as("__row"))
    val v = values.filter(col(valueCol).isNotNull)
      .select(col(valueCol).as("__b"), lit(1L).as("__w"), lit(1).as("__kind"),
              lit(null).cast(p.schema("__row").dataType).as("__row"))
    // desc on value, probes-before-equal-values: a probe's prefix sum then
    // counts exactly the strictly-greater population rows. RangePartitioner
    // keeps equal sort keys in one partition, and a probe/equal-value split
    // across a boundary still resolves correctly (the probe sorts earlier).
    val u = p.unionByName(v)
      .repartitionByRange(col("__b").desc_nulls_last, col("__kind").asc)
      .withColumn("__p", spark_partition_id())
    val wRun = Window.partitionBy("__p")
      .orderBy(col("__b").desc_nulls_last, col("__kind").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // offsets: cumulative population count of all earlier (greater-value)
    // range partitions — #partitions rows, so the global window and the
    // broadcast are both trivially small. Derived from the same `u` subtree
    // so the range exchange is reused (identical boundaries by construction).
    val wOff = Window.orderBy(col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = u.groupBy("__p").agg(sum("__w").as("__tot"))
      .withColumn("__off", coalesce(sum("__tot").over(wOff), lit(0L)))
      .select("__p", "__off")
    u.withColumn("__run", sum("__w").over(wRun))
      .filter(col("__kind") === 0)
      .join(broadcast(offsets), "__p")
      .select(probes.columns.map(c => col(s"__row.$c").as(c)) :+
              when(col(s"__row.$probeCol").isNull, lit(0L))
                .otherwise(col("__run") + col("__off")).as(outCol): _*)
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
