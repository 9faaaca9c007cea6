package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-pass distributed midranks — the scale path for rank statistics
  * (Spearman d39, Mann-Whitney d35, ROC AUC d42) when the value domain is
  * unbounded so neither the fixed value grid (d35/d28) nor a per-group
  * window sort (d39's fixture shape) applies.
  *
  * The declared queries' doubled-midrank identity is
  * `dr2(v) = 2·|{x < v}| + cnt(v) + 1` (exact int64, tie-correct). This
  * operator computes it with NO data-sized single-partition sort:
  *
  *  1. hash agg to distinct `(group, value) → cnt` (map-combined;
  *     distinct-sized from here on),
  *  2. range-repartition the distinct keys by `(group, value)` — each
  *     partition holds a contiguous slice, equal keys never split
  *     (the `Windows.rankAgainst` discipline),
  *  3. partition-local running sums give the strictly-less count WITHIN
  *     the slice; a per-`(partition, group)` total frame — at most
  *     `#partitions + #groups` rows — prefix-sums into slice OFFSETS and
  *     broadcasts back.
  *
  * Pass 2's window partitions by `(slice, group)`, so the largest sort is
  * one slice of the distinct keys (≈ |distinct| / #partitions), not a
  * group's whole data. Output is a `(group, value) → (cnt, dr2)` mapping
  * the caller joins back onto rows (a co-partitioned equi-join on the
  * same keys). Pinned bit-identical to the window formulation — and to
  * the declared d39 Spearman ρ end-to-end — in Round10Spec.
  *
  * NULL values carry no rank and are dropped (the d39 contract: rank
  * statistics are over present values; callers keep NULL rows out of the
  * centered sums on their side).
  */
object DistributedRank {

  /** Doubled midranks per distinct `(groupCols, valueCol)` key.
    *
    * @return `groupCols ++ (valueCol, cnt, dr2)` — `cnt` the tie count,
    *         `dr2` the doubled midrank `2·|{x < v}| + cnt + 1`.
    */
  def midranks2(df: DataFrame, groupCols: Seq[String],
                valueCol: String): DataFrame =
    midranks2Weighted(df, groupCols, valueCol, lit(1L))

  /** [[midranks2]] over PRE-AGGREGATED rows: each input row represents
    * `weight` original rows with the same value. Ranks come out identical
    * to running [[midranks2]] on the un-aggregated data (tie count =
    * Σ weight per distinct key — same int64 arithmetic), but every stage
    * downstream of the first hash agg is sized by the DISTINCT key domain
    * instead of the data. [[spearman]] rides this (r13-brief item 2). */
  def midranks2Weighted(df: DataFrame, groupCols: Seq[String],
                        valueCol: String, weight: Column): DataFrame = {
    val gc: Seq[Column] = groupCols.map(col)
    val g = df.filter(col(valueCol).isNotNull)
      .groupBy((gc :+ col(valueCol)): _*)
      .agg(sum(weight).as("__cnt"))
    val ranged = g
      .repartitionByRange((gc :+ col(valueCol).asc): _*)
      .withColumn("__p", spark_partition_id())
    // pass 2a: strictly-less count within this slice of the group
    val wRun = Window.partitionBy(("__p" +: groupCols).map(col): _*)
      .orderBy(col(valueCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // pass 2b: slice offsets — rows counted in all earlier slices of the
    // same group. ≤ #partitions + #groups rows total: broadcast-sized.
    val wOff = Window.partitionBy(gc: _*).orderBy(col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(("__p" +: groupCols).map(col): _*)
      .agg(sum("__cnt").as("__tot"))
      .withColumn("__off", coalesce(sum("__tot").over(wOff), lit(0L)))
      .select(("__p" +: groupCols).map(col) :+ col("__off"): _*)
    ranged
      .withColumn("__run", coalesce(sum("__cnt").over(wRun), lit(0L)))
      .join(broadcast(offsets), "__p" +: groupCols)
      .select(gc ++ Seq(
        col(valueCol),
        col("__cnt").as("cnt"),
        (lit(2L) * (col("__off") + col("__run")) + col("__cnt") + lit(1L))
          .as("dr2")): _*)
  }

  /** Spearman ρ per group via the 2-pass midranks — the d39 statistic
    * computed WITHOUT a per-group data-sized window (the round-9 "at real
    * scale" claim, made executable). Same integers, same one-division
    * closed form; pinned equal to the declared d39 in Round10Spec.
    *
    * @param xCol,yCol non-null numeric columns (long-valued).
    */
  def spearman(df: DataFrame, groupCols: Seq[String],
               xCol: String, yCol: String): DataFrame = {
    val gc: Seq[Column] = groupCols.map(col)
    // Pre-aggregate duplicate (group, x, y) keys to a weight FIRST
    // (r13-brief item 2): the rank join-backs and the centered-sum agg
    // then run over the distinct-pair domain, not the raw rows — on
    // lineitem (~50 distinct quantities) that is orders of magnitude
    // smaller, and at 100 TB it bounds the join payload by the domain
    // size. Same integers out: each distinct key contributes
    // weight·(ux·uy) exactly where the row form summed ux·uy weight
    // times (int64 end-to-end; Round10Spec pins bit-equality vs the
    // window formulation).
    val pairs = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy((gc :+ col(xCol) :+ col(yCol)): _*)
      .agg(count(lit(1)).as("__w"))
    val rx = midranks2Weighted(pairs, groupCols, xCol, col("__w"))
      .withColumnRenamed("cnt", "__cx").withColumnRenamed("dr2", "__dx")
    val ry = midranks2Weighted(pairs, groupCols, yCol, col("__w"))
      .withColumnRenamed("cnt", "__cy").withColumnRenamed("dr2", "__dy")
    // group sizes from the mapping itself (Σ tie counts = Σ weights = row
    // count) — a groups-sized frame, broadcast back; no data-sized window
    // anywhere in this path.
    val n = rx.groupBy(gc: _*).agg(sum("__cx").as("__n"))
    pairs.join(rx, groupCols :+ xCol)
      .join(ry, groupCols :+ yCol)
      .join(broadcast(n), groupCols)
      .select(gc ++ Seq(col("__w"),
                        (col("__dx") - (col("__n") + 1)).as("__ux"),
                        (col("__dy") - (col("__n") + 1)).as("__uy")): _*)
      .groupBy(gc: _*)
      .agg(sum(col("__w")).cast("long").as("n"),
           sum(col("__w") * col("__ux") * col("__uy")).cast("long").as("sxy"),
           sum(col("__w") * col("__ux") * col("__ux")).cast("long").as("sxx"),
           sum(col("__w") * col("__uy") * col("__uy")).cast("long").as("syy"))
      .select(gc ++ Seq(col("n").as("n_rows"),
        expr("CAST(sxy AS DOUBLE) / (SQRT(CAST(sxx AS DOUBLE)) * SQRT(CAST(syy AS DOUBLE)))")
          .as("spearman_rho")): _*)
  }
}
