package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable DECORRELATION patterns — the library face of the r20 TPC-H
  * shape tier (c21/c24/c26/d63), extracted because every analytic
  * workload re-invents them: a correlated subquery over the same frame
  * is always re-expressible as an aggregate frame joined (or windowed)
  * back, which is the shape that scales — the subquery form re-executes
  * per row, the decorrelated form is one aggregate plus one join that
  * Catalyst can broadcast or AQE-split.
  *
  * Each helper aliases its internal frames, so same-name key columns
  * (the natural call) never trip Spark's ambiguous-self-join analysis
  * (the BloomPrune.semiJoinPruned lesson, applied from the start). */
object Decorrelate {

  /** Q17's core: attach a per-group aggregate as a column (the
    * correlated `(SELECT agg(..) WHERE key = outer.key)`), e.g.
    * `withGroupAgg(li, Seq("l_partkey"), (lit(0.2) * avg("l_quantity")).as("t"))`
    * then filter `l_quantity < t`. The aggregate frame is group-sized;
    * `broadcastBack = true` (default) broadcasts it into the probe —
    * right whenever the group domain is dimension-like; set false for
    * data-sized group domains and let AQE pick the join. */
  def withGroupAgg(df: DataFrame, keys: Seq[String], agg: Column,
                   broadcastBack: Boolean = true): DataFrame = {
    requireReservedFree(df, keys)
    val g0 = df.groupBy(keys.map(col): _*).agg(agg)
    // the agg alias must not shadow a probe column — the join below would
    // otherwise carry two same-name columns and downstream col() resolution
    // would be ambiguous or silently pick the wrong one (r16 ADVICE item)
    g0.columns.filterNot(keys.contains).foreach { a =>
      require(!df.columns.contains(a),
        s"Decorrelate.withGroupAgg: agg alias '$a' collides with an existing column")
    }
    val renamed = keys.map(k => k -> s"__dc_$k")
    val g = renamed.foldLeft(g0) { case (d, (k, a)) => d.withColumnRenamed(k, a) }
    val side = if (broadcastBack) broadcast(g) else g
    val cond = renamed.map { case (k, a) => col(k) === col(a) }.reduce(_ && _)
    df.join(side, cond).drop(renamed.map(_._2): _*)
  }

  /** Q2's core: the rows achieving the per-group MINIMUM of `valueCol`,
    * ALL ties kept (the correlated `val = (SELECT min(val) WHERE key =
    * outer.key)`). Equality on the value is exact whenever the value is
    * selected, not summed (MIN/MAX are selections) or rides an exact
    * route. `broadcastBack` as in [[withGroupAgg]]: default true for
    * dimension-like group domains, false to let AQE pick the join when
    * the group domain is data-sized. */
  def minByGroupWithTies(df: DataFrame, keys: Seq[String], valueCol: String,
                         broadcastBack: Boolean = true): DataFrame =
    extremeByGroupWithTies(df, keys, valueCol, isMin = true, broadcastBack)

  /** [[minByGroupWithTies]]'s max dual. */
  def maxByGroupWithTies(df: DataFrame, keys: Seq[String], valueCol: String,
                         broadcastBack: Boolean = true): DataFrame =
    extremeByGroupWithTies(df, keys, valueCol, isMin = false, broadcastBack)

  /** The __dc_* working names are reserved: a caller frame that already
    * carries one would make the decorrelating self-join ambiguous (or
    * silently join on the wrong column), so fail loudly up front instead
    * (r16 ADVICE item). */
  private def requireReservedFree(df: DataFrame, keys: Seq[String],
                                  extra: Seq[String] = Nil): Unit = {
    val reserved = keys.map(k => s"__dc_$k") ++ extra
    val clash = reserved.filter(df.columns.contains)
    require(clash.isEmpty,
      s"Decorrelate: reserved working column(s) ${clash.mkString(", ")} " +
        "already exist on the input frame")
  }

  private def extremeByGroupWithTies(df: DataFrame, keys: Seq[String],
                                     valueCol: String, isMin: Boolean,
                                     broadcastBack: Boolean): DataFrame = {
    requireReservedFree(df, keys, extra = Seq("__dc_m"))
    val aggCol = if (isMin) min(col(valueCol)) else max(col(valueCol))
    val renamed = keys.map(k => k -> s"__dc_$k")
    val g0 = df.groupBy(keys.map(col): _*).agg(aggCol.as("__dc_m"))
    val g = renamed.foldLeft(g0) { case (d, (k, a)) => d.withColumnRenamed(k, a) }
    val side = if (broadcastBack) broadcast(g) else g
    val cond = renamed.map { case (k, a) => col(k) === col(a) }
      .reduce(_ && _) && col(valueCol) === col("__dc_m")
    df.join(side, cond).drop("__dc_m").drop(renamed.map(_._2): _*)
  }

  /** Q15's core: the group rows of an ALREADY-AGGREGATED frame that
    * achieve the global extreme of `aggCol`, ties kept — via an
    * empty-partition window over the aggregated (group-sized) frame,
    * NOT a scalar-subquery join back: the window form guarantees ONE
    * computation of the aggregate (the c26 lesson — AQE float-key
    * canonicalization can break ReusedExchange and silently double the
    * fact scan). Only call on aggregated/dimension-sized frames: the
    * empty partition moves ALL rows to one task. */
  def globalExtremeWithTies(aggregated: DataFrame, aggCol: String,
                            isMax: Boolean = true): DataFrame = {
    requireReservedFree(aggregated, Nil, extra = Seq("__dc_ext"))
    val ext = if (isMax) max(col(aggCol)) else min(col(aggCol))
    aggregated
      .withColumn("__dc_ext", ext.over(Window.partitionBy()))
      .where(col(aggCol) === col("__dc_ext"))
      .drop("__dc_ext")
  }

  /** Q13's core: the distribution of per-dimension-row match counts
    * INCLUDING THE ZERO BUCKET — `dim LEFT JOIN fact` then
    * count-of-counts, executed the scale-right way: the fact
    * pre-aggregates to per-key counts FIRST (provably identical —
    * COUNT of matches = the pre-count; absent → NULL → 0), so the
    * outer join is dim × dim-sized and the fact never crosses it.
    * Returns (c_count, n_keys). */
  def countOfCounts(dim: DataFrame, dimKey: String,
                    fact: DataFrame, factKey: String): DataFrame = {
    val pre = fact.groupBy(col(factKey).as("__dc_k"))
      .agg(count(lit(1)).as("__dc_c"))
    dim.join(pre, col(dimKey) === col("__dc_k"), "left")
      .select(coalesce(col("__dc_c"), lit(0L)).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("n_keys"))
  }
}
