package graft.engine

import org.apache.spark.sql.functions._
import graft.engine.Determinism._

/** SURVEY §2.1 block D — aggregation. Declarative `groupBy().agg()` only:
  * Catalyst plans two-phase HashAggregate (partial map-side combine + final),
  * which is the 100 TB-correct shape — only group cardinality crosses the
  * shuffle, never raw rows.
  */
object AggOps {

  /** d02 — flagship TPC-H Q1 shape (SURVEY §7 M1). Sums/avgs routed through
    * DECIMAL for cross-engine bit-stability (see Determinism.dsum). */
  val d02: Q = Q(
    "d02_agg_group_q1",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsumSql("l_quantity")} AS sum_qty,
       |  ${dsumSql("l_extendedprice")} AS sum_base_price,
       |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
       |  ${dsumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
       |  ${davgSql("l_quantity")} AS avg_qty,
       |  ${davgSql("l_extendedprice")} AS avg_price,
       |  ${davgSql("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST""".stripMargin,
    (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(asc_nulls_last("l_returnflag"), asc_nulls_last("l_linestatus")))

  def ops: Vector[Q] = Vector(d02)
}
