package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every SURVEY §2.1 Tier-1 operator is one [[graft.engine.Q]] registered by
  * its block object; this object just flattens the registry into the maps the
  * driver consumes. A query is added to a block's `ops` ONLY after it
  * hash-matches the DuckDB oracle locally (scripts/selfcheck.py).
  */
object SparkEntry {

  /** The full declared-query registry, in SURVEY §2.1 block order. */
  def all: Vector[Q] =
    ScanOps.ops ++ FilterOps.ops ++ JoinOps.ops ++ AggOps.ops ++
      WindowOps.ops ++ SortSetOps.ops ++ FuncOps.ops ++ CdcOps.ops ++
      StreamBatchOps.ops ++ LlmOps.ops ++ CustomOps.ops ++ ExtOps.ops ++
      PipelineOps.ops ++ Round8Ops.ops ++ Round8bOps.ops ++ Round8cOps.ops ++
      Round8dOps.ops ++ Round8eOps.ops ++ Round8fOps.ops ++ Round8gOps.ops ++
      Round9Ops.ops ++ Round10Ops.ops ++ Round11Ops.ops ++ Round12Ops.ops ++
      Round13Ops.ops ++ Round14Ops.ops ++ Round15Ops.ops ++ Round16Ops.ops ++
      Round17Ops.ops ++ Round18Ops.ops ++ Round19Ops.ops ++ Round20Ops.ops ++
      Round20bOps.ops ++ Round20cOps.ops ++ Round21Ops.ops ++ Round22Ops.ops ++
      Round23Ops.ops

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AggOps.d02.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] =
    all.map(q => q.name -> q.sql).toMap
}
