package graft.api

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: the storage-layout lever for 100 TB joins.
  *
  * Writing both sides of a recurring equi-join bucketed (and sorted) by the
  * join key lets Spark plan a SortMergeJoin with NO Exchange on either side
  * — the shuffle is paid once at write time instead of on every query.
  * This is how a replication pipeline should lay out its biggest tables
  * (orders/lineitem by key, events by user) so downstream joins and
  * latest-per-key windows are shuffle-free.
  *
  * Bucket count discipline: pick it once per table family and keep it equal
  * across co-joined tables (matching bucket counts are required for the
  * shuffle elimination); size buckets so one bucket ≈ one task's worth of
  * data (100–500 MB) at the target scale.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table at `path`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. With matching bucket
    * counts both Exchanges vanish (verify with hasShuffle). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** True if the executed plan of `df` contains any shuffle Exchange. */
  def hasShuffle(df: DataFrame): Boolean = {
    df.collect() // force execution so AQE finalizes the plan
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
  }

  /** Write `df` hive-partitioned by `partCol` — the time-partitioning lever
    * for append-mostly fact tables (events by day/month): a filter on the
    * partition column prunes directories at planning time, so an
    * incremental read touches only the new partitions regardless of table
    * size. Pair with [[writeBucketed]]-style bucket columns for the
    * join-key dimension; partition for pruning, bucket for co-location. */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(path)

  /** Number of files the scan of `df` actually read after partition-filter
    * pruning (the scan's own numFiles metric, populated at execution).
    * AQE wraps executed plans in AdaptiveSparkPlanExec — which is itself a
    * leaf of the outer plan — so scans are collected from the finalized
    * inner plan, not the wrapper. */
  def filesRead(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics.get("numFiles").map(_.value).getOrElse(0L)
    }.sum
  }
}
