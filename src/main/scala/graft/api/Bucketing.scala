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

  /** Execute `df` without materializing it on the driver: every partition
    * is computed (so AQE finalizes the plan and scan metrics populate) but
    * rows stay on the executors. Runs THE frame's own executedPlan —
    * `foreachPartition`/`write` would plan a fresh QueryExecution whose
    * metrics never reach `df.queryExecution`, and `collect()` would pull
    * the whole result into driver memory just to throw it away. */
  private def forceExecute(df: DataFrame): Unit = {
    val rows = df.queryExecution.executedPlan.execute()
    rows.sparkContext.runJob(rows, (it: Iterator[_]) => { while (it.hasNext) it.next(); () })
  }

  /** True if the executed plan of `df` contains any shuffle Exchange. */
  def hasShuffle(df: DataFrame): Boolean = {
    forceExecute(df) // force execution so AQE finalizes the plan
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

  /** Z-order (Morton) key over two non-negative integral columns: bits of
    * `a` and `b` interleaved, low bit of `b` lowest. Sorting by this key
    * clusters rows so each output file covers a small RECTANGLE of the
    * (a, b) domain — per-file min/max stats then skip files for range
    * predicates on EITHER column, where a linear sort only ever skips on
    * its leading column. [public: Morton order; the same layout trick
    * Delta/Iceberg OPTIMIZE ZORDER applies.] Pure bitwise Column
    * expression — codegen'd, no UDF. Callers pre-scale values into
    * [0, 2^bits) (rank or quantile-bucket first for skewed domains). */
  def zOrderKey(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
                bits: Int = 16): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(
          shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_.bitwiseOR(_))
  }

  /** Write `df` Z-ordered on (`colA`, `colB`) into `files` parquet files:
    * range-partition + sort by the interleaved key, so file boundaries cut
    * the Z-curve into contiguous runs (≈ rectangles). Both columns are
    * min/max-scaled into the shared [0, 2^bits) range first — WITHOUT
    * this, a column with a narrower domain contributes nothing to the
    * high interleaved bits and the layout silently degenerates to a
    * linear sort on the wider column (measured: 0 of 16 files skippable
    * on the narrow column). Linear scaling is right for uniform-ish
    * domains; rank/quantile-bucket heavily skewed columns upstream. The
    * pruning payoff is proven in BucketingSpec by reading back per-file
    * min/max of BOTH columns and counting the files a range predicate
    * could skip. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    files: Int, bits: Int = 16): Unit = {
    import org.apache.spark.sql.functions.{col, lit, max, min}
    val r = df.agg(min(col(colA)).cast("double"), max(col(colA)).cast("double"),
                   min(col(colB)).cast("double"), max(col(colB)).cast("double"))
      .collect().head
    val top = (1L << bits) - 1
    def scaled(c: org.apache.spark.sql.Column, lo: Double, hi: Double) =
      if (hi <= lo) lit(0L)
      else ((c.cast("double") - lit(lo)) * lit(top) / lit(hi - lo)).cast("long")
    df.withColumn("__z", zOrderKey(scaled(col(colA), r.getDouble(0), r.getDouble(1)),
                                   scaled(col(colB), r.getDouble(2), r.getDouble(3)),
                                   bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** [[writeZOrdered]] with EQUAL-FREQUENCY (rank/quantile) pre-scaling —
    * the fix for skewed domains. Min/max scaling maps VALUES linearly into
    * [0, 2^bits); when the domain is skewed (most rows tiny, rare huge
    * outliers — zipfy ids, revenue, follower counts) the dense mass
    * collapses into a handful of low z-cells and the layout silently
    * degenerates to a linear sort on the other column. Scaling by RANK
    * instead assigns each row its approximate quantile bucket, so every
    * z-cell holds ≈ the same row count no matter how the values are
    * distributed, and file min/max stats stay tight on BOTH columns
    * (bucketing is monotone in the value, so clustering by bucket clusters
    * by value).
    *
    * Scale posture: boundaries come from ONE distributed approxQuantile
    * sketch pass; the driver holds 2^bits−1 doubles per column (bounded,
    * ≤ 32 KB at the default 12-bit ceiling) broadcast back as an array
    * literal. The per-row bucket lookup is a codegen'd HOF scan of that
    * array — O(2^bits) per row, which is why `bits` is capped lower than
    * [[writeZOrdered]]'s: file-level skipping only needs cell granularity
    * ≈ a few × the file count, not 2^16. No windows, no global sort. */
  def writeZOrderedRanked(df: DataFrame, path: String, colA: String, colB: String,
                          files: Int, bits: Int = 8): Unit = {
    import org.apache.spark.sql.functions.{col, filter, size, typedLit}
    require(bits >= 1 && bits <= 12, s"ranked z-order bits must be in [1,12], got $bits")
    val cells = 1 << bits
    val probs = (1 until cells).map(_.toDouble / cells).toArray
    // one sketch pass per column; relativeError keeps buckets ~equal-count
    def bounds(c: String): Array[Double] =
      df.stat.approxQuantile(c, probs, 0.25 / cells)
    def bucketOf(c: org.apache.spark.sql.Column, bs: Array[Double]) =
      size(filter(typedLit(bs.toSeq), b => b <= c.cast("double"))).cast("long")
    val (ba, bb) = (bounds(colA), bounds(colB))
    df.withColumn("__z", zOrderKey(bucketOf(col(colA), ba), bucketOf(col(colB), bb), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Number of files the scan of `df` actually read after partition-filter
    * pruning (the scan's own numFiles metric, populated at execution).
    * AQE wraps executed plans in AdaptiveSparkPlanExec — which is itself a
    * leaf of the outer plan — so scans are collected from the finalized
    * inner plan, not the wrapper. */
  def filesRead(df: DataFrame): Long = {
    forceExecute(df)
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
