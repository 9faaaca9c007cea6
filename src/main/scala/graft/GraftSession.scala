package graft

import org.apache.spark.sql.SparkSession

/** The library's SparkSession entry point: one place that encodes the
  * 100 TB deployment posture (SURVEY §4), so every embedding application —
  * and the Verify/Bench harnesses — runs with the same discipline.
  *
  * Rationale per conf (all public Spark 4 semantics):
  *  - AQE on, with coalescing + skew-join splitting: runtime re-planning is
  *    the main defense when fixture-tuned plans meet real data skew. The
  *    static `shuffle.partitions` is only the *upper bound* AQE coalesces
  *    down from — set it to ~3× total cores on a cluster (advisory partition
  *    size then governs), 1× locally.
  *  - `autoBroadcastJoinThreshold` stays at the 10 MB default but the engine
  *    never relies on it alone for correctness of scale: dimension tables
  *    get explicit `broadcast()` hints at call sites (c02, j04, k16…), and
  *    at 100 TB a mis-estimated broadcast is an OOM — prefer explicit hints
  *    over raising the threshold.
  *  - parquet aggregate pushdown: set for forward-compatibility, but NOTE
  *    it is inert on the default V1 parquet path (verified by plan
  *    inspection: no `PushedAggregation` even for COUNT(*)); kept because
  *    it is harmless and applies if a deployment opts into the V2 reader.
  *  - UTC session timezone: the engine contract (SURVEY §2 rule 3); a
  *    cluster whose default TZ differs would silently shift every
  *    date_trunc/window boundary.
  *  - GraftExtensions registers the native expressions (graft_charge,
  *    graft_dot, graft_unit) so SQL-string users get them too.
  *
  * NOT set here deliberately: executor memory/cores (deploy-time), shuffle
  * service/exchange reuse (cluster-manager-specific), and
  * `files.maxPartitionBytes` (default 128 MB is the right split granularity
  * for the 100 TB parquet scan — ~800k input splits keeps task launch
  * overhead ≪ scan time at 1000 executors).
  */
object GraftSession {

  /** Build (or reuse) a session with the graft posture applied. */
  def builder(appName: String = "graft",
              master: Option[String] = None,
              shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.parquet.aggregatePushDown", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.plans.GraftExtensions)
    val b2 = master.fold(b)(b.master)
    shufflePartitions.fold(b2)(n => b2.config("spark.sql.shuffle.partitions", n.toString))
  }

  /** Local session sized like the harness (local[n], n shuffle partitions). */
  def local(cores: Int): SparkSession =
    builder(master = Some(s"local[$cores]"), shufflePartitions = Some(cores))
      .getOrCreate()
}
