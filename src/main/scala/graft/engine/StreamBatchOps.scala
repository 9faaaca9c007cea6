package graft.engine

import org.apache.spark.sql.functions._
import graft.engine.Determinism._

/** SURVEY §2.1 block J — streaming windows, batch-equivalent.
  *
  * Spark's `window`/`session_window` functions run identically in batch and
  * Structured Streaming, so the exact per-window semantics are oracle-checked
  * here; the unbounded execution (watermarks, state stores, triggers) is
  * Tier 2 — `graft.streaming` suites pin those against MemoryStream.
  */
object StreamBatchOps {

  /** j01 — 1-hour tumbling counts+sums. Spark window starts are epoch-aligned,
    * exactly DuckDB's time_bucket. */
  val j01: Q = Q(
    "j01_tumbling",
    s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
       |  COUNT(*) AS n, ${dsumSql("value")} AS sum_value
       |FROM events GROUP BY 1
       |ORDER BY w_start ASC NULLS LAST""".stripMargin,
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("w_start"), col("n"), col("sum_value"))
        .orderBy(asc_nulls_last("w_start")))

  /** j02 — 1-hour windows sliding every 15 min: each event lands in exactly 4
    * windows; only non-empty windows are emitted (Spark semantics). Oracle
    * expands each event to its 4 enclosing window starts. */
  val j02: Q = Q(
    "j02_sliding",
    s"""SELECT w_start, COUNT(*) AS n, ${dsumSql("value")} AS sum_value
       |FROM (SELECT time_bucket(INTERVAL '15 minutes', ts)
       |             - (s.g * INTERVAL '15 minutes') AS w_start, value
       |      FROM events, generate_series(0, 3) AS s(g))
       |GROUP BY 1
       |ORDER BY w_start ASC NULLS LAST""".stripMargin,
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("w_start"), col("n"), col("sum_value"))
        .orderBy(asc_nulls_last("w_start")))

  /** j03 — 30-min-gap sessionization per user: bounds, length, event count.
    * Spark session_window: a session closes when the next event's ts ≥
    * last_ts + gap; its end is last_ts + gap. Oracle reproduces exactly that
    * with a lag-flag + running-sum session id. */
  val j03: Q = Q(
    "j03_session",
    """WITH flagged AS (
      |  SELECT user_id, ts,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |           OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      |sess AS (
      |  SELECT user_id, ts,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC
      |                     ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT user_id, MIN(ts) AS s_start,
      |  MAX(ts) + INTERVAL '30 minutes' AS s_end,
      |  COUNT(*) AS n_events
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id ASC NULLS LAST, s_start ASC NULLS LAST""".stripMargin,
    (s, dir) =>
      graft.api.Windows.sessionize(Tables.events(s, dir), "ts", "user_id", "30 minutes")
        .orderBy(asc_nulls_last("user_id"), asc_nulls_last("s_start")))

  def ops: Vector[Q] = Vector(j01, j02, j03)
}
