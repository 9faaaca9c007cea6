package graft.engine

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 fourth extension block: timing quantiles (`quantileTiming`) —
  * the last long-tail ClickHouse aggregate family named in SURVEY §7's
  * candidate list.
  *
  * Scale notes (the 100 TB posture, SURVEY §4): the whole point of CH's
  * quantileTiming [public: CH quantileTiming docs / QuantileTiming.h
  * description of the grid] is that the state is a FIXED-SIZE histogram,
  * not the value multiset — values < 1024 ms kept at 1 ms resolution,
  * 1024–30000 ms on a 16 ms grid, everything above clamped to 30000 ms
  * (a web-latency-shaped precision contract). The Spark shape mirrors
  * that exactly: one hash-agg shuffle builds the per-(group, bucket)
  * histogram (≤ ~2838 buckets per group AT ANY INPUT SCALE), then the
  * cumulative window and the closing per-group agg run over
  * histogram-sized data. No sort of raw rows, no per-group value
  * collection, no driver state — 10^12 events cost one map-side-combined
  * shuffle of bounded-cardinality partials.
  *
  * Determinism (SURVEY §2): everything after the cents conversion is
  * int64 arithmetic. Nearest-rank (inclusive) quantile selection uses
  * the integer identity cum ≥ ceil(q·n/100) ⟺ 100·cum ≥ q·n, so no
  * float ranks exist on either engine.
  */
object Round8dOps {

  /** The CH timing grid over an int64 `cents` column: identity below
    * 1024, 16 ms buckets to 30 s, clamped at 30 s. Pure int64 CASE —
    * codegen'd, map-side. */
  val timingGrid: org.apache.spark.sql.Column =
    expr("""CASE WHEN cents >= 30000 THEN CAST(30000 AS BIGINT)
                 WHEN cents >= 1024 THEN (cents div 16) * 16
                 ELSE cents END""")

  /** Scalar twin of [[timingGrid]] for JVM-side state code (the streaming
    * parity operator); ExtOpsSpec pins the two agree on every boundary. */
  def gridMs(ms: Long): Long =
    if (ms >= 30000L) 30000L else if (ms >= 1024L) (ms / 16L) * 16L else ms

  /** Nearest-rank (inclusive) quantiles from a timing histogram: for each
    * q in `qs` (percent), the smallest bucket with 100·cum ≥ q·n — the
    * same all-integer identity the d28 SQL uses. */
  def histQuantiles(counts: Map[Long, Long], qs: Seq[Int]): Seq[Long] = {
    val n = counts.valuesIterator.sum
    val sorted = counts.toSeq.sortBy(_._1)
    qs.map { q =>
      var cum = 0L
      sorted.find { case (_, c) => cum += c; 100L * cum >= q.toLong * n }
        .map(_._1).getOrElse(sorted.last._1)
    }
  }

  /** d28 — timing quantiles (ClickHouse `quantileTiming`/`quantilesTiming`
    * analog [public: CH quantile-timing docs]): p50/p90/p99 of a
    * millisecond-valued duration per event_type, computed on CH's timing
    * grid (exact < 1024, 16 ms steps to 30 s, clamped at 30 s — all
    * three regions carry fixture data) from a bounded histogram, never
    * the raw multiset. */
  val d28: Q = Q(
    "d28_quantile_timing",
    """WITH src AS (
      |  SELECT event_type,
      |    CASE WHEN cents >= 30000 THEN 30000
      |         WHEN cents >= 1024 THEN (cents // 16) * 16
      |         ELSE cents END AS b
      |  FROM (SELECT event_type,
      |          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |        FROM events)),
      |hist AS (SELECT event_type, b, COUNT(*) AS c FROM src GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, b,
      |    SUM(c) OVER (PARTITION BY event_type ORDER BY b ASC
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(c) OVER (PARTITION BY event_type) AS n
      |  FROM hist)
      |SELECT event_type,
      |  CAST(MIN(CASE WHEN 100 * cum >= 50 * n THEN b END) AS BIGINT) AS p50_ms,
      |  CAST(MIN(CASE WHEN 100 * cum >= 90 * n THEN b END) AS BIGINT) AS p90_ms,
      |  CAST(MIN(CASE WHEN 100 * cum >= 99 * n THEN b END) AS BIGINT) AS p99_ms,
      |  CAST(MAX(n) AS BIGINT) AS n
      |FROM cum GROUP BY 1
      |ORDER BY event_type ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      val hist = Tables.events(s, dir)
        .select(col("event_type"),
                (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
        .select(col("event_type"), timingGrid.as("b"))
        .groupBy("event_type", "b")
        .agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy("event_type").orderBy(asc("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("event_type")
      def pq(q: Int, nm: String) =
        min(when(col("cum") * 100 >= col("n") * q, col("b"))).cast("long").as(nm)
      hist
        .withColumn("cum", sum(col("c")).over(wCum))
        .withColumn("n", sum(col("c")).over(wAll))
        .groupBy("event_type")
        .agg(pq(50, "p50_ms"), pq(90, "p90_ms"), pq(99, "p99_ms"),
             max(col("n")).cast("long").as("n"))
        .orderBy(asc_nulls_last("event_type"))
    })

  def ops: Vector[Q] = Vector(d28)
}
