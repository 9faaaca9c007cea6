package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.1 round-11 additions — the remaining ClickHouse-surface
  * families the r10 sweep left uncovered:
  *
  *  - `j12_sequence_match_time` — `sequenceMatch` with a `(?t<=N)` TIME
  *    constraint (j07 covers the loose/adjacent forms; the time-conditioned
  *    form is the one CH's docs lead with).
  *  - `h35_multi_search` — the string-search function family
  *    (`countSubstrings`, `multiSearchAny`, `position`, `hasToken`).
  *  - `e21_time_decayed_sum` — `exponentialTimeDecayedSum` analog on an
  *    exact power-of-two decay grid (zero float accumulation).
  *
  * Every query follows the SURVEY §2 determinism rules (explicit NULLS,
  * total ORDER BY, integer-exact arithmetic end-to-end).
  */
object Round11Ops {

  // ---------------------------------------------------------------- j12

  /** j12 — time-constrained sequence match (ClickHouse
    * `sequenceMatch('(?1)(?t<=3600)(?2)')(ts, type='signup',
    * type='purchase')` analog [public: CH parametric-aggregate docs]).
    * j07 answers the loose `(?1).*(?2)` and adjacent `(?1)(?2)` forms;
    * this adds the `(?t<=N)` form: does a purchase occur within 1 hour
    * AFTER some signup, intervening events allowed. A matching pair
    * exists iff some purchase's NEAREST preceding signup is within the
    * bound (the nearest signup minimizes the gap), so one running-max
    * window over (ts, event_id) order decides it — no pair join, no
    * state machine; per-user work is a running scalar, the same shape
    * at 100 TB. `n_within` additionally counts the matching purchases
    * (the `sequenceCount`-flavored reading of the same constraint).
    * All comparisons on exact µs integers; ties impossible (user×ts is
    * unique in the fixture; event_id breaks any in both engines). */
  val j12: Q = Q(
    "j12_sequence_match_time",
    """WITH w AS (
      |  SELECT user_id, event_type, ts,
      |    MAX(CASE WHEN event_type = 'signup' THEN ts END) OVER
      |      (PARTITION BY user_id ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_signup
      |  FROM events),
      |m AS (
      |  SELECT user_id,
      |    MAX(CASE WHEN event_type = 'purchase' AND prev_signup IS NOT NULL
      |              AND ts <= prev_signup + INTERVAL 1 HOUR THEN 1 ELSE 0 END) AS m_within,
      |    SUM(CASE WHEN event_type = 'purchase' AND prev_signup IS NOT NULL
      |              AND ts <= prev_signup + INTERVAL 1 HOUR THEN 1 ELSE 0 END) AS n_within,
      |    COUNT(*) AS n_events
      |  FROM w GROUP BY user_id)
      |SELECT user_id, CAST(m_within AS INT) AS m_within,
      |  CAST(n_within AS BIGINT) AS n_within,
      |  CAST(n_events AS BIGINT) AS n_events
      |FROM m
      |ORDER BY user_id ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      val wp = Window.partitionBy("user_id")
        .orderBy(asc_nulls_last("ts"), asc_nulls_last("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val hit = col("event_type") === "purchase" &&
        col("prev_signup").isNotNull &&
        col("ts") <= col("prev_signup") + expr("INTERVAL 1 HOUR")
      Tables.events(s, dir)
        .withColumn("prev_signup",
          max(when(col("event_type") === "signup", col("ts"))).over(wp))
        .groupBy("user_id")
        .agg(max(when(hit, 1).otherwise(0)).cast("int").as("m_within"),
             sum(when(hit, 1).otherwise(0)).cast("long").as("n_within"),
             count(lit(1)).cast("long").as("n_events"))
        .orderBy(asc_nulls_last("user_id"))
    })

  // ---------------------------------------------------------------- h35

  /** h35 — string-search function family (ClickHouse `countSubstrings`,
    * `multiSearchAny`, `position`, `hasToken` analogs [public: CH
    * string-search-function docs]). All four reduce to codegen'd string
    * builtins — map-only, no shuffle, linear scan:
    *  - `countSubstrings`: non-intersecting occurrence count via the
    *    length-difference identity (CH counts non-overlapping — the
    *    REPLACE trick matches that semantics exactly);
    *  - `multiSearchAny`: OR of `contains` over three needles;
    *  - `position`: 1-based first occurrence, 0 when absent (instr and
    *    strpos agree on both conventions — proven by h17);
    *  - `hasToken`: whole-token membership via space-padded LIKE (the
    *    documents fixture is clean space-separated tokens). */
  val h35: Q = Q(
    "h35_multi_search",
    """SELECT doc_id,
      |  CAST((LENGTH(text) - LENGTH(REPLACE(text, 'scan', ''))) // 4 AS INT) AS cnt_scan,
      |  CAST((LENGTH(text) - LENGTH(REPLACE(text, 'a', ''))) AS INT) AS cnt_a,
      |  CAST(CASE WHEN CONTAINS(text, 'merge') OR CONTAINS(text, 'spark')
      |             OR CONTAINS(text, 'zzz') THEN 1 ELSE 0 END AS INT) AS multi_any,
      |  CAST(STRPOS(text, 'value') AS INT) AS pos_value,
      |  CAST(CASE WHEN ' ' || text || ' ' LIKE '% join %' THEN 1 ELSE 0 END AS INT) AS has_tok_join
      |FROM documents
      |ORDER BY doc_id ASC NULLS LAST""".stripMargin,
    (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
                expr("(length(text) - length(replace(text, 'scan', ''))) div 4")
                  .cast("int").as("cnt_scan"),
                (length(col("text")) - length(expr("replace(text, 'a', '')")))
                  .cast("int").as("cnt_a"),
                (col("text").contains("merge") || col("text").contains("spark") ||
                  col("text").contains("zzz")).cast("int").as("multi_any"),
                instr(col("text"), "value").cast("int").as("pos_value"),
                concat(lit(" "), col("text"), lit(" ")).like("% join %")
                  .cast("int").as("has_tok_join"))
        .orderBy(asc_nulls_last("doc_id")))

  // ---------------------------------------------------------------- e21

  /** e21 — exponential time-decayed sum (ClickHouse
    * `exponentialTimeDecayedSum(x)(value, time)` analog [public: CH
    * window-function docs]) on an EXACT decay grid: half-life = 1 day,
    * ages quantized to whole days — decay per day is exactly 2⁻¹, so each
    * event's contribution at the reference instant T (2024-01-31, just
    * past the fixture span) is `cents · 2^(30 − age_days)` in integer
    * units of 2⁻³⁰ cents: age_days ≤ 30 inside the span, cents ≤ 49 003
    * (FIXTURES events.value ≤ 490.02), so one unit term ≤ 5.3e13 and a
    * per-user sum of ~10³ events stays far below int64 — the whole
    * accumulation is EXACT integer arithmetic, immune to merge order
    * (the generic float decay-sum is order-sensitive; CH itself computes
    * it as floats). The float rendering divides ONCE at the end:
    * int64→double cast is correctly rounded in both engines (the d39
    * fact) and /2³⁰ and /100 are two shared IEEE ops — bit-identical.
    * Shape: one map-combined hash agg per user, mergeable state = one
    * long — the same additive state [[graft.streaming]] twins carry.
    * Scale bound documented: ≥ ~10⁵ age-0 max-value events per user
    * would overflow int64; route the sum through decimal(38,0) past that
    * (rule-2 dsum discipline). */
  val e21: Q = Q(
    "e21_time_decayed_sum",
    """WITH u AS (
      |  SELECT user_id,
      |    CAST(SUM(
      |      CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      * CAST(POWER(2, 30 - ((epoch_us(TIMESTAMP '2024-01-31 00:00:00') - epoch_us(ts))
      |                            // 86400000000)) AS BIGINT)) AS BIGINT) AS units,
      |    COUNT(*) AS n
      |  FROM events WHERE ts <= TIMESTAMP '2024-01-31 00:00:00' GROUP BY user_id)
      |SELECT user_id, units,
      |  CAST(units AS DOUBLE) / 1073741824.0 / 100.0 AS decayed_sum,
      |  CAST(n AS BIGINT) AS n_events
      |FROM u
      |ORDER BY user_id ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      val tRef = lit("2024-01-31 00:00:00").cast("timestamp")
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
      val age = expr("(unix_micros(TIMESTAMP '2024-01-31 00:00:00') - unix_micros(ts)) div 86400000000")
      val units = cents *
        pow(lit(2.0), (lit(30) - age).cast("double")).cast("long")
      Tables.events(s, dir)
        .filter(col("ts") <= tRef)
        .groupBy("user_id")
        .agg(sum(units).cast("long").as("units"),
             count(lit(1)).cast("long").as("n_events"))
        .select(col("user_id"), col("units"),
                (col("units").cast("double") / lit(1073741824.0) / lit(100.0))
                  .as("decayed_sum"),
                col("n_events"))
        .orderBy(asc_nulls_last("user_id"))
    })

  def ops: Vector[Q] = Vector(j12, h35, e21)
}
