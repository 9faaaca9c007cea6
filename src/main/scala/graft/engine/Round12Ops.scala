package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 declared queries — the first consumers of the
  * [[graft.operators.SequenceMatch]] pattern compiler beyond the six
  * re-expressed fixtures:
  *
  *  - `j13_sequence_match_cooldown` — the `(?t>N)` lower-bound time
  *    constraint (cooldown) form, compiled to the earliest-preceding
  *    running-min closed form.
  *
  * Every query follows the SURVEY §2 determinism rules (explicit NULLS,
  * total ORDER BY, integer-exact arithmetic end-to-end).
  */
object Round12Ops {

  // ---------------------------------------------------------------- j13

  /** j13 — cooldown sequence match (ClickHouse
    * `sequenceMatch('(?1)(?t>3600)(?2)')(ts, type='signup',
    * type='purchase')` analog [public: CH parametric-aggregate docs]).
    * j12 covers the upper-bound `(?t<=N)` form; this declares the
    * LOWER-bound `(?t>N)` form the compiler also emits: does a purchase
    * occur MORE than 1 hour after some preceding signup (a cooldown /
    * incubation constraint — "did the user come back later"), intervening
    * events allowed. The matching pair maximizing the gap uses the
    * EARLIEST preceding signup, so one running-MIN window decides
    * existence (the mirror of j12's running max): per-user work is a
    * running scalar, no pair join, no state machine — the same shape at
    * 100 TB. `n_cooldown` counts the matching purchases. All comparisons
    * on exact µs integers (INTERVAL arithmetic on both sides is exact µs
    * addition); ties break on event_id in both engines. The Spark side is
    * COMPILED from the grammar string by
    * [[graft.operators.SequenceMatch.withMatch]]; the oracle is the
    * independent hand-written window form. */
  val j13: Q = Q(
    "j13_sequence_match_cooldown",
    """WITH w AS (
      |  SELECT user_id, event_type, ts,
      |    MIN(CASE WHEN event_type = 'signup' THEN ts END) OVER
      |      (PARTITION BY user_id ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_signup
      |  FROM events),
      |m AS (
      |  SELECT user_id,
      |    MAX(CASE WHEN event_type = 'purchase' AND first_signup IS NOT NULL
      |              AND ts > first_signup + INTERVAL 1 HOUR THEN 1 ELSE 0 END) AS m_cooldown,
      |    SUM(CASE WHEN event_type = 'purchase' AND first_signup IS NOT NULL
      |              AND ts > first_signup + INTERVAL 1 HOUR THEN 1 ELSE 0 END) AS n_cooldown,
      |    COUNT(*) AS n_events
      |  FROM w GROUP BY user_id)
      |SELECT user_id, CAST(m_cooldown AS INT) AS m_cooldown,
      |  CAST(n_cooldown AS BIGINT) AS n_cooldown,
      |  CAST(n_events AS BIGINT) AS n_events
      |FROM m
      |ORDER BY user_id ASC NULLS LAST""".stripMargin,
    (s, dir) =>
      graft.operators.SequenceMatch.withMatch(
          Tables.events(s, dir), "user_id", unix_micros(col("ts")),
          col("event_id"),
          Seq(col("event_type") === "signup", col("event_type") === "purchase"),
          "(?1)(?t>3600)(?2)", "__hit")
        .groupBy("user_id")
        .agg(max(col("__hit")).cast("int").as("m_cooldown"),
             sum(col("__hit")).cast("long").as("n_cooldown"),
             count(lit(1)).cast("long").as("n_events"))
        .orderBy(asc_nulls_last("user_id")))

  def ops: Vector[Q] = Vector(j13)
}
