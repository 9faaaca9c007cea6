package graft.engine

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-15 declared queries — the r12 brief's item 4, the FINAL
  * ClickHouse-sibling sweep (after which SURVEY §2 declares the public
  * CH tail dry):
  *
  *  - `j21_sequence_next_node_first_match` — the one base×direction
  *    combination of `sequenceNextNode` not yet declared
  *    (forward/first_match): the event AFTER the first occurrence of a
  *    two-step chain, on j19's one-exchange window recipe.
  *  - `d61_bounding_ratio_agg` — CH `boundingRatio(x, y)` in its
  *    AGGREGATE shape (d27 declares the window form; this is the second
  *    mechanism, the d55/d60 discipline): both extremes read as
  *    struct-ordered MIN/MAX in ONE hash aggregate; integer-exact
  *    operands, one shared IEEE division, NULLIF on the degenerate
  *    dx = 0.
  *
  * Every query follows the SURVEY §2 determinism rules (explicit NULLS,
  * total ORDER BY, integer-exact arithmetic end-to-end).
  */
object Round15Ops {

  // ---------------------------------------------------------------- j21

  /** j21 — `sequenceNextNode('forward', 'first_match')` analog [public:
    * CH parametric-aggregate docs; j09 declares the head base, j19 the
    * backward tail/last_match bases — this closes the base×direction
    * grid]: per user, the event type immediately AFTER the FIRST
    * occurrence of the adjacent chain (click → view) — a genuinely new
    * shape vs j09's single-event base: the match is a two-step pattern,
    * found ANYWHERE in the stream, and the answer is the node after the
    * whole chain. Spark side: ONE ordered lag/lead window + a
    * whole-partition conditional MIN over the same user_id partitioning
    * (j19's struct-key recipe — the chain row is found by key equality
    * against the partition-min chain key), so everything rides one
    * exchange, no join. The ORACLE finds the first chain row with j09's
    * partition-by-predicate ROW_NUMBER instead — two independent
    * formulations. NULL next disambiguation: n_chains = 0 means the user
    * has no (click → view) at all; n_chains > 0 with NULL next means the
    * first chain ends the stream. */
  val j21: Q = Q(
    "j21_sequence_next_node_first_match",
    """SELECT user_id,
      |  MAX(CASE WHEN isc = 1 AND rnc = 1 THEN n2 END) AS next_after_chain,
      |  CAST(SUM(isc) AS BIGINT) AS n_chains
      |FROM (
      |  SELECT user_id, n2,
      |    CASE WHEN event_type = 'click' AND n1 = 'view' THEN 1 ELSE 0 END AS isc,
      |    ROW_NUMBER() OVER (
      |      PARTITION BY user_id,
      |        CASE WHEN event_type = 'click' AND n1 = 'view' THEN 1 ELSE 0 END
      |      ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST) AS rnc
      |  FROM (
      |    SELECT user_id, event_type, ts, event_id,
      |      LEAD(event_type, 1) OVER w AS n1,
      |      LEAD(event_type, 2) OVER w AS n2
      |    FROM events
      |    WINDOW w AS (PARTITION BY user_id
      |                 ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST)))
      |GROUP BY user_id
      |ORDER BY user_id ASC NULLS LAST""".stripMargin,
    (s, dir) => j21Plan(Tables.events(s, dir)))

  // ---------------------------------------------------------------- d61

  /** d61 — `boundingRatio(x, y)` in its AGGREGATE shape [public: CH
    * aggregate-function docs]. NOT a new tail item: d27 (r8) already
    * declares boundingRatio as per-user first/last slope through a
    * WINDOW plan (exchange + sort + rn=1 filter). This face declares the
    * SECOND mechanism for the family — the d55/d60 discipline — and it
    * is the shape CH itself executes (boundingRatio IS an aggregate
    * there): per event type over (x = epoch µs, y = value cents), both
    * extremes read as struct-ordered MIN/MAX in ONE map-combined hash
    * aggregate — no sort, no window, no join (plan-pinned; the 100 TB
    * shape for a two-point statistic). Equal-x ties pinned by event_id
    * (CH leaves them undefined). Integer deltas ship alongside; the only
    * float is ONE division of int64-exact operands (the d44/e22 class)
    * with dx = 0 → NULL via NULLIF on both engines — d27's pinned
    * posture for the degenerate group (CH's nan as SQL NULL), pinned on
    * a synthetic single-point group in Round15Spec. The ORACLE reads the
    * extremes via two ASC/DESC ROW_NUMBERs — independent formulations. */
  val d61: Q = Q(
    "d61_bounding_ratio_agg",
    """WITH b AS (
      |  SELECT event_type, ts, event_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST) AS rf,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY ts DESC, event_id DESC) AS rl
      |  FROM events)
      |SELECT event_type,
      |  CAST(MAX(CASE WHEN rl = 1 THEN c END)
      |     - MAX(CASE WHEN rf = 1 THEN c END) AS BIGINT) AS dy_cents,
      |  CAST(MAX(CASE WHEN rl = 1 THEN epoch_us(ts) END)
      |     - MAX(CASE WHEN rf = 1 THEN epoch_us(ts) END) AS BIGINT) AS dx_us,
      |  CAST(MAX(CASE WHEN rl = 1 THEN c END)
      |     - MAX(CASE WHEN rf = 1 THEN c END) AS DOUBLE)
      |    / CAST(NULLIF(MAX(CASE WHEN rl = 1 THEN epoch_us(ts) END)
      |                - MAX(CASE WHEN rf = 1 THEN epoch_us(ts) END), 0) AS DOUBLE)
      |    AS bounding_ratio
      |FROM b GROUP BY event_type
      |ORDER BY event_type ASC NULLS LAST""".stripMargin,
    (s, dir) => d61Plan(Tables.events(s, dir)))

  /** The d61 plan body, factored so Round15Spec can drive the REAL plan
    * on a synthetic frame (the h46Plan discipline). Relies on the
    * Tables.events ts-NON-NULL invariant (FixtureInvariantsSpec): a NULL
    * ts would sort FIRST in the struct MIN/MAX while the oracle's
    * NULLS LAST ordering sorts it last. */
  def d61Plan(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
    val agg = ev
      .select(col("event_type"),
              struct(col("ts"), col("event_id"), cents.as("c"),
                     unix_micros(col("ts")).as("us")).as("p"))
      .groupBy("event_type")
      .agg(min(col("p")).as("lo"), max(col("p")).as("hi"))
    agg.select(col("event_type"),
        (col("hi.c") - col("lo.c")).cast("long").as("dy_cents"),
        (col("hi.us") - col("lo.us")).cast("long").as("dx_us"),
        ((col("hi.c") - col("lo.c")).cast("double") /
           nullif(col("hi.us") - col("lo.us"), lit(0L)).cast("double"))
          .as("bounding_ratio"))
      .orderBy(asc_nulls_last("event_type"))
  }

  /** The j21 plan body, factored so Round15Spec can drive the REAL plan
    * on a synthetic frame (the h46Plan discipline). */
  def j21Plan(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // NULLS LAST mirrors the oracle's window ordering explicitly; the
    // min(struct(ts, …)) chain key below additionally relies on the
    // Tables.events ts-NON-NULL invariant (FixtureInvariantsSpec)
    val w = Window.partitionBy("user_id")
      .orderBy(asc_nulls_last("ts"), asc_nulls_last("event_id"))
    val wAll = Window.partitionBy("user_id")
    val isChain = col("event_type") === "click" && col("n1") === "view"
    ev.select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("n1", lead(col("event_type"), 1).over(w))
      .withColumn("n2", lead(col("event_type"), 2).over(w))
      .withColumn("key", struct(col("ts"), col("event_id")))
      .withColumn("first_chain_key", min(when(isChain, col("key"))).over(wAll))
      .groupBy("user_id")
      .agg(max(when(col("key") === col("first_chain_key"), col("n2")))
             .as("next_after_chain"),
           sum(when(isChain, 1).otherwise(0)).cast("long").as("n_chains"))
      .orderBy(asc_nulls_last("user_id"))
  }

  def ops: Vector[Q] = Vector(j21, d61)
}
