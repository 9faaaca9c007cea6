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
  *  - `d61_bounding_ratio` — CH `boundingRatio(x, y)`: the slope of the
  *    segment between a group's min-x and max-x points, read off two
  *    struct-ordered extremes in ONE hash aggregate; integer-exact
  *    operands, one shared IEEE division.
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
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
      val wAll = Window.partitionBy("user_id")
      val isChain = col("event_type") === "click" && col("n1") === "view"
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("n1", lead(col("event_type"), 1).over(w))
        .withColumn("n2", lead(col("event_type"), 2).over(w))
        .withColumn("key", struct(col("ts"), col("event_id")))
        .withColumn("first_chain_key", min(when(isChain, col("key"))).over(wAll))
        .groupBy("user_id")
        .agg(max(when(col("key") === col("first_chain_key"), col("n2")))
               .as("next_after_chain"),
             sum(when(isChain, 1).otherwise(0)).cast("long").as("n_chains"))
        .orderBy(asc_nulls_last("user_id"))
    })

  // ---------------------------------------------------------------- d61

  /** d61 — `boundingRatio(x, y)` analog [public: CH aggregate-function
    * docs: the slope between a group's leftmost and rightmost points]:
    * per event type over (x = epoch micros, y = value cents), the ratio
    * (y_last − y_first) / (x_last − x_first) with first/last = min/max x,
    * ties broken by event_id (CH leaves the equal-x winner undefined;
    * the declared face pins the deterministic struct order). ONE hash
    * aggregate: both extremes are struct-ordered MIN/MAX — no sort, no
    * window, no join; the integer deltas ship alongside so the only
    * float is ONE division of bit-identical int64-exact operands (the
    * d44/e22 determinism class — same IEEE op on both engines, no
    * ROUND). The ORACLE reads the extremes via two DESC/ASC ROW_NUMBERs
    * instead — independent formulations. */
  val d61: Q = Q(
    "d61_bounding_ratio",
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
      |    / CAST(MAX(CASE WHEN rl = 1 THEN epoch_us(ts) END)
      |         - MAX(CASE WHEN rf = 1 THEN epoch_us(ts) END) AS DOUBLE)
      |    AS bounding_ratio
      |FROM b GROUP BY event_type
      |ORDER BY event_type ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
      val agg = Tables.events(s, dir)
        .select(col("event_type"),
                struct(col("ts"), col("event_id"), cents.as("c"),
                       unix_micros(col("ts")).as("us")).as("p"))
        .groupBy("event_type")
        .agg(min(col("p")).as("lo"), max(col("p")).as("hi"))
      agg.select(col("event_type"),
          (col("hi.c") - col("lo.c")).cast("long").as("dy_cents"),
          (col("hi.us") - col("lo.us")).cast("long").as("dx_us"),
          ((col("hi.c") - col("lo.c")).cast("double") /
             (col("hi.us") - col("lo.us")).cast("double"))
            .as("bounding_ratio"))
        .orderBy(asc_nulls_last("event_type"))
    })

  def ops: Vector[Q] = Vector(j21, d61)
}
