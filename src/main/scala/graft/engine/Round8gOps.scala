package graft.engine

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 seventh extension block: LTTB downsampling
  * (`largestTriangleThreeBuckets`) and deterministic per-group sampling
  * (`groupArraySample`).
  *
  * Scale notes (the 100 TB posture, SURVEY §4):
  *  - e19's full-size work is ONE hash agg to bucket stats plus ONE
  *    argmax hash agg over the points (min(struct) — no per-bucket sort,
  *    no global sort, no driver state). The lag/lead anchor window runs
  *    on bucket-level data (4+ orders smaller than the input; at real
  *    pixel counts it is broadcast-sized). Output is one row per
  *    (series, bucket) regardless of input density — like e18.
  *  - d31's bottom-k-by-hash is the distributed-correct deterministic
  *    sample: mergeable (the k smallest hashes of a union = the k
  *    smallest of the pooled k-smallest), skew-free, and reproducible
  *    across engines and partitionings.
  *
  * Determinism (SURVEY §2): e19's triangle areas are computed ENTIRELY
  * in int64 — the bucket-mean anchors are rationals, so the cross
  * product is multiplied through by n_prev·n_next to clear denominators
  * ((X1−n1·x)·(Y3−n3·y) − (Y1−n1·y)·(X3−n3·x), all integer); ts enters
  * in epoch SECONDS, and the epoch magnitude CANCELS inside each
  * (Σts − n·ts) difference before any multiplication — each factor is
  * bounded by n·(2 bucket widths) ≈ n·7200 and n·maxCents·2
  * respectively, keeping every product under ~7·10^16 for per-bucket
  * counts up to 10^5 (documented bound; pixel buckets are bounded by
  * construction). Selection is a
  * single lexicographic min over a composite integer key, so ties are
  * total-ordered. d31 rides the h11 hash family (Knuth multiplicative
  * on 31-bit-masked keys — the a04 overflow lesson). No float anywhere
  * in either query.
  */
object Round8gOps {

  /** e19 — LTTB downsampling (ClickHouse `largestTriangleThreeBuckets`
    * analog [public: CH aggregate-function docs; Steinarsson's
    * downsampling thesis]): per (series, hour bucket) the point forming
    * the largest triangle with the neighbor buckets' mean points.
    * Classic LTTB anchors the triangle on the PREVIOUSLY SELECTED point
    * (a sequential per-series scan — exactly what a 100 TB operator
    * cannot do); this is the standard parallel variant that anchors on
    * BOTH neighbor bucket means (the next-bucket mean anchor is already
    * classic LTTB's own simplification — Steinarsson §4.2). First/last
    * buckets keep the series' first/last point exactly, like LTTB.
    * Areas are exact int64 (×2·n_prev·n_next to clear the mean
    * denominators); selection is one lexicographic min(struct)
    * aggregation. Plan reality (audited via Explain): struct-min
    * compiles to a partial-then-final SORT aggregate — the raw points
    * are sorted IN PLACE per input partition (map-side), and only one
    * partial minimum per (series, bucket) per partition crosses the
    * exchange, so the selection's shuffle is bucket-sized, never
    * data-sized. The anchor window + join run on bucket-level stats
    * (broadcast here; an equi-shuffle at extreme bucket counts). */
  val e19: Q = Q(
    "e19_lttb_downsample",
    """WITH src AS (
      |  SELECT event_type AS series, epoch_ms(ts) // 3600000 AS bkt,
      |    epoch_ms(ts) // 1000 AS ts_s, epoch_ms(ts) AS ts_ms, event_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |bs AS (
      |  SELECT series, bkt, SUM(ts_s) AS sx, SUM(cents) AS sy, COUNT(*) AS n
      |  FROM src GROUP BY 1, 2),
      |nb AS (
      |  SELECT series, bkt, n,
      |    LAG(sx)  OVER w AS px, LAG(sy)  OVER w AS py, LAG(n)  OVER w AS pn,
      |    LEAD(sx) OVER w AS nx, LEAD(sy) OVER w AS ny, LEAD(n) OVER w AS nn
      |  FROM bs WINDOW w AS (PARTITION BY series ORDER BY bkt ASC)),
      |cand AS (
      |  SELECT s.series, s.bkt, s.ts_ms, s.event_id, s.cents, nb.n,
      |    CAST(CASE WHEN nb.pn IS NULL OR nb.nn IS NULL THEN 0
      |         ELSE ABS((nb.px - nb.pn * s.ts_s) * (nb.ny - nb.nn * s.cents)
      |                - (nb.py - nb.pn * s.cents) * (nb.nx - nb.nn * s.ts_s))
      |    END AS BIGINT) AS area2,
      |    CASE WHEN nb.pn IS NULL THEN 1 WHEN nb.nn IS NULL THEN 2 ELSE 0 END AS edge
      |  FROM src s JOIN nb ON s.series = nb.series AND s.bkt = nb.bkt),
      |keyed AS (
      |  SELECT series, bkt, ts_ms, event_id, cents, n, area2,
      |    CASE WHEN edge = 1 THEN ts_ms WHEN edge = 2 THEN -ts_ms ELSE -area2 END AS k1,
      |    CASE WHEN edge = 2 THEN -event_id ELSE ts_ms END AS k2,
      |    CASE WHEN edge = 2 THEN 0 ELSE event_id END AS k3
      |  FROM cand),
      |sel AS (
      |  SELECT series, bkt, ts_ms, cents, n, area2,
      |    ROW_NUMBER() OVER (PARTITION BY series, bkt
      |                       ORDER BY k1 ASC, k2 ASC, k3 ASC) AS rn
      |  FROM keyed)
      |SELECT series, CAST(bkt AS BIGINT) AS bkt, ts_ms AS sel_ts_ms,
      |  cents AS sel_cents, CAST(n AS BIGINT) AS n_pts, area2
      |FROM sel WHERE rn = 1
      |ORDER BY series ASC NULLS LAST, bkt ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      val src = Tables.events(s, dir)
        .select(col("event_type").as("series"),
                expr("unix_millis(ts) div 3600000").as("bkt"),
                expr("unix_millis(ts) div 1000").as("ts_s"),
                expr("unix_millis(ts)").as("ts_ms"),
                col("event_id"),
                (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      val bs = src.groupBy("series", "bkt")
        .agg(sum("ts_s").as("sx"), sum("cents").as("sy"), count(lit(1)).as("n"))
      val w = Window.partitionBy("series").orderBy(asc("bkt"))
      val nb = bs.select(col("series").as("nb_series"), col("bkt").as("nb_bkt"), col("n"),
                         lag("sx", 1).over(w).as("px"), lag("sy", 1).over(w).as("py"),
                         lag("n", 1).over(w).as("pn"),
                         lead("sx", 1).over(w).as("nx"), lead("sy", 1).over(w).as("ny"),
                         lead("n", 1).over(w).as("nn"))
      val cand = src.join(nb, col("series") === col("nb_series") && col("bkt") === col("nb_bkt"))
        .withColumn("area2",
          when(col("pn").isNull || col("nn").isNull, lit(0L))
            .otherwise(abs((col("px") - col("pn") * col("ts_s")) * (col("ny") - col("nn") * col("cents"))
                         - (col("py") - col("pn") * col("cents")) * (col("nx") - col("nn") * col("ts_s")))))
        .withColumn("edge",
          when(col("pn").isNull, 1).when(col("nn").isNull, 2).otherwise(0))
        .withColumn("k1", when(col("edge") === 1, col("ts_ms"))
          .when(col("edge") === 2, -col("ts_ms")).otherwise(-col("area2")))
        .withColumn("k2", when(col("edge") === 2, -col("event_id")).otherwise(col("ts_ms")))
        .withColumn("k3", when(col("edge") === 2, lit(0L)).otherwise(col("event_id")))
      // argmax as ONE lexicographic min(struct) hash agg — no per-bucket sort;
      // (k1, k2, k3) is a total order (it embeds ts_ms/event_id), so the
      // trailing payload fields never decide the comparison
      cand.groupBy("series", "bkt")
        .agg(min(struct(col("k1"), col("k2"), col("k3"),
                        col("ts_ms"), col("cents"), col("n"), col("area2"))).as("m"))
        .select(col("series"), col("bkt").cast("long").as("bkt"),
                col("m.ts_ms").as("sel_ts_ms"), col("m.cents").as("sel_cents"),
                col("m.n").cast("long").as("n_pts"), col("m.area2").as("area2"))
        .orderBy(asc_nulls_last("series"), asc_nulls_last("bkt"))
    })

  /** d31 — deterministic per-group sampling (ClickHouse
    * `groupArraySample` analog [public: CH aggregate-function docs], in
    * its reproducible-seed form): per event_type the 5 users with the
    * smallest Knuth-multiplicative key hash (bottom-k-by-hash — the
    * mergeable, partition-order-free, skew-free way to sample a
    * distributed group; CH's seeded sample is the same idea with an
    * in-memory reservoir), serialized per rule 6 as an ordered array
    * string. The hash masks into 31 bits before the multiply (the a04
    * lesson — no int64 wrap at any key scale). */
  val d31: Q = Q(
    "d31_group_array_sample",
    """WITH h AS (
      |  SELECT DISTINCT event_type, user_id,
      |    ((user_id % 2147483648) * 2654435761) % 4294967296 AS hk
      |  FROM events),
      |rk AS (
      |  SELECT event_type, user_id, hk,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |                       ORDER BY hk ASC, user_id ASC) AS rn
      |  FROM h)
      |SELECT event_type,
      |  STRING_AGG(CAST(user_id AS VARCHAR), ',' ORDER BY rn ASC) AS sample_users,
      |  CAST(COUNT(*) AS BIGINT) AS n_sampled
      |FROM rk WHERE rn <= 5
      |GROUP BY event_type
      |ORDER BY event_type ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      val h = Tables.events(s, dir)
        .select(col("event_type"), col("user_id"))
        .distinct()
        .withColumn("hk", expr("((user_id % 2147483648L) * 2654435761L) % 4294967296L"))
      val w = Window.partitionBy("event_type").orderBy(asc("hk"), asc("user_id"))
      h.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .groupBy("event_type")
        .agg(array_join(transform(array_sort(collect_list(
               struct(col("rn"), col("user_id").cast("string").as("u")))),
               x => x("u")), ",").as("sample_users"),
             count(lit(1)).cast("long").as("n_sampled"))
        .orderBy(asc_nulls_last("event_type"))
    })

  /** e20 — exponential moving average (ClickHouse
    * `exponentialMovingAverage` analog [public: CH aggregate-function
    * docs], in its deterministic event-ordered form with rational
    * α = 1/8): per user, the EMA of value over events in (ts, event_id)
    * order, computed as an EXACT integer fold — values scaled by 2^16,
    * each step `acc + (x − acc) div 8` (truncating division is identical
    * in both engines, verified incl. negatives), seeded with the first
    * element. The Spark side is the `aggregate` HOF over a sorted list —
    * bounded by per-user activity, the groupArray-class memory posture
    * CH's own EMA state has. The ORACLE is a recursive CTE running the
    * identical truncating recursion row-at-a-time — deliberately NOT
    * DuckDB's `list_reduce`: that function returns WRONG folds for ~0.3%
    * of rows when evaluated over many rows in one query (observed live
    * at sf0.1 on j10 — same list, wrong result vs single-row evaluation;
    * minimal repro in SURVEY §7 What's-hard item 2), so no oracle here
    * may use it. Output in integer-truncated cents; zero float. Scaled
    * magnitude ≤ maxCents·2^16 ≈ 3.2·10^9 — no overflow at any activity
    * level. */
  val e20: Q = Q(
    "e20_exp_moving_avg",
    """WITH RECURSIVE src AS (
      |  SELECT user_id,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) * 65536 AS x,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n
      |  FROM events),
      |rec AS (
      |  SELECT user_id, rn, x AS acc, n FROM src WHERE rn = 1
      |  UNION ALL
      |  SELECT s.user_id, s.rn, r.acc + ((s.x - r.acc) // 8), r.n
      |  FROM rec r JOIN src s ON s.user_id = r.user_id AND s.rn = r.rn + 1)
      |SELECT user_id, CAST(n AS BIGINT) AS n_events,
      |  CAST(acc AS BIGINT) AS ema_scaled,
      |  CAST(acc // 65536 AS BIGINT) AS ema_cents
      |FROM rec WHERE rn = n
      |ORDER BY user_id ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      // r15 watch item: the per-user history is ONE aggregation buffer —
      // refuse loudly past the documented fold budget before collecting
      Guards.requireKeyFanout(Tables.events(s, dir), "user_id",
        "e20_exp_moving_avg")
      // array_sort on (ts_µs, event_id, xs) structs = the oracle's ORDER BY
      // (ts, event_id) at FULL microsecond precision — unix_millis here
      // diverged at sf0.1 (a same-millisecond pair folded in the wrong
      // order; caught by the sf0.1 oracle probe, fixed to unix_micros)
      val l = Tables.events(s, dir)
        .select(col("user_id"),
                struct(expr("unix_micros(ts)").as("t"), col("event_id").as("i"),
                       ((col("value").cast("decimal(18,2)") * 100).cast("long") * 65536)
                         .as("x")).as("p"))
        .groupBy("user_id")
        .agg(transform(array_sort(collect_list(col("p"))), p => p("x")).as("vs"),
             count(lit(1)).as("n"))
      l.select(col("user_id"), col("n").cast("long").as("n_events"),
               expr("""aggregate(slice(vs, 2, size(vs) - 1), vs[0],
                      |(acc, x) -> acc + ((x - acc) div 8))""".stripMargin)
                 .as("ema_scaled"))
        .withColumn("ema_cents", expr("ema_scaled div 65536"))
        .orderBy(asc_nulls_last("user_id"))
    })

  /** j10 — strict-order window funnel (ClickHouse `windowFunnel`
    * `strict_order` mode family [public: CH parametric-aggregate docs]):
    * signup → click → purchase, where once the chain starts it must run
    * over CONSECUTIVE events — ANY intervening event (funnel or not)
    * aborts progression at the reached level, exactly the
    * `A->B->D->C stops at D` semantics of the CH doc example; events
    * before the first 'signup' are ignored (the search start). The
    * j05 base funnel answers "did the steps happen in order"; this
    * answers "did they happen as an unbroken sequence". The Spark side
    * runs the fold state machine via the `aggregate` HOF ([[graft.operators.SequenceMatch.strictStepSql]]).
    * The ORACLE is an INDEPENDENT closed-form derivation — first-signup
    * row + LEAD(1)/LEAD(2) over the time order — which is both a
    * stronger check (two formulations must agree) and a necessity:
    * DuckDB's `list_reduce` mis-folds ~0.3% of rows in bulk evaluation
    * (THIS query caught it live at sf0.1: level-2 count 246 vs 245; see
    * e20's scaladoc + SURVEY What's-hard item 2). Closed form is valid
    * because the fold is finite-horizon: the chain starts at the first
    * signup and is decided by the next two events in sequence. All-int64,
    * zero float. */
  val j10: Q = Q(
    "j10_funnel_strict_order",
    """WITH src AS (
      |  SELECT user_id, ts, event_id,
      |    CASE event_type WHEN 'signup' THEN 1 WHEN 'click' THEN 2
      |         WHEN 'purchase' THEN 3 ELSE 0 END AS s
      |  FROM events),
      |w AS (
      |  SELECT user_id, s,
      |    LEAD(s, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS s1,
      |    LEAD(s, 2) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS s2,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY CASE WHEN s = 1 THEN 0 ELSE 1 END ASC, ts ASC, event_id ASC) AS rs
      |  FROM src),
      |f AS (
      |  SELECT user_id,
      |    CASE WHEN s <> 1 THEN 0
      |         WHEN s1 = 2 AND s2 = 3 THEN 3
      |         WHEN s1 = 2 THEN 2
      |         ELSE 1 END AS lvl
      |  FROM w WHERE rs = 1)
      |SELECT CAST(lvl AS INT) AS funnel_level,
      |  CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM f GROUP BY 1
      |ORDER BY funnel_level ASC NULLS LAST""".stripMargin,
    (s, dir) =>
      // compiled by the shared funnel machinery: strict_order mode = the
      // sorted per-key fold over [[graft.operators.SequenceMatch.strictStepSql]] this query introduced
      graft.operators.SequenceMatch.funnelLevels(
          Tables.events(s, dir), "user_id", col("ts"), col("event_id"),
          Seq(col("event_type") === "signup", col("event_type") === "click",
              col("event_type") === "purchase"),
          window = None, mode = "strict_order")
        .select(col("funnel_level"))
        .groupBy("funnel_level")
        .agg(count(lit(1)).cast("long").as("n_users"))
        .orderBy(asc_nulls_last("funnel_level")))

  def ops: Vector[Q] = Vector(e19, d31, e20, j10)
}
