package graft.engine

import org.apache.spark.sql.functions._

/** Round-8 fifth extension block: the remaining widely-used ClickHouse
  * families with exact (zero-float or integer-rounded) output — map-agg
  * completion (`minMap`/`avgMap`), bitmap aggregates
  * (`groupBitmapAnd/Or/Xor`), IPv4 codec scalars
  * (`IPv4NumToString`/`IPv4StringToNum`/private-range tests), histogram
  * sparklines (`sparkbar`), and integer-exact geometry
  * (`pointInPolygon`).
  *
  * Scale notes (the 100 TB posture, SURVEY §4):
  *  - d29 is d25's shape exactly: (group, key) is the shuffle key, the
  *    map never materializes wide, AQE balances it like any agg. The
  *    avg is closed-form from (sum, count) partials — no second pass.
  *  - d30's only full-size operation is the first DISTINCT over
  *    (group, day, bucket) — map-side combined, bounded output
  *    (groups × days × 101). Everything after runs on bitmap-domain-
  *    sized data; the day-count side is a broadcast join (group
  *    cardinality rows).
  *  - h27 and h29 are pure map-only codegen'd integer scalar work —
  *    embarrassingly parallel at any scale.
  *  - h28's full-size op is one hash agg to (group, hour) — ≤ 24·|groups|
  *    rows after it; the dense-grid fill, max window and glyph render
  *    all run on that bounded frame.
  *
  * Determinism (SURVEY §2): every value that crosses the oracle is
  * int64, DATE, or a string assembled from int64 — the avgMap entries
  * use the (2·num + den) DIV (2·den) exact half-up recipe (What's-hard
  * item 1), sparkbar levels the same recipe against the group max, and
  * h29's point-in-polygon test is five int64 cross products (no float
  * exists in the query at all). Integer `div` truncates toward zero in
  * BOTH engines (verified: DuckDB -7//2 = -3, Spark -7 div 2 = -3), and
  * every operand here is non-negative anyway.
  */
object Round8eOps {

  /** d29 — map-agg family completion (ClickHouse `minMap`/`avgMap`
    * analog [public: CH -Map combinator docs]): per day, the key-wise
    * MIN and key-wise AVG of (event_type → value), serialized per rule 6
    * as sorted `k:v` strings. min rides exact cents; avg is rendered in
    * exact integer hundredths via half-up (2·S + C) DIV (2·C) on the
    * int64 cents sum — no float reaches the output. Same two-chained-
    * hash-agg plan as d25 (the (group, key) shuffle IS the map state). */
  val d29: Q = Q(
    "d29_min_avg_map",
    """WITH per AS (
      |  SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day, event_type,
      |    MIN(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS min_c,
      |    SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS sum_c,
      |    COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2)
      |SELECT day,
      |  STRING_AGG(event_type || ':' || CAST(min_c AS VARCHAR), ','
      |             ORDER BY event_type ASC) AS min_map,
      |  STRING_AGG(event_type || ':' || CAST((2 * sum_c + cnt) // (2 * cnt) AS VARCHAR), ','
      |             ORDER BY event_type ASC) AS avg_map,
      |  CAST(COUNT(*) AS BIGINT) AS n_keys
      |FROM per GROUP BY day
      |ORDER BY day ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      val per = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(min((col("value").cast("decimal(18,2)") * 100).cast("long")).as("min_c"),
             sum((col("value").cast("decimal(18,2)") * 100).cast("long")).as("sum_c"),
             count(lit(1)).as("cnt"))
      // keys are unique per group, so sorting (k, v) structs by k gives the
      // same order as the oracle's ORDER BY event_type ASC
      per
        .groupBy("day")
        .agg(array_join(transform(array_sort(collect_list(
               struct(col("event_type"), col("min_c").cast("string").as("v")))),
               x => concat(x("event_type"), lit(":"), x("v"))), ",").as("min_map"),
             array_join(transform(array_sort(collect_list(
               struct(col("event_type"),
                      expr("CAST((2 * sum_c + cnt) div (2 * cnt) AS STRING)").as("v")))),
               x => concat(x("event_type"), lit(":"), x("v"))), ",").as("avg_map"),
             count(lit(1)).as("n_keys"))
        .orderBy(asc_nulls_last("day"))
    })

  /** d30 — bitmap aggregates (ClickHouse `groupBitmapAnd`/`Or`/`Xor`
    * analog [public: CH groupBitmap docs]): treat each day's set of
    * user buckets (user_id % 101) as one bitmap per (event_type, day);
    * per event_type report |OR| (buckets active on ANY day), |AND|
    * (buckets active on EVERY day) and |XOR| (buckets active on an odd
    * number of days) of those bitmaps. The relational form: one DISTINCT
    * over (type, day, bucket) — the ONLY full-size pass, map-side
    * combined — then presence-count classification against the group's
    * day count (a broadcast join of |groups| rows). All-int64 output. */
  val d30: Q = Q(
    "d30_group_bitmap",
    """WITH tri AS (
      |  SELECT DISTINCT event_type, CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
      |    user_id % 101 AS v
      |  FROM events),
      |per AS (SELECT event_type, v, COUNT(*) AS nd FROM tri GROUP BY 1, 2),
      |dd AS (SELECT event_type, COUNT(DISTINCT CAST(DATE_TRUNC('day', ts) AS DATE)) AS d
      |       FROM events GROUP BY 1)
      |SELECT per.event_type,
      |  CAST(COUNT(*) AS BIGINT) AS bitmap_or,
      |  CAST(SUM(CASE WHEN per.nd = dd.d THEN 1 ELSE 0 END) AS BIGINT) AS bitmap_and,
      |  CAST(SUM(CASE WHEN per.nd % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bitmap_xor
      |FROM per JOIN dd ON per.event_type = dd.event_type
      |GROUP BY per.event_type
      |ORDER BY per.event_type ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      val tri = Tables.events(s, dir)
        .select(col("event_type"), to_date(col("ts")).as("day"),
                (col("user_id") % 101).as("v"))
        .distinct()
      val per = tri.groupBy("event_type", "v").agg(count(lit(1)).as("nd"))
      // day count from a (type, day) distinct over events directly — NOT from
      // tri: reusing tri would run the expensive (type, day, bucket) distinct
      // pipeline twice (Spark shares no subplan across the join); the
      // (type, day) form map-combines to a types×days-sized shuffle
      val dd = Tables.events(s, dir)
        .groupBy(col("event_type").as("dd_type"))
        .agg(countDistinct(to_date(col("ts"))).as("d"))
      per.join(broadcast(dd), col("event_type") === col("dd_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("bitmap_or"),
             sum(when(col("nd") === col("d"), 1).otherwise(0)).cast("long").as("bitmap_and"),
             sum(when(col("nd") % 2 === 1, 1).otherwise(0)).cast("long").as("bitmap_xor"))
        .orderBy(asc_nulls_last("event_type"))
    })

  /** h27 — IPv4 codec family (ClickHouse `IPv4NumToString`/
    * `IPv4StringToNum`/`isIPAddressInRange` analog [public: CH IP
    * function docs]): a deterministic 32-bit address per sampled order
    * (key masked into 31 bits BEFORE the Knuth multiply — the a04
    * overflow lesson, no int64 wrap at any key scale), rendered to
    * dotted-quad, round-tripped back to the number, plus the three
    * RFC-1918 private-range membership tests as pure integer range
    * checks. Map-only codegen'd scalar work; everything int64/string. */
  val h27: Q = Q(
    "h27_ipv4_codec",
    """SELECT o_orderkey,
      |  ip,
      |  o1 || '.' || o2 || '.' || o3 || '.' || o4 AS ip_str,
      |  o1 * 16777216 + o2 * 65536 + o3 * 256 + o4 AS ip_rt,
      |  CASE WHEN o1 = 10 THEN 1
      |       WHEN o1 = 172 AND o2 >= 16 AND o2 <= 31 THEN 1
      |       WHEN o1 = 192 AND o2 = 168 THEN 1 ELSE 0 END AS is_private,
      |  ip // 1048576 AS cidr12
      |FROM (
      |  SELECT o_orderkey, ip,
      |    ip // 16777216 AS o1, (ip // 65536) % 256 AS o2,
      |    (ip // 256) % 256 AS o3, ip % 256 AS o4
      |  FROM (
      |    SELECT o_orderkey,
      |      ((o_orderkey % 2147483648) * 2654435761) % 4294967296 AS ip
      |    FROM orders WHERE o_orderkey % 13 = 0))
      |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      Tables.orders(s, dir)
        .where(col("o_orderkey") % 13 === 0)
        .select(col("o_orderkey"),
                expr("((o_orderkey % 2147483648L) * 2654435761L) % 4294967296L").as("ip"))
        .select(col("o_orderkey"), col("ip"),
                expr("ip div 16777216").as("o1"),
                expr("(ip div 65536) % 256").as("o2"),
                expr("(ip div 256) % 256").as("o3"),
                expr("ip % 256").as("o4"))
        .select(col("o_orderkey"), col("ip"),
                concat_ws(".", col("o1"), col("o2"), col("o3"), col("o4")).as("ip_str"),
                (col("o1") * 16777216 + col("o2") * 65536 +
                  col("o3") * 256 + col("o4")).as("ip_rt"),
                when(col("o1") === 10, 1)
                  .when(col("o1") === 172 && col("o2") >= 16 && col("o2") <= 31, 1)
                  .when(col("o1") === 192 && col("o2") === 168, 1)
                  .otherwise(0).as("is_private"),
                expr("ip div 1048576").as("cidr12"))
        .orderBy(asc_nulls_last("o_orderkey"))
    })

  /** h28 — histogram sparkline (ClickHouse `sparkbar` analog [public:
    * CH sparkbar docs]): per event_type, the 24-hour activity histogram
    * rendered as one 24-glyph string of eighth-block characters. The
    * per-(type, hour) count is the only full-size agg; the dense 0–23
    * grid fill, group max and glyph selection run on ≤ 24·|types| rows.
    * Glyph level is exact int64 half-up eighths of the group max
    * (LEAST(GREATEST((cnt·16 + maxc) DIV (2·maxc), 1), 8) for cnt > 0,
    * blank for empty hours) — strings byte-identical cross-engine,
    * zero float. */
  val h28: Q = Q(
    "h28_sparkbar",
    """WITH h AS (
      |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr, COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT t.event_type, g.hr
      |  FROM (SELECT DISTINCT event_type FROM events) t
      |  CROSS JOIN (SELECT CAST(UNNEST(range(0, 24)) AS BIGINT) AS hr) g),
      |f AS (
      |  SELECT grid.event_type, grid.hr, COALESCE(h.cnt, 0) AS cnt
      |  FROM grid LEFT JOIN h ON grid.event_type = h.event_type AND grid.hr = h.hr),
      |m AS (SELECT event_type, MAX(cnt) AS maxc FROM f GROUP BY 1),
      |lv AS (
      |  SELECT f.event_type, f.hr,
      |    CASE WHEN f.cnt = 0 THEN 0
      |         ELSE LEAST(GREATEST((f.cnt * 16 + m.maxc) // (2 * m.maxc), 1), 8)
      |    END AS lvl
      |  FROM f JOIN m ON f.event_type = m.event_type)
      |SELECT event_type,
      |  STRING_AGG(CASE lvl WHEN 0 THEN ' ' WHEN 1 THEN '▁' WHEN 2 THEN '▂'
      |                      WHEN 3 THEN '▃' WHEN 4 THEN '▄' WHEN 5 THEN '▅'
      |                      WHEN 6 THEN '▆' WHEN 7 THEN '▇' ELSE '█' END,
      |             '' ORDER BY hr ASC) AS spark,
      |  CAST(SUM(CASE WHEN lvl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_active_hours
      |FROM lv GROUP BY event_type
      |ORDER BY event_type ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val h = ev.groupBy(col("event_type"), hour(col("ts")).cast("long").as("hr"))
        .agg(count(lit(1)).as("cnt"))
      val grid = ev.select("event_type").distinct()
        .select(col("event_type").as("g_type"),
                explode(sequence(lit(0L), lit(23L))).as("g_hr"))
      val f = grid.join(h, col("g_type") === col("event_type") && col("g_hr") === col("hr"), "left")
        .select(col("g_type").as("event_type"), col("g_hr").as("hr"),
                coalesce(col("cnt"), lit(0L)).as("cnt"))
      val m = f.groupBy(col("event_type").as("m_type")).agg(max(col("cnt")).as("maxc"))
      val glyphs = array(lit(" "), lit("▁"), lit("▂"), lit("▃"), lit("▄"),
                         lit("▅"), lit("▆"), lit("▇"), lit("█"))
      f.join(broadcast(m), col("event_type") === col("m_type"))
        .withColumn("lvl", when(col("cnt") === 0, 0L)
          .otherwise(least(greatest(expr("(cnt * 16 + maxc) div (2 * maxc)"), lit(1L)), lit(8L))))
        .groupBy("event_type")
        .agg(array_join(transform(array_sort(collect_list(
               struct(col("hr"), element_at(glyphs, col("lvl").cast("int") + 1).as("g")))),
               x => x("g")), "").as("spark"),
             sum(when(col("lvl") > 0, 1).otherwise(0)).cast("long").as("n_active_hours"))
        .orderBy(asc_nulls_last("event_type"))
    })

  /** h29 — integer-exact point-in-polygon (ClickHouse `pointInPolygon`
    * analog [public: CH geo function docs]): each sampled part mapped to
    * a deterministic grid point (p_partkey % 100, (p_partkey / 100) %
    * 100), tested against a fixed CONVEX CCW pentagon via five int64
    * cross products — inside ⟺ every cross ≥ 0 (boundary counts as
    * inside). NO float exists anywhere in the query: the usual
    * ray-casting division is replaced by the convex-polygon half-plane
    * form, so both engines compute identical int64 values. Map-only per
    * row; the closing per-mfgr rollup is a 5-key hash agg. */
  val h29: Q = Q(
    "h29_point_in_polygon",
    """WITH pts AS (
      |  SELECT p_partkey, p_brand,
      |    p_partkey % 100 AS px, (p_partkey // 100) % 100 AS py
      |  FROM part WHERE p_partkey % 5 = 0),
      |t AS (
      |  SELECT p_brand, px, py,
      |    CASE WHEN (90 - 10) * (py - 10) - (20 - 10) * (px - 10) >= 0
      |          AND (80 - 90) * (py - 20) - (85 - 20) * (px - 90) >= 0
      |          AND (40 - 80) * (py - 85) - (95 - 85) * (px - 80) >= 0
      |          AND (5 - 40) * (py - 95) - (50 - 95) * (px - 40) >= 0
      |          AND (10 - 5) * (py - 50) - (10 - 50) * (px - 5) >= 0
      |         THEN 1 ELSE 0 END AS inside
      |  FROM pts)
      |SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_pts,
      |  CAST(SUM(inside) AS BIGINT) AS n_inside
      |FROM t GROUP BY p_brand
      |ORDER BY p_brand ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      // pentagon (10,10) (90,20) (80,85) (40,95) (5,50) — CCW (shoelace
      // sum +10625); cross(edge i, point) ≥ 0 for all i ⟺ inside/boundary
      val edges = Seq((10, 10, 90, 20), (90, 20, 80, 85), (80, 85, 40, 95),
                      (40, 95, 5, 50), (5, 50, 10, 10))
      val inside = edges.map { case (x1, y1, x2, y2) =>
        (lit(x2 - x1) * (col("py") - y1) - lit(y2 - y1) * (col("px") - x1)) >= 0
      }.reduce(_ && _)
      Tables.part(s, dir)
        .where(col("p_partkey") % 5 === 0)
        .select(col("p_brand"),
                (col("p_partkey") % 100).as("px"),
                expr("(p_partkey div 100) % 100").as("py"))
        .select(col("p_brand"), when(inside, 1).otherwise(0).as("inside"))
        .groupBy("p_brand")
        .agg(count(lit(1)).cast("long").as("n_pts"),
             sum(col("inside")).cast("long").as("n_inside"))
        .orderBy(asc_nulls_last("p_brand"))
    })

  def ops: Vector[Q] = Vector(d29, d30, h27, h28, h29)
}
