package graft.engine

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 third extension block: dictionary lookup (`dictGetOrDefault`),
  * terminal bar rendering (`bar`), M4 time-series downsampling (the
  * min/max/first/last-per-pixel-bucket recipe from Jugel et al., VLDB
  * 2014 — the exact counterpart of ClickHouse's
  * `largestTriangleThreeBuckets` downsampling use case), and character
  * n-gram similarity (`ngramDistance` family).
  *
  * Scale notes (the 100 TB posture, SURVEY §4):
  *  - i12's dictionary is a DIMENSION-SIDED broadcast: the dict (15 rows
  *    here; dictionaries are ≤ millions of rows by definition) ships to
  *    every executor, the fact side stays map-only — no shuffle before
  *    the final small re-agg on the dict value (cardinality = dict size).
  *    This is exactly how CH dictionaries behave: RAM-resident lookup,
  *    never a distributed join.
  *  - h25 needs one global max — a 1-row broadcast cross join (the same
  *    justified-1-row-broadcast shape as i09–i11, whitelisted in the plan
  *    sweep), then map-only integer rendering.
  *  - e18 is the window+agg fusion: rn asc/desc share one
  *    exchange+sort per (series, bucket), and the final hash agg reuses
  *    that partitioning. Output is 4 points per bucket regardless of
  *    input density — the entire point of M4 at 100 TB (plot 10^12 rows
  *    at 10^3 pixels without a global sort or a driver collect).
  *  - h26 is pure map-side array work over codegen'd builtins.
  *
  * Determinism (SURVEY §2): cents via the decimal route; bar strings are
  * integer-eighths arithmetic (half-up in exact int64) indexing a fixed
  * glyph ladder; M4 first/last tie-break on (ts, event_id) total order;
  * h26's one float division divides bit-identical int32 counts.
  */
object Round8cOps {

  /** i12 — external-dictionary lookup (ClickHouse `dictGetOrDefault`
    * analog [public: CH external-dictionary docs]): enrich customers with
    * a nation-name dictionary COVERING ONLY REGIONS 0–2 (so both the hit
    * and the default path carry rows), then re-aggregate per resolved
    * name. The dict side is `broadcast()`ed explicitly — a dictionary is
    * by contract small enough to be RAM-resident on every node, so the
    * fact scan never shuffles for the lookup; the re-agg's key domain is
    * the dict size, not the fact size. Balance kept in exact cents. */
  val i12: Q = Q(
    "i12_dict_get",
    """SELECT COALESCE(n.n_name, 'N/A') AS nation_name,
      |  CAST(COUNT(*) AS BIGINT) AS cnt,
      |  CAST(SUM(CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
      |    AS sum_acctbal_cents
      |FROM customer c
      |LEFT JOIN (SELECT n_nationkey, n_name FROM nation WHERE n_regionkey <= 2) n
      |  ON c.c_nationkey = n.n_nationkey
      |GROUP BY 1
      |ORDER BY nation_name ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      val dict = Tables.nation(s, dir)
        .where(col("n_regionkey") <= 2)
        .select(col("n_nationkey"), col("n_name"))
      Tables.customer(s, dir)
        .join(broadcast(dict), col("c_nationkey") === col("n_nationkey"), "left")
        .groupBy(coalesce(col("n_name"), lit("N/A")).as("nation_name"))
        .agg(count(lit(1)).cast("long").as("cnt"),
             sum((col("c_acctbal").cast("decimal(18,2)") * 100).cast("long"))
               .cast("long").as("sum_acctbal_cents"))
        .orderBy(asc_nulls_last("nation_name"))
    })

  /** h25 — terminal bar rendering (ClickHouse `bar(x, min, max, width)`
    * analog [public: CH other-function docs]): each sampled event's value
    * as a width-20 unicode bar against the sample's max, using CH's
    * eighth-block glyphs. The bar length in EIGHTHS is exact int64
    * half-up arithmetic — (cents·160·2 + max) DIV (2·max) — so the
    * rendered strings are byte-identical cross-engine with zero float.
    * The global max is a 1-row broadcast cross join; rendering is
    * map-only. */
  val h25: Q = Q(
    "h25_bar_render",
    """WITH src AS (
      |  SELECT event_id, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events WHERE event_id % 11 = 0),
      |mx AS (SELECT MAX(cents) AS maxc FROM src)
      |SELECT event_id, cents,
      |  repeat('█', CAST(e // 8 AS INT)) ||
      |  CASE e % 8 WHEN 0 THEN '' WHEN 1 THEN '▏' WHEN 2 THEN '▎'
      |             WHEN 3 THEN '▍' WHEN 4 THEN '▌' WHEN 5 THEN '▋'
      |             WHEN 6 THEN '▊' ELSE '▉' END AS bar
      |FROM (SELECT event_id, cents, (cents * 320 + maxc) // (2 * maxc) AS e
      |      FROM src CROSS JOIN mx)
      |ORDER BY event_id ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      val src = Tables.events(s, dir)
        .where(col("event_id") % 11 === 0)
        .select(col("event_id"),
                (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      val mx = src.agg(max(col("cents")).as("maxc"))
      val glyphs = array(lit(""), lit("▏"), lit("▎"), lit("▍"),
                         lit("▌"), lit("▋"), lit("▊"), lit("▉"))
      src.crossJoin(broadcast(mx))
        .withColumn("e", expr("(cents * 320 + maxc) div (2 * maxc)"))
        .select(col("event_id"), col("cents"),
                concat(expr("repeat('█', CAST(e div 8 AS INT))"),
                       element_at(glyphs, (col("e") % 8).cast("int") + 1)).as("bar"))
        .orderBy(asc_nulls_last("event_id"))
    })

  /** e18 — M4 downsampling (Jugel et al., VLDB 2014 [public paper]; the
    * exact-answer counterpart of ClickHouse's
    * `largestTriangleThreeBuckets` downsampling [public: CH docs]): per
    * (event_type, hour bucket), the min, max, first and last value — the
    * four rows per pixel column that make a downsampled line plot
    * pixel-perfect. first/last tie-break on the (ts, event_id) total
    * order via two row_numbers sharing ONE window exchange+sort; the
    * closing hash agg reuses the same partitioning. Output size is
    * 4·buckets·series regardless of input rows — the M4 guarantee. */
  val e18: Q = Q(
    "e18_m4_downsample",
    """WITH src AS (
      |  SELECT event_type, event_id, ts, epoch_ms(ts) // 3600000 AS bkt,
      |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |rk AS (
      |  SELECT event_type, bkt, cents,
      |    ROW_NUMBER() OVER (PARTITION BY event_type, bkt
      |                       ORDER BY ts ASC, event_id ASC) AS rn_a,
      |    ROW_NUMBER() OVER (PARTITION BY event_type, bkt
      |                       ORDER BY ts DESC, event_id DESC) AS rn_d
      |  FROM src)
      |SELECT event_type, CAST(bkt AS BIGINT) AS bkt,
      |  CAST(MIN(cents) AS BIGINT) AS v_min,
      |  CAST(MAX(cents) AS BIGINT) AS v_max,
      |  CAST(MIN(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS v_first,
      |  CAST(MIN(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS v_last,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM rk
      |GROUP BY event_type, bkt
      |ORDER BY event_type ASC NULLS LAST, bkt ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      val src = Tables.events(s, dir)
        .select(col("event_type"), col("event_id"), col("ts"),
                expr("unix_millis(ts) div 3600000").as("bkt"),
                (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      val wA = Window.partitionBy("event_type", "bkt").orderBy(asc("ts"), asc("event_id"))
      val wD = Window.partitionBy("event_type", "bkt").orderBy(desc("ts"), desc("event_id"))
      src
        .withColumn("rn_a", row_number().over(wA))
        .withColumn("rn_d", row_number().over(wD))
        .groupBy("event_type", "bkt")
        .agg(min(col("cents")).cast("long").as("v_min"),
             max(col("cents")).cast("long").as("v_max"),
             min(when(col("rn_a") === 1, col("cents"))).cast("long").as("v_first"),
             min(when(col("rn_d") === 1, col("cents"))).cast("long").as("v_last"),
             count(lit(1)).cast("long").as("n"))
        .select(col("event_type"), col("bkt").cast("long").as("bkt"),
                col("v_min"), col("v_max"), col("v_first"), col("v_last"), col("n"))
        .orderBy(asc_nulls_last("event_type"), asc_nulls_last("bkt"))
    })

  /** h26 — character-bigram similarity (ClickHouse `ngramDistance` family
    * analog [public: CH string-search-function docs]): the Jaccard
    * similarity of the distinct character-bigram sets of ADJACENT part
    * names, paired by a co-partitionable `key+1` equi-join (NOT a global
    * lead() window — the join shuffles on the key like any fact join and
    * survives 100 TB; an unpartitioned window would not). Intersection/
    * union sizes are exact int32 set cardinalities from codegen'd array
    * builtins; the similarity is ONE float division of those
    * bit-identical ints. Strings of length < 2 yield an empty set (the
    * CASE guard — Spark's `sequence` is bidirectional, so
    * sequence(1, 0) would NOT be empty). */
  val h26: Q = Q(
    "h26_ngram_jaccard",
    """WITH pairs AS (
      |  SELECT p.p_partkey, p.p_name AS s1, q.p_name AS s2
      |  FROM part p JOIN part q ON q.p_partkey = p.p_partkey + 1
      |  WHERE p.p_partkey % 7 = 0),
      |bg AS (
      |  SELECT p_partkey,
      |    list_distinct(list_transform(range(1, length(s1)),
      |                                 i -> s1[i:i+1])) AS a,
      |    list_distinct(list_transform(range(1, length(s2)),
      |                                 i -> s2[i:i+1])) AS b
      |  FROM pairs)
      |SELECT p_partkey,
      |  CAST(length(list_intersect(a, b)) AS INT) AS n_inter,
      |  CAST(length(list_distinct(list_concat(a, b))) AS INT) AS n_union,
      |  CAST(length(list_intersect(a, b)) AS DOUBLE)
      |    / CAST(NULLIF(length(list_distinct(list_concat(a, b))), 0) AS DOUBLE)
      |    AS jaccard
      |FROM bg
      |ORDER BY p_partkey ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      def bigrams(c: org.apache.spark.sql.Column) =
        when(length(c) >= 2,
             array_distinct(transform(sequence(lit(1), length(c) - 1),
                                      i => c.substr(i, lit(2)))))
          .otherwise(array().cast("array<string>"))
      val p = Tables.part(s, dir).select(col("p_partkey"), col("p_name"))
      val q = p.select(col("p_partkey").as("q_key"), col("p_name").as("q_name"))
      p.where(col("p_partkey") % 7 === 0)
        .join(q, col("q_key") === col("p_partkey") + 1)
        .select(col("p_partkey"),
                bigrams(col("p_name")).as("a"),
                bigrams(col("q_name")).as("b"))
        .select(col("p_partkey"),
                size(array_intersect(col("a"), col("b"))).as("n_inter"),
                size(array_distinct(concat(col("a"), col("b")))).as("n_union"))
        .select(col("p_partkey"),
                col("n_inter").cast("int").as("n_inter"),
                col("n_union").cast("int").as("n_union"),
                (col("n_inter").cast("double") /
                  nullif(col("n_union"), lit(0)).cast("double")).as("jaccard"))
        .orderBy(asc_nulls_last("p_partkey"))
    })

  def ops: Vector[Q] = Vector(i12, h25, e18, h26)
}
