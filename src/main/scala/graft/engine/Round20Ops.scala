package graft.engine

import org.apache.spark.sql.functions._
import graft.engine.Determinism.{dsum, dsumSql}

/** Round-16 declared queries (builder-internal r20): the TPC-H
  * correlated-aggregate-subquery shapes the r15 verdict named as the one
  * real workload class the c-block did not exercise (Q17's per-group
  * threshold, Q20's nested semi-join chain, Q21's multi-EXISTS), plus the
  * frozen-weight linear quality classifier (k69) closing the scoring
  * tier's trained-classifier face.
  *
  * Fixture adaptations (the c18 precedent — the schema has no partsupp,
  * l_commitdate/l_receiptdate, or p_container): Q20's availqty threshold
  * becomes a shipped-quantity threshold over the same semi-join chain;
  * Q21's "received late" becomes the l_returnflag = 'R' proxy c18
  * established. The JOIN SHAPES — which is what these queries declare —
  * are the spec's.
  */
object Round20Ops {

  // ---------------------------------------------------------------- c21

  /** c21 — TPC-H Q17 shape: small-quantity-order revenue [public: TPC-H
    * spec §2.4.17] — the per-group correlated aggregate threshold class:
    * "lineitems under 20% of their part's average quantity, for one
    * brand". The correlated subquery `0.2·avg(l_quantity) WHERE
    * l_partkey = p_partkey` is the textbook decorrelation target: the
    * threshold is a PER-PART aggregate joined back to the probe side,
    * never a per-row subquery execution.
    *
    * Scale shape: the brand filter cuts part to ~1/64 (70 rows at
    * sf0.01) and BROADCASTS into lineitem — both the threshold pass and
    * the probe pass reduce to one broadcast hash join each over the
    * brand slice; the per-part threshold frame is brand-sized (≤ parts
    * per brand) and broadcasts back. No row of lineitem outside the
    * brand ever shuffles; at 100 TB both passes are map-side over the
    * fact scan (the aggregation is partkey-local, AQE-splittable). The
    * threshold arithmetic rides the decimal route: exact DECIMAL sum →
    * double, ÷ exact count, × 0.2 — identical bits both engines, so the
    * `l_quantity < t` comparison cannot straddle engines. */
  val c21: Q = Q(
    "c21_join_q17_small_qty",
    s"""WITH fl AS (
       |  SELECT l_partkey, l_quantity, l_extendedprice
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE p_brand = 'Brand#23'),
       |thr AS (
       |  SELECT l_partkey,
       |    0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
       |           / COUNT(*)) AS t
       |  FROM fl GROUP BY 1)
       |SELECT ${dsumSql("l_extendedprice")} / 7.0 AS avg_yearly,
       |  CAST(COUNT(*) AS BIGINT) AS n_lines
       |FROM fl JOIN thr USING (l_partkey)
       |WHERE l_quantity < t""".stripMargin,
    (s, dir) => {
      val brandParts = Tables.part(s, dir)
        .filter(col("p_brand") === "Brand#23").select("p_partkey")
      val fl = Tables.lineitem(s, dir)
        .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
      // the per-part threshold attach IS the api.Decorrelate pattern —
      // the engine delegates (the README's library contract)
      graft.api.Decorrelate
        .withGroupAgg(fl, Seq("l_partkey"),
          (lit(0.2) * (dsum(col("l_quantity")) / count(lit(1)))).as("t"))
        .where(col("l_quantity") < col("t"))
        .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"),
             count(lit(1)).cast("long").as("n_lines"))
    })

  // ---------------------------------------------------------------- c22

  /** c22 — TPC-H Q20 shape: suppliers with excess stock of a named part
    * class [public: TPC-H spec §2.4.20] — the NESTED SEMI-JOIN CHAIN:
    * supplier ←semi (part-name slice → per-(supp,part) shipped-quantity
    * aggregate → threshold). The fixture has no partsupp/availqty, so
    * the declared threshold is shipped quantity > 40 over 'red%' parts —
    * the chain (name-LIKE part slice, fact aggregate, HAVING, IN-subquery
    * into the supplier dimension) is Q20's exactly.
    *
    * Scale shape: the part slice broadcasts into lineitem (1/8 of parts);
    * the (supp,part) aggregate is an AQE-splittable hash agg over the
    * slice only; the qualifying-supplier set is dimension-sized and
    * drives a BROADCAST left-semi into supplier⋈nation — the fact table
    * is touched once, nothing data-sized ever sits on a build side. */
  val c22: Q = Q(
    "c22_join_q20_excess_ship",
    s"""WITH qual AS (
       |  SELECT l_suppkey
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE p_name LIKE 'red%'
       |  GROUP BY l_suppkey, l_partkey
       |  HAVING ${dsumSql("l_quantity")} > 40.0)
       |SELECT s_name, n_name, s_acctbal
       |FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |WHERE s_suppkey IN (SELECT l_suppkey FROM qual)
       |ORDER BY s_name ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      val redParts = Tables.part(s, dir)
        .filter(col("p_name").like("red%")).select("p_partkey")
      val qual = Tables.lineitem(s, dir)
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum(col("l_quantity")).as("q"))
        .where(col("q") > 40.0)
        // dedup to the SUPPLIER set before the broadcast: grouped by
        // (supp, part), a multi-part supplier would otherwise inflate the
        // build to qualifying-PAIR size — the broadcast's justification
        // is the supplier bound
        .select("l_suppkey").distinct()
      Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
              col("s_nationkey") === col("n_nationkey"))
        // qual is supplier-bounded (≤ |suppliers| post-HAVING) — explicit
        // broadcast: AQE's conservative post-agg estimate planned an SMJ
        // at sf0.1 (Explain read), and sorting the dimension for a
        // dimension-sized build is never the 100 TB shape
        .join(broadcast(qual), col("s_suppkey") === col("l_suppkey"),
              "left_semi")
        .select("s_name", "n_name", "s_acctbal")
        .orderBy(asc_nulls_last("s_name"))
    })

  // ---------------------------------------------------------------- c23

  /** c23 — TPC-H Q21 shape: suppliers who kept multi-supplier orders
    * waiting [public: TPC-H spec §2.4.21] — the MULTI-EXISTS class: for
    * 'F' orders, count flagged lines whose supplier is the ONLY flagged
    * supplier in an order served by several ("late" = l_returnflag = 'R',
    * the c18 proxy; the fixture has no commit/receipt dates).
    *
    * The ORACLE keeps Q21's literal EXISTS + NOT-EXISTS pair. The Spark
    * plan is the AGGREGATION DECORRELATION: one per-order regroup
    * computing (distinct suppliers, distinct flagged suppliers) replaces
    * BOTH correlated subqueries — EXISTS(other supplier) ⇔ ns ≥ 2 and
    * NOT EXISTS(other flagged supplier) ⇔ nrs = 1 given l1 is flagged
    * (l1's supplier ∈ the flagged set, so |set| = 1 pins it to l1).
    * Two independent formulations must agree — the j10 oracle
    * discipline.
    *
    * Scale shape: the EXISTS form would shuffle lineitem THREE times
    * (probe + semi + anti, each keyed on l_orderkey); the regroup form
    * shuffles it twice on the SAME key (agg + join) and Spark reuses the
    * exchange — at 100 TB the per-order frame is orders-sized, the join
    * is AQE-splittable, and the supplier⋈nation dimension broadcasts.
    * The regroup itself is TWO STACKED EXACT AGGS ((order,supp) flag-max
    * → per-order count/sum) rather than the two-countDistinct form: the
    * multi-distinct Expand doubles the fact through the first exchange,
    * and the stacked form measured 30% faster on the full query's frame
    * (5-pass medians 1.08 vs 1.48 s at sf0.1, rows identical — recorded
    * in BASELINE). */
  val c23: Q = Q(
    "c23_join_q21_waiting",
    """SELECT s_name, n_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM supplier, nation, orders, lineitem l1
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND s_nationkey = n_nationkey
      |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name, n_name
      |ORDER BY numwait DESC NULLS LAST, s_name ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      // NULL l_suppkey must not count as a distinct supplier in ns: the
      // declared SQL's `<>` comparisons are NULL-rejecting, so a NULL-key
      // l2 row never witnesses EXISTS — drop such rows before the regroup
      // (map-side, pre-shuffle; the fixture has none, but equivalence to
      // the oracle must not be conditional on that). r16 ADVICE item.
      val perOrder = li
        .filter(col("l_suppkey").isNotNull)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("fl"))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("ns"), sum(col("fl")).as("nrs"))
      val supNat = Tables.supplier(s, dir)
        .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
      li.filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_suppkey")
        .join(Tables.orders(s, dir)
                .filter(col("o_orderstatus") === "F").select("o_orderkey"),
              col("l_orderkey") === col("o_orderkey"))
        .join(perOrder, "l_orderkey")
        .where(col("ns") >= 2 && col("nrs") === 1)
        .join(broadcast(supNat), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name", "n_name")
        .agg(count(lit(1)).cast("long").as("numwait"))
        .orderBy(desc_nulls_last("numwait"), asc_nulls_last("s_name"))
    })

  // ---------------------------------------------------------------- k69

  /** Frozen classifier parameters (the k57 frozen-merge-table
    * discipline): integer milli-weights over the four integer document
    * features, hand-set so the sf-fixture scores span the decision
    * boundary (z ∈ [−2.0, 1.8], 311/500 selected at sf0.01 — probed at
    * freeze time, recorded here). A production pipeline would train
    * these (fastText/CCNet-style) and freeze the table exactly like
    * this; training itself is out of declared scope (the Bpe.train
    * Tier-2 precedent would apply). */
  private[graft] val K69 = Map(
    "wu" -> 200L,   // distinct-token count (lexical richness, +)
    "wt" -> -60L,   // token count (penalizes raw length)
    "ws" -> 80L,    // stopword hits ('a'/'the' — fluency proxy, +)
    "wc" -> -2L,    // character count (penalizes verbosity)
    "b"  -> -1000L) // bias (milli-units)

  /** k69 — frozen-weight linear quality classifier [public: the
    * fastText/CCNet quality-classifier face every production corpus
    * pipeline runs (CCNet §4.4; Brown et al. 2020 appendix A's
    * quality-classifier filtering) — k40/k48 are LM scores, this is the
    * trained-classifier score the r15 verdict named missing]: per doc,
    * four integer features (tokens, distinct tokens, frozen-stoplist
    * hits, chars) enter an EXACT int64 dot product with the frozen
    * milli-weights; z = dot/1000, score = σ(z) rounded to 4, selected =
    * rounded score > 0.5.
    *
    * Determinism: the dot is exact int64 (no merge order — it is
    * per-row), z's divide is one double op on identical bits, and σ =
    * 1/(1+exp(−z)) takes exp of identical bits — the k20/k36/k40
    * transcendental recipe, with the flag comparing the ROUND-4 value on
    * both engines. Scale: map-only (one Generate-free projection — the
    * features come from `size(...)` over one split), no shuffle, no
    * state; at 100 TB this is the cheapest possible operator class. */
  val k69: Q = Q(
    "k69_quality_classifier",
    s"""WITH f AS (
       |  SELECT doc_id,
       |    LEN(STRING_SPLIT(text, ' ')) AS nt,
       |    LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS nu,
       |    LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
       |                    t -> t IN ('a', 'the'))) AS ns,
       |    LENGTH(text) AS nc
       |  FROM documents),
       |z AS (
       |  SELECT doc_id, nt,
       |    (${K69("wu")} * nu + ${K69("wt")} * nt + ${K69("ws")} * ns
       |     + ${K69("wc")} * nc + ${K69("b")}) AS zi
       |  FROM f)
       |SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
       |  ROUND(1.0 / (1.0 + EXP(-(CAST(zi AS DOUBLE) / 1000.0))), 4) + 0.0
       |    AS score,
       |  CAST(CASE WHEN ROUND(1.0 / (1.0 + EXP(-(CAST(zi AS DOUBLE)
       |    / 1000.0))), 4) > 0.5 THEN 1 ELSE 0 END AS INT) AS selected
       |FROM z ORDER BY doc_id ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      val toks = split(col("text"), " ")
      val zi = lit(K69("wu")) * size(array_distinct(toks)) +
        lit(K69("wt")) * size(toks) +
        lit(K69("ws")) * size(expr("filter(split(text, ' '), t -> t IN ('a', 'the'))")) +
        lit(K69("wc")) * length(col("text")) + lit(K69("b"))
      val score = round(lit(1.0) / (lit(1.0) + exp(-(zi.cast("double") / lit(1000.0)))), 4) + 0.0
      Tables.documents(s, dir)
        .select(col("doc_id"),
                size(toks).cast("long").as("n_tokens"),
                score.as("score"),
                when(score > 0.5, 1).otherwise(0).cast("int").as("selected"))
        .orderBy(asc_nulls_last("doc_id"))
    })

  def ops: Vector[Q] = Vector(c21, c22, c23, k69)
}
