package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance — the ClickHouse
  * materialized-view + SummingMergeTree / AggregatingMergeTree semantics
  * [public: ClickHouse MV + MergeTree docs] on Spark: an aggregate MV is a
  * keyed table of MERGEABLE partial-aggregate states, so applying a delta is
  * "aggregate the delta, union the states, re-aggregate by key" — never a
  * full recompute over the base.
  *
  * State shape per key: `__cnt` (rows), `__cntv` (non-null values), `__sum`
  * (DECIMAL(38,6) — exact, so merge order cannot perturb low bits; SURVEY §2
  * rule: never merge raw doubles). All three are commutative monoids, hence
  * `merge` is associative and order-independent — pinned in MvSpec.
  *
  * The state stays at the FULL decimal width end-to-end and narrows only at
  * [[finalizeState]]'s double cast: values are read at (18,6) but sums
  * accumulate at (38,6), because in Spark's default non-ANSI mode a decimal
  * cast overflow yields NULL silently — a long-lived MV state re-cast to
  * (18,6) on every merge would quietly drop hot keys' sums once
  * |sum| ≥ 10¹². At (38,6) overflow needs |sum| ≥ 10³², beyond any real
  * corpus at 100 TB.
  *
  * Scale: `aggState` is one hash aggregate over the delta only (map-side
  * partial combine, shuffle = |distinct keys|); `merge` shuffles state rows,
  * which are |keys|-sized, not |rows|-sized. At 100 TB the MV state is the
  * small side: re-aggregating it with each delta batch is the same cost
  * profile as a ClickHouse background merge.
  */
object Mv {

  /** Build (or delta-build) the partial-aggregate state for an insert-only
    * batch. */
  def aggState(rows: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__cnt"),
           count(col(valueCol)).as("__cntv"),
           sum(col(valueCol).cast("decimal(18,6)"))
             .cast("decimal(38,6)").as("__sum"))

  /** CollapsingMergeTree-style signed state: `signCol` = +1 insert / -1
    * retraction. A retraction batch cancels previously-merged inserts
    * row-for-row; keys whose state collapses to zero rows vanish at
    * [[finalizeState]] (n = 0 filtered). */
  def aggStateSigned(rows: DataFrame, keys: Seq[String], valueCol: String,
                     signCol: Column): DataFrame =
    rows.groupBy(keys.map(col): _*)
      .agg(sum(signCol.cast("long")).as("__cnt"),
           sum(when(col(valueCol).isNotNull, signCol.cast("long"))
                 .otherwise(lit(0L))).as("__cntv"),
           sum(signCol.cast("decimal(2,0)") *
               col(valueCol).cast("decimal(18,6)"))
             .cast("decimal(38,6)").as("__sum"))

  /** Merge any number of state frames (base MV + one or more deltas) into
    * one state frame. Associative and commutative: states are monoid sums. */
  def merge(keys: Seq[String], states: DataFrame*): DataFrame =
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__cnt")).as("__cnt"),
           sum(col("__cntv")).as("__cntv"),
           // sum over (38,6) stays (38,6) — no narrowing re-cast here (a
           // (18,6) re-cast would NULL silently past 10^12; see scaladoc)
           sum(col("__sum")).as("__sum"))

  /** Build (or delta-build) a mergeable DISTINCT-COUNT state per key: a
    * DataSketches HLL sketch over `distinctCol` [public: Spark 3.5+
    * hll_sketch_agg / Apache DataSketches]. COUNT(DISTINCT) is the one
    * common MV aggregate that is NOT a cheap monoid on scalars — exact
    * distinct state is the value set itself — so the 100 TB MV carries the
    * sketch: fixed bytes per key, and union is the monoid merge. Pair with
    * [[mergeDistinct]] + `hll_sketch_estimate` at read time. The union is
    * order-invariant and idempotent (register-wise max), but a unioned
    * sketch's estimate can differ from the directly-built sketch's by a
    * hair (the union accumulator is a wider HLL type than the build
    * target) — both sit within the sketch's error bound of exact, which is
    * what MvSpec pins. */
  def aggStateDistinct(rows: DataFrame, keys: Seq[String],
                       distinctCol: String, lgK: Int = 12): DataFrame =
    rows.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(distinctCol), lit(lgK)).as("__hll"))

  /** Merge distinct-count states: HLL union is associative, commutative,
    * and idempotent (re-merging an already-merged delta cannot overcount —
    * stronger than the scalar states, which are add-once). */
  def mergeDistinct(keys: Seq[String], states: DataFrame*): DataFrame =
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col("__hll"), lit(true)).as("__hll"))

  /** Resolve distinct state → per-key approximate distinct count. */
  def finalizeDistinct(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) :+
      hll_sketch_estimate(col("__hll")).as("n_distinct"): _*)

  /** Resolve state → the user-facing MV: n / sum_value / avg_value per key.
    * avg rounds at 4 places over the exact decimal sum (Determinism.davg
    * contract). Zero-collapsed keys (signed retraction) are dropped. */
  def finalizeState(state: DataFrame, keys: Seq[String]): DataFrame =
    state.filter(col("__cnt") > 0)
      .select(keys.map(col) ++ Seq(
        col("__cnt").as("n"),
        col("__sum").cast("double").as("sum_value"),
        round(col("__sum").cast("double") / col("__cntv"), 4).as("avg_value")): _*)
}
