package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Approximate heavy hitters with BOUNDED mergeable state — the ClickHouse
  * `topK` / `topKWeighted` analog [public: CH docs; Misra & Gries 1982;
  * Metwally et al. SpaceSaving, ICDT'05]. Exact global top-k by frequency
  * (k21's shape) needs a full vocabulary aggregation — fine when the
  * vocabulary fits a shuffle, wrong when the value domain is unbounded
  * (URLs, user ids, raw n-grams at 100 TB). The Misra-Gries summary keeps
  * ≤ `capacity` counters per aggregation state, merges by counter addition
  * + rank-(capacity+1) subtraction, and guarantees:
  *
  *   - any value with true frequency > n/(capacity+1) SURVIVES;
  *   - every reported count is an UNDER-estimate by at most n/(capacity+1)
  *     (the summed subtraction slack), where n = rows aggregated.
  *
  * The per-state footprint is O(capacity) regardless of domain size, and
  * `merge` is the same bounded shape — so a 1000-executor partial
  * aggregation carries kilobytes per task, never the vocabulary.
  *
  * Which ties are dropped at the capacity boundary depends on merge order
  * (Spark's partial-agg tree is nondeterministic), so results are pinned
  * by the GUARANTEE, not by equality — the reason this is a Tier-2
  * capability, not a declared oracle query. For deterministic exact top-k
  * over a bounded vocabulary, use k21's hash-agg + TakeOrderedAndProject.
  */
object HeavyHitters {

  /** Bounded counter summary: `counts` holds ≤ capacity entries; `n` is the
    * total rows summarized (drives the error bound at read time). */
  final case class MgSummary(counts: Map[String, Long], n: Long)

  /** Misra-Gries aggregator over string values. `capacity` = max counters
    * held (error bound n/(capacity+1)); size it ≥ k/ε for top-k at
    * relative error ε. */
  final class MisraGries(capacity: Int)
      extends Aggregator[String, MgSummary, Seq[(String, Long)]]
      with Serializable {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")

    override def zero: MgSummary = MgSummary(Map.empty, 0L)

    override def reduce(b: MgSummary, x: String): MgSummary = {
      val c = b.counts
      val next =
        if (x == null) c // null tracks no counter, but still counts toward n
        else if (c.contains(x)) c.updated(x, c(x) + 1L)
        else if (c.size < capacity) c.updated(x, 1L)
        else c.flatMap { case (k, v) => // classic MG: decrement-all, drop zeros
          if (v > 1L) Some(k -> (v - 1L)) else None
        }
      MgSummary(next, b.n + 1L)
    }

    override def merge(a: MgSummary, b: MgSummary): MgSummary = {
      val m = (a.counts.keySet ++ b.counts.keySet).iterator
        .map(k => k -> (a.counts.getOrElse(k, 0L) + b.counts.getOrElse(k, 0L)))
        .toMap
      val trimmed =
        if (m.size <= capacity) m
        else {
          // subtract the (capacity+1)-th largest count from everyone and
          // drop the non-positive — the SpaceSaving-style merge that keeps
          // the survival + under-estimate guarantees additive
          val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
          m.flatMap { case (k, v) =>
            if (v - cut > 0L) Some(k -> (v - cut)) else None
          }
        }
      MgSummary(trimmed, a.n + b.n)
    }

    override def finish(r: MgSummary): Seq[(String, Long)] =
      r.counts.toSeq.sortBy { case (k, v) => (-v, k) }

    override def bufferEncoder: Encoder[MgSummary] = Encoders.product[MgSummary]
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Weighted Misra-Gries (the `topKWeighted` analog): each row carries a
    * non-negative long weight (bytes, revenue, token counts) and the
    * guarantees hold against TOTAL WEIGHT W — survival for weight share
    * > W/(capacity+1), under-estimate ≤ that slack. Same bounded state and
    * merge as the unweighted form (which is this with weight 1). */
  final class MisraGriesWeighted(capacity: Int)
      extends Aggregator[(String, Long), MgSummary, Seq[(String, Long)]]
      with Serializable {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    private val base = new MisraGries(capacity)

    override def zero: MgSummary = base.zero

    override def reduce(b: MgSummary, xw: (String, Long)): MgSummary = {
      val (x, w) = xw
      if (x == null || w <= 0L) MgSummary(b.counts, b.n + math.max(w, 0L))
      else {
        val c = b.counts
        val next =
          if (c.contains(x)) c.updated(x, c(x) + w)
          else if (c.size < capacity) c.updated(x, w)
          else {
            // decrement-all by min(w, smallest counter) and insert the
            // remainder — the weighted generalization of decrement-all
            val dec = math.min(w, c.values.min)
            val shrunk = c.flatMap { case (k, v) =>
              if (v - dec > 0L) Some(k -> (v - dec)) else None
            }
            if (w - dec > 0L && shrunk.size < capacity)
              shrunk.updated(x, w - dec)
            else shrunk
          }
        MgSummary(next, b.n + w)
      }
    }

    override def merge(a: MgSummary, b: MgSummary): MgSummary = base.merge(a, b)
    override def finish(r: MgSummary): Seq[(String, Long)] = base.finish(r)
    override def bufferEncoder: Encoder[MgSummary] = base.bufferEncoder
    override def outputEncoder: Encoder[Seq[(String, Long)]] = base.outputEncoder
  }

  /** Untyped weighted form: weight column cast to long. */
  def approxTopKWeighted(valueCol: Column, weightCol: Column,
                         k: Int, capacity: Int): Column = {
    require(k >= 1 && capacity >= k,
      s"need capacity >= k >= 1, got k=$k capacity=$capacity")
    val agg = udaf(new MisraGriesWeighted(capacity),
                   Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
    // NULL weights would hit the primitive-long encoder; treat as 0 (skip)
    slice(agg(valueCol, coalesce(weightCol.cast("long"), lit(0L))), 1, k)
  }

  /** Untyped column form, usable in any `groupBy(...).agg(...)`:
    * `df.groupBy("g").agg(HeavyHitters.approxTopK(col("v"), 10, 100))`.
    * Returns an array of (value, approx_count) structs, count-desc. */
  def approxTopK(valueCol: Column, k: Int, capacity: Int): Column = {
    require(k >= 1 && capacity >= k,
      s"need capacity >= k >= 1, got k=$k capacity=$capacity")
    val agg = udaf(new MisraGries(capacity), Encoders.STRING)
    slice(agg(valueCol), 1, k)
  }

  /** Per-group heavy hitters flattened to scalar rows (one row per kept
    * value — the rule-6-friendly shape): (groupCols…, value, approx_count,
    * rank). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   k: Int, capacity: Int): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approxTopK(col(valueCol), k, capacity).as("__tk"))
      .select(groupCols.map(col) :+ posexplode(col("__tk")): _*)
      .select(groupCols.map(col) ++ Seq(
        col("col._1").as("value"), col("col._2").as("approx_count"),
        (col("pos") + 1).as("rank")): _*)
}
