package graft.engine

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-18 batch (builder-internal r23): the r17 verdict's second growth
  * candidate — integer-exact weighted sampling, completing the sampling
  * family (a04 hash-fraction Bernoulli, k27 stratified, d31 bottom-k by
  * hash) with the weighted member pipelines use for source balancing. The
  * weighted-RESERVOIR vein stayed rejected (its priority key hash^(1/w) is
  * transcendental — no bit-exact cross-engine oracle); the SYSTEMATIC
  * cumulative-weight form is pure int64 arithmetic end to end.
  */
object Round23Ops {

  /** Per-source draw count (declared constant — ~10 of each source's 25
    * fixture docs get ≥1 hit, so the query exercises real selection, and
    * heavy docs take multiple hits, exercising the multiplicity law). */
  private val SampleN = 10L

  /** k76 — weighted systematic (PPS) sampling per source [public: Madow &
    * Madow 1944, "On the Theory of Systematic Sampling" — fixed-stride
    * selection along the cumulative weight axis is the classic
    * probability-proportional-to-size design; in a pretraining pipeline
    * this is the source-balanced token-budget draw: "take n slots per
    * source, docs hit in proportion to their token mass"]. With docs
    * ordered by doc_id inside each source, w = whitespace token count,
    * c = running Σw, W = source total, the n selection points are
    * t_j = floor(j·W/n), j = 0..n−1, and doc i is hit once per t_j in
    * [c_{i−1}, c_i). That membership count has a CLOSED FORM —
    *
    *   hits_i = ceil(c_i·n/W) − ceil(c_{i−1}·n/W),
    *   ceil(a/b) = (a + b − 1) div b  (a ≥ 0, b > 0)
    *
    * — so the whole draw is two window sums + floor-div arithmetic, no
    * iteration, no RNG (offset 0 is the declared deterministic variant;
    * a per-source offset parameter is the randomized form and changes
    * nothing structural). Laws (Round23Spec): Σ hits = n exactly per
    * source, and hits_i ∈ [floor(n·w_i/W), ceil(n·w_i/W)] — systematic
    * sampling's variance-free rounding of the real-valued share.
    *
    * Integer domain: w ≥ 1 always (string_split yields ≥ 1 token), so
    * W ≥ 1 and no division by zero on either engine; c·n ≤ W·n needs
    * W ≤ Long.Max/n — ~9·10¹⁷ tokens per source at n=10, far past any
    * corpus (the d-block decimal route applies beyond).
    *
    * Scale shape: ONE exchange on source serves both window passes (the
    * running sum and the source total share the partitioning), then
    * map-side arithmetic + filter — no join, nothing driver-side. The
    * per-source cumsum is order-sequential BY DECLARED SEMANTICS; at
    * 100 TB a single giant source sub-shards via the standard two-phase
    * prefix sum (per-shard partials broadcast as offsets — hits depend
    * only on (c, w, W), so the rewrite is semantics-preserving). */
  val k76: Q = Q(
    "k76_weighted_systematic",
    s"""WITH w AS (
       |  SELECT source, doc_id,
       |         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS w
       |  FROM documents),
       |c AS (
       |  SELECT source, doc_id, w,
       |    SUM(w) OVER (PARTITION BY source ORDER BY doc_id ASC) AS c,
       |    SUM(w) OVER (PARTITION BY source) AS tot
       |  FROM w)
       |SELECT source, doc_id, w,
       |  CAST((c * $SampleN + tot - 1) // tot
       |     - ((c - w) * $SampleN + tot - 1) // tot AS BIGINT) AS hits
       |FROM c
       |WHERE (c * $SampleN + tot - 1) // tot
       |    - ((c - w) * $SampleN + tot - 1) // tot >= 1
       |ORDER BY source ASC NULLS LAST, doc_id ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      val w = Tables.documents(s, dir)
        .select(col("source"), col("doc_id"),
                size(split(col("text"), " ")).cast("long").as("w"))
      val run = Window.partitionBy("source").orderBy(asc("doc_id"))
      val whole = Window.partitionBy("source")
      w.withColumn("c", sum("w").over(run))
        .withColumn("tot", sum("w").over(whole))
        .withColumn("hits", expr(
          s"(c * $SampleN + tot - 1) div tot " +
            s"- ((c - w) * $SampleN + tot - 1) div tot"))
        .filter(col("hits") >= 1)
        .select(col("source"), col("doc_id"), col("w"), col("hits"))
        .orderBy(asc_nulls_last("source"), asc_nulls_last("doc_id"))
    })

  def ops: Vector[Q] = Vector(k76)
}
