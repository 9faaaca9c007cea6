package graft.engine

import org.apache.spark.sql.functions._
import graft.engine.Determinism.dsumSql

/** Round-16 third batch (builder-internal r20c): k71 extends the r19
  * targeted-selection tier (k58 DSIR, k62 KL, k51/k68 mixture statistics)
  * with the canonical mixture-REWEIGHTING algorithm those statistics
  * feed. */
object Round20cOps {

  /** DoReMi hyper-parameters, frozen (the k57/k69 frozen-table
    * discipline): step size η and the uniform-smoothing mass c from the
    * paper's §3 posture. */
  private val Eta = 0.5
  private val Smooth = 0.01

  /** k71 — DoReMi domain-weight update [public: Xie et al. 2023,
    * "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    * Pretraining", §3 Group DRO update — the multiplicative-weights step
    * w' ∝ w·exp(η·excess), renormalized and smoothed toward uniform] —
    * the mixture-reweighting move the r19 tier's statistics exist to
    * drive: k51 measures the mixture, k62 scores divergence, THIS
    * updates the weights. The per-domain "excess loss" is the k69
    * frozen-classifier z-score's deviation from the corpus mean (the
    * honest offline proxy — no reference-model losses exist in the
    * fixture; the UPDATE RULE, which is what the query declares, is
    * identical for any bounded per-domain signal). TWO rounds are
    * declared (w1 from uniform, w2 from w1) so the general w·exp form is
    * exercised, not just the softmax special case.
    *
    * Determinism: per-source z sums and counts ride the decimal route →
    * mean z and excess are identical bits; each exp term is ROUNDED TO
    * THE 1e-8 GRID BEFORE the normalizing sum (grid values are exact in
    * DECIMAL(28,10), so the 20-term sum is merge-order-free — the
    * k60-class recipe extended to a normalization), every division is
    * one double op on identical bits, and outputs are ROUND-6. Scale:
    * one fact pass (the k69 map-only features) into a SOURCE-sized
    * frame; every cross-term (mean, normalizers) is a 1-row broadcast
    * over the source domain — at 100 TB the update costs one scan. */
  val k71: Q = Q(
    "k71_doremi_update",
    s"""WITH f AS (
       |  SELECT source,
       |    (${Round20Ops.K69("wu")} * LEN(LIST_DISTINCT(STRING_SPLIT(text, ' ')))
       |     + ${Round20Ops.K69("wt")} * LEN(STRING_SPLIT(text, ' '))
       |     + ${Round20Ops.K69("ws")} * LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
       |                            t -> t IN ('a', 'the')))
       |     + ${Round20Ops.K69("wc")} * LENGTH(text)
       |     + ${Round20Ops.K69("b")}) AS zi
       |  FROM documents),
       |s AS (
       |  SELECT source,
       |    ${dsumSql("CAST(zi AS DOUBLE) / 1000.0")} / COUNT(*) AS mz,
       |    CAST(COUNT(*) AS BIGINT) AS n_docs
       |  FROM f GROUP BY 1),
       |g AS (SELECT ${dsumSql("mz")} / COUNT(*) AS gz,
       |             CAST(COUNT(*) AS DOUBLE) AS k FROM s),
       |e AS (SELECT source, n_docs, mz - gz AS excess, k FROM s, g),
       |r1 AS (SELECT source, n_docs, excess, k,
       |         ROUND(EXP($Eta * excess), 8) AS t1 FROM e),
       |n1 AS (SELECT CAST(SUM(CAST(t1 AS DECIMAL(28,10))) AS DOUBLE) AS w1s
       |       FROM r1),
       |w1 AS (SELECT source, n_docs, excess, k,
       |         (1.0 - $Smooth) * (t1 / w1s) + $Smooth / k AS w1
       |       FROM r1, n1),
       |r2 AS (SELECT source, n_docs, excess, k, w1,
       |         ROUND(w1 * EXP($Eta * excess), 8) AS t2 FROM w1),
       |n2 AS (SELECT CAST(SUM(CAST(t2 AS DECIMAL(28,10))) AS DOUBLE) AS w2s
       |       FROM r2)
       |SELECT source, n_docs,
       |  ROUND(excess, 6) + 0.0 AS excess,
       |  ROUND(w1, 6) + 0.0 AS w1,
       |  ROUND((1.0 - $Smooth) * (t2 / w2s) + $Smooth / k, 6) + 0.0 AS w2
       |FROM r2, n2
       |ORDER BY source ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      // the k69 frozen weights, shared — the classifier IS the signal
      val K = Round20Ops.K69
      val toks = split(col("text"), " ")
      val zi = lit(K("wu")) * size(array_distinct(toks)) +
        lit(K("wt")) * size(toks) +
        lit(K("ws")) * size(expr("filter(split(text, ' '), t -> t IN ('a', 'the'))")) +
        lit(K("wc")) * length(col("text")) + lit(K("b"))
      k71FromZi(Tables.documents(s, dir)
        .select(col("source"), zi.as("zi"))
        .groupBy("source")
        .agg(sum(col("zi")).as("sum_zi"),
             count(lit(1)).cast("long").as("n_docs")))
    })

  /** The DoReMi finisher over per-source (Σ zi, n) sufficient statistics
    * — SHARED with the streaming twin (StreamingDoremi carries exactly
    * these two longs per source), so stream state ≡ batch aggregate ⟹
    * outputs bit-equal by construction. Σ zi is an EXACT int64 (the
    * integer dot products sum without rounding), so mz = (Σzi as
    * double)/1000/n reproduces the oracle's decimal-route mean bit for
    * bit: sum_zi casts to double exactly (far below 2^53) and the IEEE
    * divide by 1000.0 is correctly rounded — the same nearest double the
    * oracle's DECIMAL(18,6) sum-then-cast lands on. */
  def k71FromZi(stats: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    def gridSum(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(28,10)")).cast("double")
    val perSource = stats.select(col("source"),
      ((col("sum_zi").cast("double") / lit(1000.0)) / col("n_docs")).as("mz"),
      col("n_docs"))
    val global = perSource.agg(
      (Determinism.dsum(col("mz")) / count(lit(1))).as("gz"),
      count(lit(1)).cast("double").as("k"))
    val e = perSource.crossJoin(broadcast(global))
      .withColumn("excess", col("mz") - col("gz"))
    val r1 = e.withColumn("t1", round(exp(lit(Eta) * col("excess")), 8))
    val n1 = r1.agg(gridSum(col("t1")).as("w1s"))
    val w1 = r1.crossJoin(broadcast(n1))
      .withColumn("w1", (lit(1.0) - lit(Smooth)) * (col("t1") / col("w1s"))
                          + lit(Smooth) / col("k"))
    val r2 = w1.withColumn("t2",
      round(col("w1") * exp(lit(Eta) * col("excess")), 8))
    val n2 = r2.agg(gridSum(col("t2")).as("w2s"))
    r2.crossJoin(broadcast(n2))
      .select(col("source"), col("n_docs"),
              (round(col("excess"), 6) + 0.0).as("excess"),
              (round(col("w1"), 6) + 0.0).as("w1"),
              (round((lit(1.0) - lit(Smooth)) * (col("t2") / col("w2s"))
                       + lit(Smooth) / col("k"), 6) + 0.0).as("w2"))
      .orderBy(asc_nulls_last("source"))
  }

  def ops: Vector[Q] = Vector(k71)
}
