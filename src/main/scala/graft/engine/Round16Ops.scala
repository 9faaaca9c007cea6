package graft.engine

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-16 declared queries — the r13 brief's item 3: the ExactSubstr
  * dedup modality [public: Lee et al. 2022, "Deduplicating Training Data
  * Makes Language Models Better", §3.1 ExactSubstr], the span-level gap
  * between k34's fixed n-grams and k39's stride-aligned chunks.
  *
  *  - `k44_exact_substr_spans` — duplicate ≥20-token SPANS across
  *    documents at stride 1, with the keep-min removal accounting.
  *
  * Every query follows the SURVEY §2 determinism rules (explicit NULLS,
  * total ORDER BY, integer-exact arithmetic except the declared ROUND-4
  * ratio).
  */
object Round16Ops {

  // ---------------------------------------------------------------- k44

  /** k44 — ExactSubstr span-level dedup accounting [public: Lee et al.
    * 2022 §3.1]: for every 20-token window at STRIDE 1, is its exact text
    * shared with any OTHER document, and would keep-min canonicalization
    * (k01's discipline, applied per span) remove it here? Genuinely a
    * third duplication predicate next to k34/k39: k34's 3-grams fire on
    * any shared trigram (too fine to score span mass), k39's chunks are
    * stride-ALIGNED (a duplicated paragraph straddling a chunk boundary
    * evades it); stride-1 spans catch every ≥20-token verbatim overlap
    * wherever it sits. Output per doc: span count, cross-doc-duplicated
    * span count, spans removed under keep-min (doc ≠ min holder), and the
    * duplicated fraction (ROUND 4 — the repo's float class, cf. k36).
    *
    * Scale shape (the Lee et al. suffix-array pass re-expressed as
    * Spark relational ops): ONE shingling Generate (md5 digests, never
    * span text, cross the shuffle — 32 hex chars regardless of span
    * width), then cross-doc duplication decided WITHOUT a join: dup iff
    * min(doc) < max(doc) over a digest-partitioned window, keep-min
    * removal iff doc ≠ that min (the k34 df-via-window pattern — a
    * self-join would shingle the corpus twice; window-group size = span
    * document frequency, the same accepted hazard class). Stride-1 cost
    * is W× the corpus — the known ExactSubstr price, linear in data and
    * embarrassingly partitioned; no state outlives a digest group.
    * Plan-pinned in PlanShapeSpec: exactly one Generate, no join.
    * Probe-gated at 10× (dense corpus: replica-suffixed tokens make
    * replica span sets disjoint, so rows and per-doc counts are exactly
    * 10× — BASELINE.md). The ORACLE decides duplication via a
    * GROUP-BY + digest-keyed JOIN instead — independent formulations.
    * Docs under 20 tokens have no spans and are absent from BOTH engines
    * by construction. */
  val k44: Q = Q(
    "k44_exact_substr_spans",
    """WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents),
      |sp AS (SELECT doc_id, MD5(ARRAY_TO_STRING(toks[st : st + 19], ' ')) AS d
      |       FROM (SELECT doc_id, UNNEST(RANGE(1, LEN(toks) - 18)) AS st, toks
      |             FROM t WHERE LEN(toks) >= 20)),
      |dd AS (SELECT d, MIN(doc_id) AS dmin, MAX(doc_id) AS dmax
      |       FROM sp GROUP BY d)
      |SELECT sp.doc_id AS doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_spans,
      |  CAST(SUM(CASE WHEN dd.dmin < dd.dmax THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_dup_spans,
      |  CAST(SUM(CASE WHEN dd.dmin < dd.dmax AND sp.doc_id <> dd.dmin
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_removed_spans,
      |  ROUND(SUM(CASE WHEN dd.dmin < dd.dmax THEN 1 ELSE 0 END) * 1.0
      |        / COUNT(*), 4) AS dup_frac
      |FROM sp JOIN dd USING (d)
      |GROUP BY 1
      |ORDER BY doc_id ASC NULLS LAST""".stripMargin,
    (s, dir) => k44Plan(Tables.documents(s, dir)))

  /** The k44 plan body, factored so Round16Spec can drive the REAL plan
    * on synthetic frames (the h46Plan discipline). */
  def k44Plan(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sp = docs
      .select(col("doc_id"), split(col("text"), " ").as("__t"))
      .filter(size(col("__t")) >= 20)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(__t) - 19), " +
          "st -> md5(concat_ws(' ', slice(__t, st, 20))))")).as("d"))
    val wd = Window.partitionBy("d")
    val dup = col("__dmin") < col("__dmax")
    sp.withColumn("__dmin", min(col("doc_id")).over(wd))
      .withColumn("__dmax", max(col("doc_id")).over(wd))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
           sum(when(dup, 1).otherwise(0)).cast("long").as("n_dup_spans"),
           sum(when(dup && col("doc_id") =!= col("__dmin"), 1).otherwise(0))
             .cast("long").as("n_removed_spans"))
      .withColumn("dup_frac",
        round(col("n_dup_spans") * lit(1.0) / col("n_spans"), 4))
      .orderBy(asc_nulls_last("doc_id"))
  }

  def ops: Vector[Q] = Vector(k44)
}
