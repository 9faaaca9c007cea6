package graft.engine

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-16 declared queries — the r13 brief's item 3 and its two
  * natural siblings: the ExactSubstr dedup modality [public: Lee et al.
  * 2022, "Deduplicating Training Data Makes Language Models Better",
  * §3.1 ExactSubstr], the span-level gap between k34's fixed n-grams
  * and k39's stride-aligned chunks.
  *
  *  - `k44_exact_substr_spans` — duplicate ≥20-token SPANS across
  *    documents at stride 1, with the keep-min removal accounting.
  *  - `k45_exact_substr_decontam` — the same span predicate pointed at
  *    train→eval leakage: contaminated span mass per eval doc with the
  *    min train witness (k24/k34's split discipline).
  *  - `k46_longest_dup_span` — longest duplicated span length per doc
  *    via gaps-and-islands over consecutive duplicated positions.
  *  - `k47_top_dup_spans` — the boilerplate detector: top-20 spans by
  *    distinct-document count, text recovered map-side.
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
        Spans.DigestsExpr)).as("d"))
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

  // ---------------------------------------------------------------- k45

  /** k45 — span-level train/eval DECONTAMINATION (ExactSubstr × k24's
    * split discipline; [public: Lee et al. 2022 §6.2 apply dedup to
    * train–test leakage; Brown et al. 2020 §C use n-gram collision —
    * k34 declares that form]): for every eval (val/test) doc, how many
    * of its stride-1 20-token spans appear VERBATIM in some train doc,
    * with the minimum train witness. A genuinely distinct predicate from
    * k34: 3-grams fire on any shared trigram (selective but span-mass-
    * blind), this measures the CONTAMINATED SPAN MASS at ≥20-token
    * verbatim granularity — the denominator-bearing form (n_contam /
    * n_spans is the leakage fraction) — and reports ALL eval docs, not
    * just contaminated ones (an all-clear is a result too).
    *
    * Scale shape: k44's one shingling Generate, split assignment joined
    * on doc_id (corpus-sized but key-joined, no text), then the per-span
    * train witness rides a digest-partitioned window min (k34's
    * df-via-window pattern — no digest self-join, corpus shingled ONCE);
    * eval rows filter and hash-aggregate per doc. Same window-group
    * hazard class as k34/k44 (span document frequency). The ORACLE
    * builds the train witness via GROUP-BY + LEFT JOIN on the digest —
    * independent formulations. */
  val k45: Q = Q(
    "k45_exact_substr_decontam",
    """WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents),
      |sp AS (SELECT doc_id, MD5(ARRAY_TO_STRING(toks[st : st + 19], ' ')) AS d
      |       FROM (SELECT doc_id, UNNEST(RANGE(1, LEN(toks) - 18)) AS st, toks
      |             FROM t WHERE LEN(toks) >= 20)),
      |s AS (SELECT doc_id,
      |    CASE WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'c' THEN 'train'
      |         WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 1) = 'd' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents),
      |tmin AS (SELECT sp2.d, MIN(sp2.doc_id) AS m
      |         FROM sp sp2 JOIN s s2 USING (doc_id)
      |         WHERE s2.split = 'train' GROUP BY sp2.d)
      |SELECT e.doc_id AS doc_id, se.split AS split,
      |  CAST(COUNT(*) AS BIGINT) AS n_spans,
      |  CAST(SUM(CASE WHEN tmin.m IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_contam_spans,
      |  MIN(tmin.m) AS contaminated_by
      |FROM sp e JOIN s se USING (doc_id)
      |LEFT JOIN tmin ON tmin.d = e.d
      |WHERE se.split <> 'train'
      |GROUP BY 1, 2
      |ORDER BY doc_id ASC NULLS LAST""".stripMargin,
    (s, dir) => k45Plan(Tables.documents(s, dir)))

  /** The k45 plan body, factored so Round16Spec can drive the REAL plan
    * on synthetic frames (the h46Plan discipline). */
  def k45Plan(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sp = docs
      .select(col("doc_id"), split(col("text"), " ").as("__t"))
      .filter(size(col("__t")) >= 20)
      .select(col("doc_id"), explode(expr(
        Spans.DigestsExpr)).as("d"))
    val h1 = substring(md5(col("doc_id").cast("string")), 1, 1)
    val splits = docs.select(
      col("doc_id"),
      when(h1 <= "c", "train").when(h1 === "d", "val")
        .otherwise("test").as("split"))
    val wg = Window.partitionBy("d")
    sp.join(splits, "doc_id")
      .withColumn("__tmin",
        min(when(col("split") === "train", col("doc_id"))).over(wg))
      .filter(col("split") =!= "train")
      .groupBy(col("doc_id"), col("split"))
      .agg(count(lit(1)).as("n_spans"),
           sum(when(col("__tmin").isNotNull, 1).otherwise(0))
             .cast("long").as("n_contam_spans"),
           min(col("__tmin")).as("contaminated_by"))
      .orderBy(asc_nulls_last("doc_id"))
  }

  // ---------------------------------------------------------------- k46

  /** k46 — LONGEST duplicated REGION per doc (the duplicate-length
    * statistic of dedup analyses [public: Lee et al. 2022 report
    * duplicate-length distributions; their ExactSubstr removal excises
    * exactly these regions]): consecutive duplicated stride-1 positions
    * form islands, and a run of R consecutive duplicated 20-token
    * windows covers a contiguous R + 19-token region every window of
    * which is shared with SOME other document — the region span-level
    * removal would excise. Deliberately a REGION statistic, not a
    * longest-common-substring: windows of one run may match DIFFERENT
    * partner docs, so the region need not appear verbatim in any single
    * partner (pinned on a two-partner synthetic in Round16Spec; with one
    * partner the two coincide, and the region length upper-bounds the
    * longest single-partner overlap). Also reports the island count (the
    * fixture's dup regions are single-island; the multi-region case is
    * pinned on a synthetic frame in Round16Spec).
    *
    * Scale shape: k44's shingling (positions kept via posexplode), dup
    * decided by the same digest-window min/max, then the gaps-and-
    * islands trick — st − row_number per doc — needs ONE doc-partitioned
    * window over only the DUPLICATED positions (a tiny filtered frame),
    * and two hash aggs sized by island count. The ORACLE reruns the
    * identical islands arithmetic over its join-based dup set —
    * formulations share the arithmetic but derive duplication
    * independently (window vs GROUP-BY + join, the k44 pairing). */
  val k46: Q = Q(
    "k46_longest_dup_span",
    """WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents),
      |sp AS (SELECT doc_id, st, MD5(ARRAY_TO_STRING(toks[st : st + 19], ' ')) AS d
      |       FROM (SELECT doc_id, UNNEST(RANGE(1, LEN(toks) - 18)) AS st, toks
      |             FROM t WHERE LEN(toks) >= 20)),
      |dd AS (SELECT d, MIN(doc_id) AS dmin, MAX(doc_id) AS dmax
      |       FROM sp GROUP BY d),
      |f AS (SELECT sp.doc_id, sp.st
      |      FROM sp JOIN dd USING (d) WHERE dd.dmin < dd.dmax),
      |isl AS (SELECT doc_id, st,
      |          st - ROW_NUMBER() OVER (PARTITION BY doc_id
      |                                  ORDER BY st ASC NULLS LAST) AS g
      |        FROM f)
      |SELECT doc_id,
      |  CAST(MAX(run) + 19 AS BIGINT) AS max_dup_run_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS n_dup_regions
      |FROM (SELECT doc_id, g, COUNT(*) AS run FROM isl GROUP BY doc_id, g)
      |GROUP BY doc_id
      |ORDER BY doc_id ASC NULLS LAST""".stripMargin,
    (s, dir) => k46Plan(Tables.documents(s, dir)))

  /** The k46 plan body, factored so Round16Spec can drive the REAL plan
    * on synthetic frames (the h46Plan discipline). */
  def k46Plan(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sp = docs
      .select(col("doc_id"), split(col("text"), " ").as("__t"))
      .filter(size(col("__t")) >= 20)
      .select(col("doc_id"), posexplode(expr(
        Spans.DigestsExpr)))
      .select(col("doc_id"), (col("pos") + 1).as("st"), col("col").as("d"))
    val wd = Window.partitionBy("d")
    val wdoc = Window.partitionBy("doc_id").orderBy(asc_nulls_last("st"))
    sp.withColumn("__dmin", min(col("doc_id")).over(wd))
      .withColumn("__dmax", max(col("doc_id")).over(wd))
      .filter(col("__dmin") < col("__dmax"))
      .withColumn("__g", col("st") - row_number().over(wdoc))
      .groupBy(col("doc_id"), col("__g"))
      .agg(count(lit(1)).as("run"))
      .groupBy(col("doc_id"))
      .agg((max(col("run")) + 19).cast("long").as("max_dup_run_tokens"),
           count(lit(1)).cast("long").as("n_dup_regions"))
      .orderBy(asc_nulls_last("doc_id"))
  }

  // ---------------------------------------------------------------- k47

  /** k47 — TOP duplicated spans (the boilerplate detector: Gopher/
    * RefinedWeb-style corpus analyses surface the most-repeated verbatim
    * passages — headers, license blocks, templates — before choosing
    * dedup thresholds [public: Rae et al. 2021 §A3.2 report repeated-
    * passage analyses; Penedo et al. 2023 line-dedup]): the 20 stride-1
    * 20-token spans shared by the MOST distinct documents, with their
    * recovered text, occurrence count, and first holder. Deterministic
    * top-k: ties on n_docs break on the digest (unique → total order).
    *
    * Scale shape: ONE shingling Generate carrying (digest, text); the
    * per-digest agg is map-combined (min(text)/min(doc) collapse to one
    * row per distinct digest per partition BEFORE the shuffle, so span
    * text crosses the exchange once per distinct-digest-per-partition,
    * not per occurrence), countDistinct rides the standard two-phase
    * expand; the final top-20 is a TakeOrderedAndProject — no global
    * sort materializes. A join-back-for-text formulation was rejected:
    * it would shingle the corpus twice for a column the map-side combine
    * already bounds. */
  val k47: Q = Q(
    "k47_top_dup_spans",
    """WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents),
      |sp AS (SELECT doc_id,
      |         ARRAY_TO_STRING(toks[st : st + 19], ' ') AS s,
      |         MD5(ARRAY_TO_STRING(toks[st : st + 19], ' ')) AS d
      |       FROM (SELECT doc_id, UNNEST(RANGE(1, LEN(toks) - 18)) AS st, toks
      |             FROM t WHERE LEN(toks) >= 20))
      |SELECT d, MIN(s) AS span_text,
      |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |  CAST(COUNT(*) AS BIGINT) AS n_occurrences,
      |  MIN(doc_id) AS first_doc
      |FROM sp GROUP BY d
      |HAVING COUNT(DISTINCT doc_id) > 1
      |ORDER BY n_docs DESC, d ASC LIMIT 20""".stripMargin,
    (s, dir) => k47Plan(Tables.documents(s, dir)))

  /** The k47 plan body, factored so Round16Spec can drive the REAL plan
    * on synthetic frames (the h46Plan discipline). */
  def k47Plan(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    docs
      .select(col("doc_id"), split(col("text"), " ").as("__t"))
      .filter(size(col("__t")) >= 20)
      .select(col("doc_id"), explode(expr(
        Spans.TextsExpr)).as("s"))
      .select(col("doc_id"), col("s"), md5(col("s")).as("d"))
      .groupBy("d")
      .agg(min(col("s")).as("span_text"),
           countDistinct(col("doc_id")).cast("long").as("n_docs"),
           count(lit(1)).cast("long").as("n_occurrences"),
           min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") > 1)
      .orderBy(desc("n_docs"), asc_nulls_last("d"))
      .limit(20)
  }

  def ops: Vector[Q] = Vector(k44, k45, k46, k47)
}
