package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-17 declared queries — the mixture/scoring tier of the LLM-data
  * pipeline that sits AFTER dedup/decontamination (k01–k47) and BEFORE
  * export: conditional LM scoring, CCNet-style quality bucketing,
  * quality-based duplicate-cluster canonicalization, and Pile-style
  * domain mixture weights.
  *
  *  - `k48_bigram_logprob` — conditional bigram-LM surprise (k40's
  *    conditional sibling; the KenLM-proxy axis).
  *  - `k49_quality_buckets` — CCNet head/middle/tail terciles per
  *    source, decided by CUTOFFS (grid windows + broadcast), never a
  *    corpus NTILE.
  *  - `k50_cluster_canonical` — the keep-decision over k23's near-dup
  *    clusters: survivor = quality argmax (RefinedWeb's keep-longest).
  *  - `k51_domain_mixture` — per-source token mass → sampling rate /
  *    epochs against a uniform target mixture.
  *  - `k52_embedding_decontam` — SEMANTIC train→eval leakage: max train
  *    cosine + witness per eval vector (the paraphrase axis text dedup
  *    cannot see).
  *  - `k53_source_overlap_matrix` — cross-source verbatim-span overlap
  *    (the mirror-site / syndicated-boilerplate forensics matrix).
  *
  * Every query follows the SURVEY §2 determinism rules (explicit NULLS,
  * total ORDER BY, integer-exact arithmetic except the declared ROUND-4
  * float class).
  */
object Round17Ops {

  // ---------------------------------------------------------------- k48

  /** k48 — bigram-LM conditional log-probability (the KenLM-proxy face
    * of CCNet-style quality scoring [public: Wenzek et al. 2020 filter
    * on LM perplexity; Heafield 2011 KenLM]): per doc, the mean over
    * positions i ≥ 2 of −ln p(tᵢ | tᵢ₋₁) under the CORPUS bigram MLE
    * p(b|a) = c(a,b) / c(a,·). A genuinely distinct axis from k40's
    * unigram surprise: k40 sees rare TOKENS, this sees rare TRANSITIONS
    * (a doc of common words in an uncommon order scores high here and
    * low there). Scoring the corpus against itself makes every observed
    * bigram have nonzero count — the MLE is total, no smoothing knob.
    *
    * Scale shape: ONE bigram Generate feeding the per-doc TYPE-level
    * count frame tf (≪ occurrences), then the corpus bigram count
    * ct = Σc per (a, b) and head count ht = Σc per (a) are VOCAB-sized
    * hash aggregates over tf, hash-joined back (cf ⋈ hf first — both
    * type-level — then one (a, b) join against tf). The one-Generate
    * property survives WITHOUT a persist because all three tf consumers
    * share the identical (doc, a, b) exchange subtree and ReuseExchange
    * collapses them (the k54 vocab pattern; plan-pinned). Two earlier
    * formulations are on record: a first-cut join of OCCURRENCE-level
    * frames re-expanded the bigram Generate under every consumer (the
    * corpus was shingled 3× — rejected r14), and the r14 shipped plan
    * computed ct/ht as windows over tf partitioned by the bare token
    * key — correct, but a Zipf head's window partition holds one row
    * per (doc, successor type), i.e. grows with the CORPUS, and
    * WindowExec buffers whole partitions and cannot be skew-split
    * (the r14 judge finding). The hash-agg + join shape bounds every
    * aggregate by VOCAB size and leaves hot join keys to AQE skew
    * splitting, which a window partition can never get. The ORACLE
    * keeps its own occurrence-level join formulation, so the
    * mechanisms stay independent. Unlike k40 there is NO corpus-total
    * broadcast at all (heads normalize locally — the conditional's
    * denominator is per-key). `ln` rides the k20/k36/k40
    * IEEE recipe: both engines divide the same exact BIGINT counts as
    * doubles and take `ln` of identical bits; ROUND 4 absorbs ≤1-ulp
    * (the documented transcendental class). Docs with < 2 tokens have
    * no bigrams and are absent from BOTH engines by construction.
    * Threshold 3.45 probed to BITE at sf0.01: 17/500 docs flagged
    * (score range 3.2599-3.6446). */
  val k48: Q = Q(
    "k48_bigram_logprob",
    """WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents),
      |bg AS (SELECT doc_id, toks[i] AS a, toks[i + 1] AS b
      |       FROM (SELECT doc_id, UNNEST(RANGE(1, LEN(toks))) AS i, toks
      |             FROM t WHERE LEN(toks) >= 2)),
      |tf AS (SELECT doc_id, a, b, COUNT(*) AS c FROM bg GROUP BY 1, 2, 3),
      |cf AS (SELECT a, b, COUNT(*) AS ct FROM bg GROUP BY 1, 2),
      |hf AS (SELECT a, COUNT(*) AS ht FROM bg GROUP BY 1)
      |SELECT tf.doc_id AS doc_id,
      |  CAST(SUM(tf.c) AS BIGINT) AS n_bigrams,
      |  ROUND(-SUM(tf.c * LN(CAST(ct AS DOUBLE) / ht)) / SUM(tf.c), 4)
      |    AS mean_nll,
      |  CAST(CASE WHEN ROUND(-SUM(tf.c * LN(CAST(ct AS DOUBLE) / ht))
      |                       / SUM(tf.c), 4) > 3.45 THEN 1 ELSE 0 END AS INT)
      |    AS high_surprise
      |FROM tf JOIN cf USING (a, b) JOIN hf USING (a)
      |GROUP BY 1
      |ORDER BY doc_id ASC NULLS LAST""".stripMargin,
    (s, dir) => k48Plan(Tables.documents(s, dir)))

  /** The k48 plan body, factored so Round17Spec can drive the REAL plan
    * on synthetic frames (the h46Plan discipline). */
  def k48Plan(docs: DataFrame): DataFrame = {
    val bg = docs
      .select(col("doc_id"), split(col("text"), " ").as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(__t) - 1), " +
          "i -> named_struct('a', element_at(__t, i), " +
          "'b', element_at(__t, i + 1)))")).as("bg"))
      .select(col("doc_id"), col("bg.a").as("a"), col("bg.b").as("b"))
      // semantically a no-op (split yields no nulls) — but it equalizes the
      // null filters the (a, b) vs (a) joins would otherwise push asymmetrically
      // into the three tf consumers, which breaks exchange-subtree identity
      // and with it the ReusedExchange that keeps the Generate single
      .filter(col("a").isNotNull && col("b").isNotNull)
    val tf = bg.groupBy("doc_id", "a", "b").agg(count(lit(1)).as("c"))
    // vocab-sized corpus rates; cf ⋈ hf first so tf is joined exactly once
    val cf = tf.groupBy("a", "b").agg(sum(col("c")).as("ct"))
    val hf = tf.groupBy("a").agg(sum(col("c")).as("ht"))
    val meanNll = round(
      (-sum(col("c") * log(col("ct").cast("double") / col("ht"))))
        / sum(col("c")), 4)
    tf.join(cf.join(hf, "a"), Seq("a", "b"))
      .groupBy("doc_id")
      .agg(sum(col("c")).cast("long").as("n_bigrams"),
           meanNll.as("mean_nll"),
           when(meanNll > 3.45, 1).otherwise(0).cast("int")
             .as("high_surprise"))
      .orderBy(asc_nulls_last("doc_id"))
  }

  // ---------------------------------------------------------------- k49

  /** k49 — CCNet quality BUCKETS (head/middle/tail [public: Wenzek et
    * al. 2020 §4.3 split each language's corpus into equal-mass thirds
    * by LM perplexity and keep the head]): per SOURCE, docs land in the
    * tercile of their k40-style unigram surprise score. The declared
    * semantics are CUTOFF-based: c1/c2 = the smallest score whose
    * cumulative doc count reaches ⌈n/3⌉ / ⌈2n/3⌉, bucket by score ≤ c1
    * / ≤ c2 — so ALL docs tied at a cutoff score share a bucket
    * (NTILE would split such a tie by arbitrary position; the tie-down
    * rule is pinned on a synthetic straddle in Round17Spec).
    *
    * Scale shape — the reason cutoff semantics are declared at all: the
    * scores aggregate to a (source × rounded-score) GRID, the cumulative
    * window runs over that grid (grid-sized partitions, never a per-doc
    * sort), the two cutoffs fall out of one conditional-min agg (d59's
    * machinery), and docs bucket via a BROADCAST join of the
    * sources-sized cutoff frame — no corpus-wide NTILE partition, no
    * single-reducer window at any scale. The ORACLE derives the same
    * cutoffs by the order-statistics identity min{s : cum(s) ≥ k} =
    * score at rank k — a per-doc ROW_NUMBER formulation, genuinely
    * independent mechanism, provably equal. Scores ride k40's exact
    * recipe (identical double bits both engines, ROUND 4, documented
    * ≤1-ulp transcendental class); cutoff comparisons are
    * identical-bits-vs-identical-bits, so buckets agree wherever the
    * scores do. */
  val k49: Q = Q(
    "k49_quality_buckets",
    """WITH tok AS (SELECT doc_id, source, UNNEST(STRING_SPLIT(text, ' ')) AS t
      |             FROM documents),
      |tf AS (SELECT doc_id, source, t, COUNT(*) AS c FROM tok GROUP BY 1, 2, 3),
      |cf AS (SELECT t, COUNT(*) AS ct FROM tok GROUP BY 1),
      |n AS (SELECT COUNT(*) AS tot FROM tok),
      |per AS (
      |  SELECT tf.doc_id, tf.source,
      |    ROUND(-SUM(tf.c * LN(CAST(ct AS DOUBLE) / tot)) / SUM(tf.c), 4)
      |      AS score
      |  FROM tf JOIN cf ON tf.t = cf.t CROSS JOIN n
      |  GROUP BY 1, 2),
      |r AS (SELECT doc_id, source, score,
      |        ROW_NUMBER() OVER (PARTITION BY source
      |          ORDER BY score ASC NULLS LAST, doc_id ASC NULLS LAST) AS rn,
      |        COUNT(*) OVER (PARTITION BY source) AS n
      |      FROM per),
      |cut AS (SELECT source,
      |          MAX(CASE WHEN rn = (n + 2) // 3 THEN score END) AS c1,
      |          MAX(CASE WHEN rn = (2 * n + 2) // 3 THEN score END) AS c2
      |        FROM r GROUP BY 1)
      |SELECT r.doc_id AS doc_id, r.source AS source, r.score AS score,
      |  CASE WHEN r.score <= cut.c1 THEN 'head'
      |       WHEN r.score <= cut.c2 THEN 'middle'
      |       ELSE 'tail' END AS bucket
      |FROM r JOIN cut USING (source)
      |ORDER BY doc_id ASC NULLS LAST""".stripMargin,
    (s, dir) => k49Plan(Tables.documents(s, dir)))

  /** The k49 plan body, factored so Round17Spec can drive the REAL plan
    * on synthetic frames (the h46Plan discipline). */
  def k49Plan(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), col("source"),
                          explode(split(col("text"), " ")).as("t"))
    val tf = tok.groupBy("doc_id", "source", "t").agg(count(lit(1)).as("c"))
    val cf = tok.groupBy("t").agg(count(lit(1)).as("ct"))
    val tot = tok.agg(count(lit(1)).as("tot"))
    val per = tf.join(cf, "t")
      .crossJoin(broadcast(tot))
      .groupBy("doc_id", "source")
      .agg(round(
        (-sum(col("c") * log(col("ct").cast("double") / col("tot"))))
          / sum(col("c")), 4).as("score"))
    val grid = per.groupBy("source", "score").agg(count(lit(1)).as("__c"))
    val wcum = Window.partitionBy("source").orderBy(asc_nulls_last("score"))
    val wall = Window.partitionBy("source")
    val cut = grid
      .withColumn("__cum", sum(col("__c")).over(wcum))
      .withColumn("__n", sum(col("__c")).over(wall))
      .groupBy("source")
      .agg(min(when(col("__cum") >= expr("(__n + 2) div 3"), col("score")))
             .as("c1"),
           min(when(col("__cum") >= expr("(2 * __n + 2) div 3"), col("score")))
             .as("c2"))
    per.join(broadcast(cut), "source")
      .select(col("doc_id"), col("source"), col("score"),
        when(col("score") <= col("c1"), "head")
          .when(col("score") <= col("c2"), "middle")
          .otherwise("tail").as("bucket"))
      .orderBy(asc_nulls_last("doc_id"))
  }

  // ---------------------------------------------------------------- k50

  /** k50 — duplicate-cluster CANONICALIZATION by quality (the
    * keep-DECISION over k23's near-dup clusters [public: RefinedWeb,
    * Penedo et al. 2023, keep one representative per duplicate cluster;
    * Lee et al. 2022 keep the longest member]): per k23 cluster the
    * survivor is the member maximizing (n_chars DESC, doc_id ASC) — the
    * keep-longest rule with a total tie-break — and every doc reports
    * its cluster, its cluster's canonical doc, and whether it is kept.
    * k01 decides keep-min over EXACT-dup groups; this is the quality-
    * directed decision over NEAR-dup clusters — the step that turns
    * k23's labels into a kept corpus. Singletons are their own
    * canonical (kept = 1), so kept-count = cluster-count by
    * construction (spec-pinned).
    *
    * Scale shape: ConnectedComponents labels (the k23/k25 posture:
    * seed-and-contract, broadcast below the edge gate, trajectory
    * pinned in ScaleOpsSpec) + one corpus-sized KEY join to fetch
    * n_chars (never text), one component-keyed hash agg whose argmax is
    * `max(struct(n_chars, −doc_id))` (the k16/d61 single-agg argmax —
    * no window, no sort), and one component-keyed join back. The ORACLE
    * derives the survivor via ROW_NUMBER over the recursive-CTE
    * clusters — independent formulations of both the clusters (CC vs
    * recursive reachability) and the argmax (struct-max vs rank). */
  val k50: Q = Q(
    "k50_cluster_canonical",
    s"""WITH RECURSIVE ${PipelineOps.pairCte},
       |edge AS (SELECT id1 AS a, id2 AS b FROM pair
       |         UNION ALL SELECT id2 AS a, id1 AS b FROM pair),
       |reach(v, label) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.a, r.label FROM edge e JOIN reach r ON r.v = e.b),
       |cl AS (SELECT v AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY 1),
       |j AS (SELECT cl.doc_id, cl.cluster_id, d.n_chars
       |      FROM cl JOIN documents d USING (doc_id)),
       |canon AS (SELECT cluster_id, doc_id AS canonical_id FROM (
       |    SELECT cluster_id, doc_id,
       |      ROW_NUMBER() OVER (PARTITION BY cluster_id
       |        ORDER BY n_chars DESC NULLS LAST, doc_id ASC NULLS LAST) AS rn
       |    FROM j) WHERE rn = 1)
       |SELECT j.doc_id AS doc_id, j.cluster_id AS cluster_id,
       |  canon.canonical_id AS canonical_id,
       |  CAST(CASE WHEN j.doc_id = canon.canonical_id THEN 1 ELSE 0 END AS INT)
       |    AS kept
       |FROM j JOIN canon USING (cluster_id)
       |ORDER BY doc_id ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val labels = graft.operators.ConnectedComponents.assignContracted(
        docs.select("doc_id"), PipelineOps.jaccardEdges(s, dir),
        "doc_id", "id1", "id2")
      k50Plan(labels.select(col("doc_id"), col("component").as("cluster_id")),
              docs.select("doc_id", "n_chars"))
    })

  /** The k50 keep-decision body over precomputed (doc_id, cluster_id)
    * labels, factored so Round17Spec can drive the REAL argmax/join
    * shape on synthetic clusterings (the h46Plan discipline). */
  def k50Plan(labels: DataFrame, quality: DataFrame): DataFrame = {
    val j = labels.join(quality, "doc_id")
    val canon = j.groupBy("cluster_id")
      .agg(max(struct(col("n_chars"), (-col("doc_id")).as("__nd"))).as("__m"))
      .select(col("cluster_id"), (-col("__m.__nd")).as("canonical_id"))
    j.join(canon, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("canonical_id"),
        when(col("doc_id") === col("canonical_id"), 1).otherwise(0)
          .cast("int").as("kept"))
      .orderBy(asc_nulls_last("doc_id"))
  }

  // ---------------------------------------------------------------- k51

  /** k51 — domain MIXTURE weights (the Pile's Table-1 step [public: Gao
    * et al. 2020 report per-set epochs chosen against a target mixture;
    * DoReMi, Xie et al. 2023, tunes the same weights]): per source, the
    * token mass, its share of the corpus, and the up/down-sampling
    * arithmetic against a UNIFORM target — `sample_rate` = min(1,
    * target/actual) is the keep-probability a downsampler applies to an
    * over-represented source, `epochs` = ceil(target/actual) the pass
    * count an upsampler gives an under-represented one. k28 caps doc
    * COUNTS per source (a top-k gate); this is the token-MASS mixture
    * design — the knob the training run actually consumes.
    *
    * Scale shape: token counts via `size(split(…))` — map-only, NO
    * explode (the k28 counting trick), one source-keyed hash agg
    * (sources = domain-bounded), one 1-row broadcast for the corpus
    * total. All inputs exact BIGINTs; the divisions are identical
    * double bits on both engines, ROUND 4 presentational; `ceil` of an
    * exact-operand double (the k16 argument — only a value straddling
    * an integer boundary could diverge, impossible here because
    * target/actual is a ratio of exact integers ≥ 2⁻⁶³ apart). */
  val k51: Q = Q(
    "k51_domain_mixture",
    """WITH t AS (SELECT source,
      |    SUM(LEN(STRING_SPLIT(text, ' '))) AS toks,
      |    COUNT(*) AS n_docs
      |  FROM documents GROUP BY 1),
      |tot AS (SELECT SUM(toks) AS tot, COUNT(*) AS n_src FROM t)
      |SELECT source,
      |  CAST(toks AS BIGINT) AS n_tokens,
      |  CAST(n_docs AS BIGINT) AS n_docs,
      |  ROUND(CAST(toks AS DOUBLE) / tot, 4) AS share,
      |  ROUND(LEAST(1.0, (CAST(tot AS DOUBLE) / n_src) / toks), 4)
      |    AS sample_rate,
      |  CAST(CEIL((CAST(tot AS DOUBLE) / n_src) / toks) AS BIGINT) AS epochs
      |FROM t CROSS JOIN tot
      |ORDER BY source ASC NULLS LAST""".stripMargin,
    (s, dir) => k51Plan(Tables.documents(s, dir)))

  /** The k51 plan body, factored so Round17Spec can drive the REAL plan
    * on synthetic frames (the h46Plan discipline). */
  def k51Plan(docs: DataFrame): DataFrame = {
    val t = docs
      .select(col("source"),
              size(split(col("text"), " ")).cast("long").as("__ntok"))
      .groupBy("source")
      .agg(sum(col("__ntok")).as("toks"), count(lit(1)).as("n_docs"))
    val tot = t.agg(sum(col("toks")).as("tot"),
                    count(lit(1)).as("n_src"))
    val target = col("tot").cast("double") / col("n_src")
    t.crossJoin(broadcast(tot))
      .select(
        col("source"),
        col("toks").cast("long").as("n_tokens"),
        col("n_docs").cast("long").as("n_docs"),
        round(col("toks").cast("double") / col("tot"), 4).as("share"),
        round(least(lit(1.0), target / col("toks")), 4).as("sample_rate"),
        ceil(target / col("toks")).cast("long").as("epochs"))
      .orderBy(asc_nulls_last("source"))
  }

  // ---------------------------------------------------------------- k52

  /** k52 — SEMANTIC train→eval decontamination (the embedding-space
    * face of the k24/k45 split discipline [public: SemDeDup, Abbas et
    * al. 2023, use embedding cosine to find semantic duplicates; GPT-4
    * -era reports decontaminate eval sets against near-duplicate
    * training examples, not just verbatim text]): for every eval
    * (val/test) vector, the MAX cosine against ANY train vector, the
    * nearest train witness, and a contaminated flag — the leakage text
    * dedup cannot see (a paraphrase shares no 20-token span but sits at
    * cosine ≈ 1). Reports ALL eval vectors (k45's all-clear posture).
    * Determinism: cosine ROUND-4 BEFORE the argmax, ties at the rounded
    * precision break to the MIN train id (k03's rule, total order);
    * threshold 0.42 probed to BITE at sf0.01 (7/96 eval vectors
    * flagged; fixture max cross-split cosine 0.5128 — the synthetic
    * embeddings carry no planted near-identical cross-split pair, so
    * the flag marks the nearest-neighbor TAIL, which is the posture a
    * real deployment tunes anyway).
    *
    * Scale shape: the exact regime is a deliberate eval × train
    * Cartesian — decontamination needs the all-pairs truth, and this
    * face is the ORACLE-GATED exact regime of the stack whose 100 TB
    * path is k43's IVF probe shortlist (top-1, nprobe budget; recall
    * floors pinned in ScaleOpsSpec). Both sides unit-normalize ONCE
    * behind Exchange/broadcast barriers (the k07 CollapseProject
    * hazard: un-barriered, the normalization re-runs per PAIR), the
    * argmax is one `max(struct(sim, −tid))` hash agg (k16's pattern —
    * partial aggregation runs map-side, so the Cartesian never
    * materializes to a shuffle). The ORACLE derives max via GROUP-BY
    * and the witness via an equality JOIN-BACK on the max — independent
    * argmax mechanisms. */
  val k52: Q = Q(
    "k52_embedding_decontam",
    """WITH v AS (SELECT vec_id,
      |    LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e,
      |    CASE WHEN SUBSTR(MD5(CAST(vec_id AS VARCHAR)), 1, 1) <= 'c' THEN 'train'
      |         WHEN SUBSTR(MD5(CAST(vec_id AS VARCHAR)), 1, 1) = 'd' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM embeddings),
      |p AS (SELECT ev.vec_id, ev.split, tr.vec_id AS tid,
      |        ROUND(LIST_COSINE_SIMILARITY(ev.e, tr.e), 4) AS sim
      |      FROM v ev JOIN v tr ON ev.split <> 'train' AND tr.split = 'train'),
      |a AS (SELECT vec_id, split, MAX(sim) AS max_sim FROM p GROUP BY 1, 2)
      |SELECT a.vec_id AS vec_id, a.split AS split, a.max_sim AS max_sim,
      |  MIN(p.tid) AS nearest_train,
      |  CAST(CASE WHEN a.max_sim >= 0.42 THEN 1 ELSE 0 END AS INT)
      |    AS contaminated
      |FROM a JOIN p ON p.vec_id = a.vec_id AND p.split = a.split
      |            AND p.sim = a.max_sim
      |GROUP BY 1, 2, 3
      |ORDER BY vec_id ASC NULLS LAST""".stripMargin,
    (s, dir) => k52Plan(Tables.embeddings(s, dir), 0.42))

  /** The k52 plan body, factored so Round17Spec can drive the REAL plan
    * on synthetic frames (the h46Plan discipline). */
  def k52Plan(emb: DataFrame, threshold: Double): DataFrame = {
    val h1 = substring(md5(col("vec_id").cast("string")), 1, 1)
    val v = emb.select(col("vec_id"),
      graft.api.Similarity.normalize(col("embedding")).as("__u"),
      when(h1 <= "c", "train").when(h1 === "d", "val")
        .otherwise("test").as("split"))
    // barriers: BOTH sides re-exchange so the unit-normalization
    // materializes once per row — without a barrier it would inline into
    // the join and re-run per pair (the k07 CollapseProject hazard).
    // The train side is deliberately NOT broadcast-hinted (r14 ADVICE: a
    // hard-coded broadcast of ~13/16 of the corpus dies at the broadcast
    // size limit long before the declared Cartesian itself does): below
    // the autoBroadcastJoinThreshold Catalyst still picks
    // BroadcastNestedLoopJoin (the fixture regime — plan-pinned), above
    // it the exact regime degrades to a shuffle cross join of two
    // exchange-materialized sides; the 100 TB path stays k43's IVF
    // shortlist either way.
    val ev = v.filter(col("split") =!= "train").repartition(col("vec_id"))
    val tr = v.filter(col("split") === "train")
      .select(col("vec_id").as("__tid"), col("__u").as("__ut"))
      .repartition(col("__tid"))
    ev.crossJoin(tr)
      .select(col("vec_id"), col("split"),
        round(graft.api.Similarity.dot(col("__u"), col("__ut")), 4).as("sim"),
        col("__tid"))
      .groupBy("vec_id", "split")
      .agg(max(struct(col("sim"), (-col("__tid")).as("__nt"))).as("__m"))
      .select(col("vec_id"), col("split"),
        col("__m.sim").as("max_sim"),
        (-col("__m.__nt")).as("nearest_train"),
        when(col("__m.sim") >= threshold, 1).otherwise(0).cast("int")
          .as("contaminated"))
      .orderBy(asc_nulls_last("vec_id"))
  }

  // ---------------------------------------------------------------- k53

  /** k53 — cross-SOURCE span-overlap matrix (corpus forensics: which
    * source pairs share verbatim 20-token spans — the mirror-site /
    * syndicated-boilerplate detector web-corpus pipelines run before
    * choosing dedup scope [public: RefinedWeb and Dolma report
    * cross-snapshot/source duplication analyses; k47 surfaces the top
    * spans, this attributes the overlap to source PAIRS]): for every
    * unordered source pair, the number of DISTINCT spans present in
    * both (within-source repetition excluded by the DISTINCT
    * (digest, source) projection; a < b keeps each pair once). 113
    * shared spans on the densest pair at sf0.01 — populated, not
    * degenerate.
    *
    * Scale shape: k44's one shingling Generate → DISTINCT
    * (digest, source) hash agg → per-digest SORTED source set
    * (collect_set is bounded by the SOURCE DOMAIN, never the corpus) →
    * pair emission as a map-side array HOF over the sorted set (i < j
    * over ≤ |sources| elements — the k15 GroupEmit idea where the
    * group is domain-bounded so no cap is needed; a digest shared by
    * every source costs C(|sources|, 2) rows, domain², not data) →
    * one (a, b)-keyed count agg; each (digest, pair) appears exactly
    * once post-emit, so count(*) IS the distinct-span count. The
    * ORACLE self-joins the distinct (digest, source) frame instead —
    * independent pair derivations (HOF emit vs equi-join, the k15
    * pairing). */
  val k53: Q = Q(
    "k53_source_overlap_matrix",
    """WITH t AS (SELECT doc_id, source, STRING_SPLIT(text, ' ') AS toks
      |           FROM documents),
      |sp AS (SELECT DISTINCT source,
      |         MD5(ARRAY_TO_STRING(toks[st : st + 19], ' ')) AS d
      |       FROM (SELECT source, UNNEST(RANGE(1, LEN(toks) - 18)) AS st, toks
      |             FROM t WHERE LEN(toks) >= 20))
      |SELECT a.source AS source_a, b.source AS source_b,
      |  CAST(COUNT(*) AS BIGINT) AS n_shared_spans
      |FROM sp a JOIN sp b ON a.d = b.d AND a.source < b.source
      |GROUP BY 1, 2
      |ORDER BY source_a ASC NULLS LAST, source_b ASC NULLS LAST""".stripMargin,
    (s, dir) => k53Plan(Tables.documents(s, dir)))

  /** The k53 plan body, factored so Round17Spec can drive the REAL plan
    * on synthetic frames (the h46Plan discipline). */
  def k53Plan(docs: DataFrame): DataFrame = {
    docs
      .select(col("source"), split(col("text"), " ").as("__t"))
      .filter(size(col("__t")) >= 20)
      .select(col("source"), explode(expr(
        Spans.DigestsExpr)).as("d"))
      .distinct()
      .groupBy("d")
      .agg(sort_array(collect_set(col("source"))).as("__ss"))
      .filter(size(col("__ss")) >= 2)
      .select(explode(expr(
        "flatten(transform(__ss, (x, i) -> " +
          "transform(slice(__ss, i + 2, size(__ss) - i - 1), " +
          "y -> named_struct('a', x, 'b', y))))")).as("__p"))
      .groupBy(col("__p.a").as("source_a"), col("__p.b").as("source_b"))
      .agg(count(lit(1)).cast("long").as("n_shared_spans"))
      .orderBy(asc_nulls_last("source_a"), asc_nulls_last("source_b"))
  }

  // ---------------------------------------------------------------- k54

  /** k54 — OOV rate under a vocabulary BUDGET (tokenizer-coverage
    * analysis [public: SentencePiece/BPE papers report coverage vs
    * vocab size; fixed-vocab pipelines measure per-doc OOV mass before
    * choosing V]): vocab = the top-V corpus tokens by (count DESC,
    * token ASC — the tie-break genuinely DECIDES the fixture boundary:
    * at V = 16 rank 16's count 908 is shared by two tokens), then per
    * doc the token mass outside the vocab and its ROUND-4 fraction.
    * k21 reports the vocab list itself; k12 counts tokens — this is
    * the coverage metric that prices a vocab budget. V = 16 probed to
    * bite at sf0.01: mean OOV 45%, min 17.6% (the fixture corpus has
    * only 31 distinct tokens — a privately small domain, which is why
    * the budget sits below it).
    *
    * Scale shape: ONE token Generate feeding the per-doc TYPE frame;
    * the corpus counts aggregate FROM that frame (type-level, the
    * exchange reuses — plan-checked), the top-V is a
    * TakeOrderedAndProject (V-sized, no global sort materializes), and
    * docs test membership via a BROADCAST left join of the V-row
    * vocab. The ORACLE ranks via a global ROW_NUMBER instead of a
    * top-k — same boundary, independent mechanism. */
  val k54: Q = Q(
    "k54_oov_rate",
    """WITH tok AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t
      |             FROM documents),
      |tf AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2),
      |cf AS (SELECT t, SUM(c) AS ct FROM tf GROUP BY 1),
      |voc AS (SELECT t FROM (
      |    SELECT t, ROW_NUMBER() OVER (ORDER BY ct DESC, t ASC) AS rn FROM cf)
      |  WHERE rn <= 16)
      |SELECT tf.doc_id AS doc_id,
      |  CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN voc.t IS NULL THEN c ELSE 0 END) AS BIGINT) AS n_oov,
      |  ROUND(SUM(CASE WHEN voc.t IS NULL THEN c ELSE 0 END) * 1.0 / SUM(c), 4)
      |    AS oov_frac
      |FROM tf LEFT JOIN voc ON tf.t = voc.t
      |GROUP BY 1
      |ORDER BY doc_id ASC NULLS LAST""".stripMargin,
    (s, dir) => k54Plan(Tables.documents(s, dir), 16))

  /** The k54 plan body, factored so Round17Spec can drive the REAL plan
    * on synthetic frames (the h46Plan discipline). */
  def k54Plan(docs: DataFrame, v: Int): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
    val voc = tf.groupBy("t").agg(sum(col("c")).as("ct"))
      .orderBy(desc("ct"), asc_nulls_last("t")).limit(v)
      .select(col("t"), lit(1).as("__in"))
    tf.join(broadcast(voc), Seq("t"), "left")
      .groupBy("doc_id")
      .agg(sum(col("c")).cast("long").as("n_tokens"),
           sum(when(col("__in").isNull, col("c")).otherwise(0))
             .cast("long").as("n_oov"))
      .withColumn("oov_frac",
        round(col("n_oov") * lit(1.0) / col("n_tokens"), 4))
      .orderBy(asc_nulls_last("doc_id"))
  }

  // ---------------------------------------------------------------- k55

  /** k55 — ExactSubstr REMOVAL accounting: the token MASS the span
    * dedup would excise per document [public: Lee et al. 2022 report
    * the fraction of the corpus their ExactSubstr pass removes — the
    * headline number of the paper]. k44 counts SPANS (windows), but
    * span counts double-count overlapping windows: R consecutive
    * duplicated positions are R spans yet only R + 19 tokens. This
    * query reports the exact COVERED-TOKEN union — per doc, the number
    * of tokens inside at least one duplicated 20-token window
    * (`n_dup_tokens`) and inside at least one REMOVABLE window (dup
    * AND doc ≠ min holder — k44's keep-min rule; `n_removed_tokens`),
    * plus the ROUND-4 removed fraction. All integers except the
    * declared fraction; docs under 20 tokens are absent (k44's rule).
    *
    * Scale shape: k44/k46's one shingling Generate with positions, dup
    * decided by the digest window (join-free), then each union is the
    * e13 interval-union sweep — intervals [st, st+19] per doc, islands
    * split where st exceeds the running max end of all PRECEDING
    * intervals (a gap under the span width MERGES regions: dup
    * positions {1, 10} cover 29 tokens, not 40 — spec-pinned), union =
    * Σ per island (max end − min start + 1). The two faces ride ONE
    * sweep over only the DUPLICATED positions (a tiny filtered frame):
    * class tags 1 = dup / 2 = also-removable explode map-side and the
    * sweep partitions by (doc, class) — join-free end-to-end. Docs
    * whose spans are all unique are ABSENT (an empty removal is not a
    * row; k44 reports the all-docs face). The ORACLE reruns the
    * identical sweep arithmetic over a JOIN-derived dup set (the k46
    * pairing: arithmetic shared, duplication derived independently). */
  val k55: Q = Q(
    "k55_exact_substr_removal",
    """WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents),
      |sp AS (SELECT doc_id, LEN(toks) AS n_tokens, st,
      |         MD5(ARRAY_TO_STRING(toks[st : st + 19], ' ')) AS d
      |       FROM (SELECT doc_id, UNNEST(RANGE(1, LEN(toks) - 18)) AS st, toks
      |             FROM t WHERE LEN(toks) >= 20)),
      |dd AS (SELECT d, MIN(doc_id) AS dmin, MAX(doc_id) AS dmax
      |       FROM sp GROUP BY d),
      |f AS (SELECT sp.doc_id, sp.n_tokens, sp.st,
      |        CAST(sp.doc_id <> dd.dmin AS INT) AS rem
      |      FROM sp JOIN dd USING (d) WHERE dd.dmin < dd.dmax),
      |sw AS (SELECT doc_id, n_tokens, st, rem,
      |         CASE WHEN st > COALESCE(MAX(st + 19) OVER (
      |                PARTITION BY doc_id, rem ORDER BY st ASC NULLS LAST
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |                -1) THEN 1 ELSE 0 END AS brk
      |       FROM (SELECT doc_id, n_tokens, st, 1 AS rem FROM f
      |             UNION ALL
      |             SELECT doc_id, n_tokens, st, 2 FROM f WHERE rem = 1)),
      |isl AS (SELECT doc_id, n_tokens, st, rem,
      |          SUM(brk) OVER (PARTITION BY doc_id, rem
      |            ORDER BY st ASC NULLS LAST) AS g
      |        FROM sw),
      |un AS (SELECT doc_id, n_tokens, rem,
      |         SUM(mx - mn + 1) AS cov
      |       FROM (SELECT doc_id, n_tokens, rem, g,
      |               MIN(st) AS mn, MAX(st + 19) AS mx
      |             FROM isl GROUP BY 1, 2, 3, 4)
      |       GROUP BY 1, 2, 3)
      |SELECT a.doc_id AS doc_id,
      |  CAST(a.n_tokens AS BIGINT) AS n_tokens,
      |  CAST(a.cov AS BIGINT) AS n_dup_tokens,
      |  CAST(COALESCE(b.cov, 0) AS BIGINT) AS n_removed_tokens,
      |  ROUND(COALESCE(b.cov, 0) * 1.0 / a.n_tokens, 4) AS removed_frac
      |FROM (SELECT * FROM un WHERE rem = 1) a
      |LEFT JOIN (SELECT doc_id, cov FROM un WHERE rem = 2) b
      |  USING (doc_id)
      |ORDER BY doc_id ASC NULLS LAST""".stripMargin,
    (s, dir) => k55Plan(Tables.documents(s, dir)))

  /** The k55 plan body, factored so Round17Spec can drive the REAL plan
    * on synthetic frames (the h46Plan discipline). The two union faces
    * ride ONE sweep: every dup position carries class 1, removable
    * positions ADDITIONALLY class 2 (a 1-or-2-element array explode —
    * the oracle's UNION ALL, map-side), the e13 interval-union sweep
    * partitions by (doc, class), and the final agg pivots the classes
    * back — join-free, the shingle subtree traversed once. */
  def k55Plan(docs: DataFrame): DataFrame = {
    val sp = docs
      .select(col("doc_id"), split(col("text"), " ").as("__t"))
      .filter(size(col("__t")) >= 20)
      .select(col("doc_id"), size(col("__t")).cast("long").as("n_tokens"),
        posexplode(expr(Spans.DigestsExpr)))
      .select(col("doc_id"), col("n_tokens"),
              (col("pos") + 1).as("st"), col("col").as("d"))
    val wd = Window.partitionBy("d")
    val tagged = sp
      .withColumn("__dmin", min(col("doc_id")).over(wd))
      .withColumn("__dmax", max(col("doc_id")).over(wd))
      .filter(col("__dmin") < col("__dmax"))
      .select(col("doc_id"), col("n_tokens"), col("st"),
        explode(when(col("doc_id") =!= col("__dmin"),
                     array(lit(1), lit(2)))
                  .otherwise(array(lit(1)))).as("__cls"))
    val wprev = Window.partitionBy("doc_id", "__cls")
      .orderBy(asc_nulls_last("st"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wcum = Window.partitionBy("doc_id", "__cls")
      .orderBy(asc_nulls_last("st"))
    tagged
      .withColumn("__brk",
        when(col("st") > coalesce(max(col("st") + 19).over(wprev), lit(-1L)),
             1).otherwise(0))
      .withColumn("__g", sum(col("__brk")).over(wcum))
      .groupBy(col("doc_id"), col("n_tokens"), col("__cls"), col("__g"))
      .agg((max(col("st") + 19) - min(col("st")) + 1).as("__cov"))
      .groupBy(col("doc_id"), col("n_tokens"), col("__cls"))
      .agg(sum(col("__cov")).as("__u"))
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(sum(when(col("__cls") === 1, col("__u"))).cast("long")
             .as("n_dup_tokens"),
           coalesce(sum(when(col("__cls") === 2, col("__u"))), lit(0L))
             .cast("long").as("n_removed_tokens"))
      .withColumn("removed_frac",
        round(col("n_removed_tokens") * lit(1.0) / col("n_tokens"), 4))
      .orderBy(asc_nulls_last("doc_id"))
  }

  def ops: Vector[Q] = Vector(k48, k49, k50, k51, k52, k53, k54, k55)
}
