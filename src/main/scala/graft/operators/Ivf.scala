package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbors [public: Jégou et al.,
  * "Product Quantization for Nearest Neighbor Search", coarse-quantizer
  * stage]: partition the corpus into clusters by nearest centroid, then
  * answer a query by scanning only the `nprobe` clusters whose centroids
  * are closest to the probe.
  *
  * The declared, oracle-checked face of the assignment step is
  * `k16_ivf_assign` (ExtOps); this operator adds the query path. At 100 TB:
  *  - centroids stay a few-thousand-row broadcast;
  *  - `assign` is one broadcast nested loop + a hash-aggregate argmax — and the
  *    assignment would be written out partitioned BY cid (`partitionBy`),
  *    so a probe reads only nprobe partitions (partition pruning does the
  *    cluster restriction at the storage layer);
  *  - recall/latency trade via nprobe; nprobe = |centroids| degrades to
  *    exact brute force (pinned by the spec).
  *
  * Centroid init is "first K vectors" for determinism; [[Ivf.kmeansCentroids]]
  * refines them with fixed-count Lloyd rounds (no RNG) — centroids stay a
  * plain DataFrame, so trained and naive sets are interchangeable.
  */
object Ivf {

  /** Deterministic centroid set: the K lowest-id vectors. Sorted limit →
    * TakeOrderedAndProject (per-partition top-K then merge of K×partitions
    * rows) — never a global-window single-partition shuffle. */
  def firstKCentroids(embeddings: DataFrame, k: Int): DataFrame =
    embeddings
      .orderBy(asc_nulls_last("vec_id"))
      .limit(k)
      .select(col("vec_id").as("cid"), col("embedding"))

  /** One row per corpus vector: (vec_id, cid, cos) of its nearest centroid
    * (cosine, ties broken by lowest cid). Argmax as `max(struct(cos, -cid))`
    * — a hash aggregate whose partial side reduces K scored rows to 1 per
    * vec_id before the shuffle, vs the sort + full-set shuffle a row_number
    * window would cost. */
  def assign(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = graft.api.Similarity.scoreAgainstCentroids(
      embeddings, "vec_id", "embedding", centroids, "cid", "embedding",
      barrier = false)
    scored.groupBy("vec_id")
      .agg(max(struct(col("cos"), (-col("cid")).as("negcid"), col("cid"))).as("__b"))
      .select(col("vec_id"), col("__b.cid").as("cid"), col("__b.cos").as("cos"))
  }

  /** [[assign]]'s multi-probe form: the `nprobe` nearest centroids per
    * corpus vector (cosine, ties broken by lowest cid) — `nprobe` rows per
    * vec_id. This is the blocking step of the SemDeDup-shaped embedding
    * dedup ([[graft.api.Dedup.embeddingCosinePairs]]): a near-dup pair
    * sitting astride a cluster boundary is found iff some probed cluster
    * contains both sides, and probing >1 cluster per vector is what buys
    * that recall. Shape: same broadcast centroid scoring as [[assign]],
    * then ONE hash agg whose per-vector state is the K scored structs
    * (bounded by the centroid count — at 100 TB that is a few thousand,
    * and the partial side still combines per vec_id before the shuffle),
    * sorted and sliced to `nprobe`. No rank window, no data-sized sort. */
  def assignTopN(embeddings: DataFrame, centroids: DataFrame,
                 nprobe: Int): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val scored = graft.api.Similarity.scoreAgainstCentroids(
      embeddings, "vec_id", "embedding", centroids, "cid", "embedding",
      barrier = false)
    scored.groupBy("vec_id")
      .agg(slice(reverse(array_sort(collect_list(
             struct(col("cos"), (-col("cid")).as("negcid"), col("cid"))))),
           1, nprobe).as("__top"))
      .select(col("vec_id"), explode(col("__top")).as("__t"))
      .select(col("vec_id"), col("__t.cid").as("cid"), col("__t.cos").as("cos"))
  }

  /** Deterministic Lloyd refinement of [[firstKCentroids]]: `iters` rounds
    * of assign → per-cluster element-wise mean. No RNG anywhere — init is
    * the firstK set and the iteration count is fixed, so reruns agree (up
    * to float-sum ordering at ~1e-15, which feeds recall tests, never the
    * oracle: k16 pins its own fixed centroids).
    *
    * Centroids live DRIVER-side between rounds (K × dim doubles — the
    * canonical iterative-k-means shape, same as Spark MLlib's own KMeans):
    * the corpus never leaves the executors, each round is one distributed
    * assign + one aggregation, and re-creating the small centroid frame per
    * round truncates the lineage so round i+1 does not recompute rounds
    * 1..i. Empty clusters keep their previous centroid. At 100 TB the
    * driver holds a few thousand × dim doubles — trivial. */
  def kmeansCentroids(embeddings: DataFrame, k: Int, iters: Int = 3): DataFrame = {
    val init: Seq[(Long, Seq[Double])] = firstKCentroids(embeddings, k)
      .select(col("cid"), graft.api.Similarity.asDouble(col("embedding")).as("e"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
    lloyd(embeddings, init, iters)
  }

  /** The shared Lloyd loop: fixed-count assign → per-cluster mean rounds
    * from any initial centroid set (see [[kmeansCentroids]]' scaladoc for
    * the driver-side-centroids scale argument). */
  private def lloyd(embeddings: DataFrame, init: Seq[(Long, Seq[Double])],
                    iters: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    var cent = init
    for (_ <- 0 until iters) {
      val means = assign(embeddings, cent.toDF("cid", "embedding"))
        .join(embeddings, "vec_id")
        .select(col("cid"),
                posexplode(graft.api.Similarity.asDouble(col("embedding"))))
        .groupBy("cid", "pos").agg(avg("col").as("v"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("v")))),
                       x => x.getField("v")).as("e"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
      cent = cent.map { case (cid, e) => (cid, means.getOrElse(cid, e)) }
    }
    cent.toDF("cid", "embedding")
  }

  /** k-means‖ oversampled seeding [public: Bahmani et al., "Scalable
    * k-means++", VLDB 2012], fully deterministic: the Bernoulli draw uses
    * a salted `xxhash64(vec_id, round)` uniform (no RNG on executors —
    * Ann's seeded-literal convention), each round samples points with
    * probability ∝ their distance-squared to the current candidate set
    * (d² = 2(1−cos) on unit vectors), candidates are weighted by corpus
    * mass and reduced to k by weighted farthest-point on the driver
    * (candidate count is O(rounds · oversample · k) — tiny), then the
    * shared [[lloyd]] loop refines. firstK seeding caps recall when the
    * K lowest-id vectors cluster together; k-means‖ spreads the seed mass
    * like kmeans++ in O(rounds) passes instead of k. */
  def kmeansParCentroids(embeddings: DataFrame, k: Int, rounds: Int = 3,
                         oversample: Double = 2.0, iters: Int = 3): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val unit = embeddings.select(
      col("vec_id"), graft.api.Similarity.normalize(col("embedding")).as("embedding"))
    var cand: Seq[(Long, Seq[Double])] = unit.orderBy(asc_nulls_last("vec_id"))
      .limit(1).collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    for (r <- 1 to rounds) {
      val scored = assign(unit, cand.toDF("cid", "embedding"))
        .select(col("vec_id"), (lit(2.0) - lit(2.0) * col("cos")).as("d2"))
      val phi = scored.agg(sum("d2")).collect().head.getDouble(0)
      if (phi > 0) {
        val prob = least(lit(1.0), lit(oversample * k) * col("d2") / lit(phi))
        val unif = pmod(xxhash64(col("vec_id"), lit(r)), lit(1000000L))
          .cast("double") / lit(1e6)
        val picked = scored.filter(unif < prob).select("vec_id")
          .join(unit, "vec_id")
          .collect().map(rr => (rr.getLong(0), rr.getSeq[Double](1)))
        cand = (cand ++ picked).distinctBy(_._1)
      }
    }
    val weight = assign(unit, cand.toDF("cid", "embedding"))
      .groupBy("cid").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      .withDefaultValue(0L)
    val byId = cand.toMap
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      2.0 - 2.0 * a.zip(b).map { case (x, y) => x * y }.sum
    var chosen = Vector(cand.maxBy(c => (weight(c._1), -c._1))._1)
    while (chosen.size < math.min(k, cand.size)) {
      val next = cand.filterNot(c => chosen.contains(c._1))
        .maxBy { c =>
          (weight(c._1) * chosen.map(id => d2(byId(id), c._2)).min, -c._1)
        }
      chosen :+= next._1
    }
    // recluster the weighted candidates into k (the paper's reduction step,
    // not bare farthest-point — farthest-point alone seeds outliers that
    // grab little mass): driver-side weighted Lloyd over the candidate set,
    // initialized at the farthest-point picks. All O(|cand|·k) per round.
    var seeds: Seq[Seq[Double]] = chosen.sorted.map(byId)
    for (_ <- 0 until 5) {
      val assigned = cand.map { case (id, v) =>
        (seeds.zipWithIndex.minBy { case (s, i) => (d2(s, v), i) }._2, id, v)
      }
      seeds = seeds.zipWithIndex.map { case (old, i) =>
        val members = assigned.filter(_._1 == i)
        if (members.isEmpty) old
        else {
          val w = members.map(m => weight(m._2).toDouble)
          val tot = w.sum
          if (tot == 0) old
          else old.indices.map(d =>
            members.zip(w).map { case ((_, _, v), wt) => v(d) * wt }.sum / tot)
        }
      }
    }
    val init = seeds.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    lloyd(embeddings, init, iters)
  }

  // ---------------------------------------------------------------- PQ ---
  // Product quantization on top of the coarse quantizer [public: Jégou,
  // Douze, Schmid, "Product Quantization for Nearest Neighbor Search",
  // TPAMI 2011]. At 100 TB the IVF shortlist's full-vector fetch dominates
  // probe cost (nprobe clusters × 256B+ per vector); PQ stores an M-byte
  // code per vector instead, scores the probed clusters from codes alone
  // (asymmetric distance: probe stays a full vector, corpus is quantized),
  // and fetches full vectors only for the top-`shortlist` survivors'
  // exact re-rank. Training/encoding is deterministic Lloyd — no RNG, same
  // contract as [[kmeansCentroids]].

  /** Slices of the UNIT-normalized vectors: (vec_id, m, sv ARRAY<DOUBLE>,
    * ssq). PQ here approximates the dot of unit vectors (cosine), so
    * normalization happens before slicing on both train and encode paths. */
  private def pqSlices(embeddings: DataFrame, m: Int): DataFrame = {
    val dim = embeddings.select(size(col("embedding")).as("d")).head.getAs[Int]("d")
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    embeddings
      .select(col("vec_id"),
              graft.api.Similarity.normalize(col("embedding")).as("__u"))
      .select(col("vec_id"),
              posexplode(transform(sequence(lit(0), lit(m - 1)),
                i => slice(col("__u"), i * lit(sub) + 1, lit(sub)))))
      .select(col("vec_id"), col("pos").as("m"), col("col").as("sv"))
      .withColumn("ssq", graft.api.Similarity.dot(col("sv"), col("sv")))
  }

  /** Per-(vector, subspace) nearest codeword by squared L2 (the PQ training
    * objective — NOT cosine: subvector magnitudes carry signal). One
    * broadcast of the M×ksub codebook, argmin as `min(struct(d2, code))` —
    * the same partial-agg-before-shuffle shape as [[assign]]. */
  private def pqAssign(sl: DataFrame, cb: DataFrame): DataFrame =
    sl.join(broadcast(cb), "m")
      .select(col("vec_id"), col("m"), col("code"),
              (col("ssq") + col("csq") -
               lit(2.0) * graft.api.Similarity.dot(col("sv"), col("cent"))).as("d2"))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("d2"), col("code"))).as("__b"))
      .select(col("vec_id"), col("m"), col("__b.code").as("code"))

  private def withCsq(cb: DataFrame): DataFrame =
    cb.withColumn("csq", graft.api.Similarity.dot(col("cent"), col("cent")))

  /** Train per-subspace codebooks: returns (m, code, cent ARRAY<DOUBLE>).
    * Init is the slices of the `ksub` lowest-id vectors (deterministic, the
    * firstK convention); `iters` Lloyd rounds refine all M subspaces in one
    * distributed assign + one aggregation per round, with the codebook —
    * M × ksub × (dim/M) doubles — living driver-side between rounds exactly
    * like [[kmeansCentroids]]. Empty codes keep their previous codeword. */
  def pqCodebooks(embeddings: DataFrame, m: Int = 8, ksub: Int = 16,
                  iters: Int = 3): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val sl = pqSlices(embeddings, m)
    val initIds = embeddings.orderBy(asc_nulls_last("vec_id")).limit(ksub)
      .select("vec_id")
    val idToCode = initIds.collect().map(_.getLong(0)).sorted.zipWithIndex.toMap
    var cb: Seq[(Int, Int, Seq[Double])] =
      sl.join(broadcast(initIds), "vec_id").select("vec_id", "m", "sv")
        .collect()
        .map(r => (r.getInt(1), idToCode(r.getLong(0)), r.getSeq[Double](2)))
        .sortBy(t => (t._1, t._2)).toSeq
    for (_ <- 0 until iters) {
      val means = pqAssign(sl, withCsq(cb.toDF("m", "code", "cent")))
        .join(sl.select("vec_id", "m", "sv"), Seq("vec_id", "m"))
        .select(col("m"), col("code"), posexplode(col("sv")))
        .groupBy("m", "code", "pos").agg(avg("col").as("v"))
        .groupBy("m", "code")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("v")))),
                       x => x.getField("v")).as("cent"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2))).toMap
      cb = cb.map { case (mm, c, e) => (mm, c, means.getOrElse((mm, c), e)) }
    }
    cb.toDF("m", "code", "cent")
  }

  /** Encode the corpus: (vec_id, codes ARRAY<INT> of length M) — the M-byte
    * PQ representation that replaces the full vector in probe scans. */
  def pqEncode(embeddings: DataFrame, codebooks: DataFrame, m: Int): DataFrame =
    pqAssign(pqSlices(embeddings, m), withCsq(codebooks))
      .groupBy("vec_id")
      .agg(transform(array_sort(collect_list(struct(col("m"), col("code")))),
                     x => x.getField("code")).as("codes"))

  /** Encode the corpus at byte budget: (vec_id, codes BINARY of length M) —
    * one byte per subspace, the densest PQ storage form. Requires
    * ksub ≤ 256 (one byte addresses the whole codebook); at M=8 the
    * per-vector ANN artifact is 8 flat bytes vs the ARRAY<INT> form's
    * 4-bytes-per-element plus UnsafeArrayData header — the size win is
    * pinned in ScaleOpsSpec. Packing is the codegen'd
    * [[graft.functions.PackBytesExpression]]; probe-side scoring reads the
    * bytes directly ([[topKPqAdcBytes]]) so the int array never
    * materializes. */
  def pqEncodeBytes(embeddings: DataFrame, codebooks: DataFrame, m: Int): DataFrame = {
    val ksub = codebooks.agg(max(col("code"))).head.getInt(0) + 1
    require(ksub <= 256, s"byte-budget PQ needs ksub <= 256, got $ksub")
    pqEncode(embeddings, codebooks, m)
      .select(col("vec_id"),
              org.apache.spark.sql.graftbridge.Bridge.column(
                graft.functions.PackBytesExpression(
                  org.apache.spark.sql.graftbridge.Bridge.expression(
                    col("codes").cast("array<int>")))).as("codes"))
  }

  /** [[topKPqAdc]] over BINARY byte codes: identical IVF restriction,
    * shortlist and exact re-rank, but the ADC stage is one codegen'd loop
    * per row over the M-byte buffer against a FLAT M×ksub lookup-table
    * literal ([[graft.functions.AdcScoreExpression]]) — no per-row array
    * allocation and ≤¼ the scanned bytes of the int-codes path. Scores are
    * bit-identical to [[topKPqAdc]] on the same codebooks (same dots,
    * reordered only by m — pinned in ScaleOpsSpec). */
  def topKPqAdcBytes(embeddings: DataFrame, centroids: DataFrame,
                     codebooks: DataFrame, codes: DataFrame,
                     assignments: DataFrame, probeId: Long, k: Int = 10,
                     nprobe: Int = 2, shortlist: Int = 100): DataFrame = {
    val probeRow = embeddings.filter(col("vec_id") === probeId)
    val q = probeRow
      .select(graft.api.Similarity.normalize(col("embedding")).as("__u"))
      .head.getSeq[Double](0)
    val cbRows = codebooks.collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2))).toMap
    val mCount = cbRows.keys.map(_._1).max + 1
    val ksub = cbRows.keys.map(_._2).max + 1
    require(ksub <= 256, s"byte-budget PQ needs ksub <= 256, got $ksub")
    val sub = q.length / mCount
    // flat ADC table literal: entry m*ksub + code = dot(q_m, codeword)
    val flatTable: Column = array((0 until mCount).flatMap { mm =>
      val qm = q.slice(mm * sub, (mm + 1) * sub)
      (0 until ksub).map { c =>
        lit(cbRows.get((mm, c))
          .map(cw => qm.zip(cw).map { case (a, b) => a * b }.sum)
          .getOrElse(0.0))
      }
    }: _*)
    val probeClusters = graft.api.Similarity.scoreAgainstCentroids(
        probeRow, "vec_id", "embedding", centroids, "cid", "embedding",
        barrier = false)
      .orderBy(desc_nulls_last("cos"), asc_nulls_last("cid"))
      .limit(nprobe)
      .select(col("cid"))
    val adcTop = assignments
      .join(broadcast(probeClusters), "cid")
      .filter(col("vec_id") =!= probeId)
      .select("vec_id")
      .join(codes, "vec_id")
      .select(col("vec_id"),
              org.apache.spark.sql.graftbridge.Bridge.column(
                graft.functions.AdcScoreExpression(
                  org.apache.spark.sql.graftbridge.Bridge.expression(col("codes")),
                  org.apache.spark.sql.graftbridge.Bridge.expression(flatTable)))
                .as("adc"))
      .orderBy(desc_nulls_last("adc"), asc_nulls_last("vec_id"))
      .limit(shortlist)
      .select("vec_id")
    val probe = probeRow.select(
      graft.api.Similarity.normalize(col("embedding")).as("__p"))
    adcTop
      .join(embeddings, "vec_id")
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
              round(graft.api.Similarity.dot(
                graft.api.Similarity.normalize(col("embedding")),
                col("__p")), 6).as("cos"))
      .orderBy(desc_nulls_last("cos"), asc_nulls_last("vec_id"))
      .limit(k)
  }

  /** Rotate the (unit-normalized) corpus by a dense `r` (row-major d×d):
    * executor-side matvec with the matrix broadcast once — 4096 doubles at
    * d=64, trivial at any corpus size. Used by OPQ, where PQ runs on the
    * rotated space. */
  def rotate(embeddings: DataFrame, r: Array[Array[Double]]): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val b = spark.sparkContext.broadcast(r)
    embeddings
      .select(col("vec_id"), graft.api.Similarity.normalize(col("embedding")).as("u"))
      .as[(Long, Seq[Double])]
      .map { case (id, v) =>
        val m = b.value
        val d = v.length
        val x = v.toArray
        val out = new Array[Double](d)
        var i = 0
        while (i < d) {
          val row = m(i); var s = 0.0; var j = 0
          while (j < d) { s += row(j) * x(j); j += 1 }
          out(i) = s; i += 1
        }
        (id, out.toSeq)
      }.toDF("vec_id", "embedding")
  }

  /** OPQ: learn an orthonormal rotation that minimizes PQ quantization
    * error [public: Ge, He, Ke, Sun, "Optimized Product Quantization",
    * CVPR 2013 — the non-parametric alternation]. PQ quantizes each
    * subspace independently, so correlated dimensions waste codebook
    * entropy; OPQ alternates (1) train/encode PQ in the rotated space with
    * (2) the orthogonal-Procrustes update R = V·Uᵀ from the SVD of
    * M = Σ x·ŷᵀ (x original unit vector, ŷ its reconstruction) — the
    * closed-form rotation maximizing tr(R·M). M is a d×d treeAggregate
    * (4096 doubles at d=64 — the ONLY driver-side state besides the
    * codebooks); the SVD is breeze/LAPACK on that d×d, deterministic.
    * Returns the row-major rotation; run [[pqCodebooks]]/[[pqEncode]]/
    * [[topKPqAdc]] on [[rotate]]d vectors (probe included). */
  def opqRotation(embeddings: DataFrame, m: Int = 8, ksub: Int = 16,
                  iters: Int = 3, pqIters: Int = 2): Array[Array[Double]] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val dim = embeddings.select(size(col("embedding")).as("d")).head.getAs[Int]("d")
    val unit = embeddings
      .select(col("vec_id"), graft.api.Similarity.normalize(col("embedding")).as("u"))
    var r: Array[Array[Double]] =
      Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 0 until iters) {
      val rotated = rotate(embeddings, r)
      val cb = pqCodebooks(rotated, m, ksub, pqIters)
      val cbMap = cb.collect()
        .map(row => ((row.getInt(0), row.getInt(1)), row.getSeq[Double](2).toArray))
        .toMap
      val cbB = spark.sparkContext.broadcast(cbMap)
      val mCount = m
      val sub = dim / m
      // M = Σ x·ŷᵀ over the corpus: x the ORIGINAL unit vector, ŷ the
      // reconstruction of its rotated image (codewords concatenated)
      val flat = unit.join(pqEncode(rotated, cb, m), "vec_id")
        .select(col("u"), col("codes"))
        .as[(Seq[Double], Seq[Int])]
        .rdd.treeAggregate(new Array[Double](dim * dim))(
          seqOp = { (acc, row) =>
            val (xs, cs) = row
            val x = xs.toArray
            val y = new Array[Double](dim)
            var mm = 0
            while (mm < mCount) {
              val cw = cbB.value((mm, cs(mm)))
              System.arraycopy(cw, 0, y, mm * sub, sub)
              mm += 1
            }
            var i = 0
            while (i < dim) {
              val xi = x(i); var j = 0
              while (j < dim) { acc(i * dim + j) += xi * y(j); j += 1 }
              i += 1
            }
            acc
          },
          combOp = { (a, b) =>
            var i = 0
            while (i < a.length) { a(i) += b(i); i += 1 }
            a
          })
      val mMat = breeze.linalg.DenseMatrix.tabulate(dim, dim)(
        (i, j) => flat(i * dim + j))
      val svd.SVD(u, _, vt) = breeze.linalg.svd(mMat)
      val rNew = vt.t * u.t // Procrustes argmax of tr(R·M)
      r = Array.tabulate(dim, dim)((i, j) => rNew(i, j))
    }
    r
  }
  private val svd = breeze.linalg.svd

  /** Top-k by IVF + PQ-ADC + exact re-rank: restrict to the probe's
    * `nprobe` clusters via `assignments` (at 100 TB: the cid-partitioned
    * stored table — partition pruning does the restriction), score those
    * clusters from `codes` ALONE against the probe's per-subspace lookup
    * table (the full `embedding` column is never read in this stage), then
    * fetch full vectors for only the top-`shortlist` ADC survivors and
    * re-rank them by exact cosine. Returns (vec_id, cos) like
    * [[topKApprox]]. */
  def topKPqAdc(embeddings: DataFrame, centroids: DataFrame,
                codebooks: DataFrame, codes: DataFrame,
                assignments: DataFrame, probeId: Long, k: Int = 10,
                nprobe: Int = 2, shortlist: Int = 100): DataFrame = {
    val probeRow = embeddings.filter(col("vec_id") === probeId)
    val q = probeRow
      .select(graft.api.Similarity.normalize(col("embedding")).as("__u"))
      .head.getSeq[Double](0)
    val cbRows = codebooks.collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2))).toMap
    val mCount = cbRows.keys.map(_._1).max + 1
    val sub = q.length / mCount
    // ADC lookup table, computed once driver-side: table(m)(code) =
    // dot(q_m, codeword) — M × ksub multiplies, embedded as a literal so
    // the scoring stage is a single codegen'd projection over the codes
    val table: Column = array((0 until mCount).map { mm =>
      val qm = q.slice(mm * sub, (mm + 1) * sub)
      array((0 until cbRows.keys.map(_._2).max + 1).map { c =>
        lit(cbRows.get((mm, c))
          .map(cw => qm.zip(cw).map { case (a, b) => a * b }.sum)
          .getOrElse(0.0))
      }: _*)
    }: _*)
    val probeClusters = graft.api.Similarity.scoreAgainstCentroids(
        probeRow, "vec_id", "embedding", centroids, "cid", "embedding",
        barrier = false)
      .orderBy(desc_nulls_last("cos"), asc_nulls_last("cid"))
      .limit(nprobe)
      .select(col("cid"))
    val adcTop = assignments
      .join(broadcast(probeClusters), "cid")
      .filter(col("vec_id") =!= probeId)
      .select("vec_id")
      .join(codes, "vec_id")
      .select(col("vec_id"),
              aggregate(sequence(lit(0), lit(mCount - 1)), lit(0.0),
                (acc, i) => acc + element_at(element_at(table, i + lit(1)),
                                             element_at(col("codes"), i + lit(1))
                                               + lit(1))).as("adc"))
      .orderBy(desc_nulls_last("adc"), asc_nulls_last("vec_id"))
      .limit(shortlist)
      .select("vec_id")
    val probe = probeRow.select(
      graft.api.Similarity.normalize(col("embedding")).as("__p"))
    adcTop
      .join(embeddings, "vec_id")
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
              round(graft.api.Similarity.dot(
                graft.api.Similarity.normalize(col("embedding")),
                col("__p")), 6).as("cos"))
      .orderBy(desc_nulls_last("cos"), asc_nulls_last("vec_id"))
      .limit(k)
  }

  /** Top-k cosine neighbors of `probeId`, scanning only the nprobe nearest
    * clusters. Returns (vec_id, cos) desc — compare with Ann.topKExact.
    * `roundTo` sets the similarity rounding the rank order is decided on
    * (6 for the Tier-2 recall comparisons; the declared exact-regime face
    * k43 passes 4, the k03/k07 cross-engine determinism grain). */
  def topKApprox(embeddings: DataFrame, centroids: DataFrame, probeId: Long,
                 k: Int = 10, nprobe: Int = 2, roundTo: Int = 6): DataFrame = {
    val probeRow = embeddings.filter(col("vec_id") === probeId)
    // nprobe nearest centroids of the probe vector
    val probeClusters = graft.api.Similarity.scoreAgainstCentroids(
        probeRow, "vec_id", "embedding", centroids, "cid", "embedding",
        barrier = false)
      .orderBy(desc_nulls_last("cos"), asc_nulls_last("cid"))
      .limit(nprobe)
      .select(col("cid"))
    // restrict the corpus to those clusters (cluster ids broadcast), then
    // exact cosine within the shortlist
    val shortlist = assign(embeddings, centroids)
      .join(broadcast(probeClusters), "cid")
      .filter(col("vec_id") =!= probeId)
      .select(col("vec_id"))
      .join(embeddings, "vec_id")
    val probe = probeRow.select(
      graft.api.Similarity.normalize(col("embedding")).as("__p"))
    shortlist
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
              round(graft.api.Similarity.dot(
                graft.api.Similarity.normalize(col("embedding")), col("__p")),
                roundTo).as("cos"))
      .orderBy(desc_nulls_last("cos"), asc_nulls_last("vec_id"))
      .limit(k)
  }
}
