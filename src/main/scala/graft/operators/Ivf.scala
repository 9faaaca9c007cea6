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
    val spark = embeddings.sparkSession
    import spark.implicits._
    var cent: Seq[(Long, Seq[Double])] = firstKCentroids(embeddings, k)
      .select(col("cid"), graft.api.Similarity.asDouble(col("embedding")).as("e"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
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

  /** Top-k cosine neighbors of `probeId`, scanning only the nprobe nearest
    * clusters. Returns (vec_id, cos) desc — compare with Ann.topKExact. */
  def topKApprox(embeddings: DataFrame, centroids: DataFrame, probeId: Long,
                 k: Int = 10, nprobe: Int = 2): DataFrame = {
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
                graft.api.Similarity.normalize(col("embedding")), col("__p")), 6).as("cos"))
      .orderBy(desc_nulls_last("cos"), asc_nulls_last("vec_id"))
      .limit(k)
  }
}
