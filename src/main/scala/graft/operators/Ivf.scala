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
  * Centroid choice here is "first K vectors" for determinism — a k-means
  * refinement would slot in without changing any signature (centroids is
  * just a DataFrame).
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
