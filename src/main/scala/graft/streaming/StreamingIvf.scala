package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming IVF ingest: route each arriving vector to its nearest
  * centroid and land it in the cid-partitioned layout the batch probe
  * path prunes at the storage layer (Ivf.topKApprox/topKPqAdc over
  * `partitionBy(cid)` — proven in ScaleOpsSpec). This is the ANN INGEST
  * path: embeddings stream in, the inverted-file layout stays fresh, and
  * a probe never rescans history.
  *
  * The centroid set is a driver-side constant broadcast into the
  * per-batch assignment (K × dim doubles — the same shape
  * Ivf.kmeansCentroids holds between Lloyd rounds). Re-training is a
  * BATCH concern: swap the centroid set between streaming restarts;
  * in-flight micro-batches always use one consistent set, so a file's
  * partition is always consistent with the centroids that routed it.
  *
  * Assignment semantics are EXACTLY Ivf.assign's (max cosine, ties to the
  * lowest cid) — asserted value-identical in StreamingSpec over the
  * fixture, which anchors the streaming route to the k16-oracle-checked
  * batch assignment. */
object StreamingIvf {

  final case class VecIn(vec_id: Long, embedding: Array[Float])

  /** The per-batch routing frame: (vec_id, cid, cos). */
  def route(vectors: DataFrame, centroids: Seq[(Long, Seq[Double])])
           (implicit s: SparkSession): DataFrame = {
    import s.implicits._
    graft.operators.Ivf.assign(vectors, centroids.toDF("cid", "embedding"))
  }

  /** Wire a (streaming) vector Dataset into the cid-partitioned store:
    * each micro-batch appends `batch/cid=<c>/` files. Append-only — a
    * re-delivered vec_id lands twice and the probe-side dedups by vec_id
    * (max cos), the same at-least-once treatment as the parquet upsert
    * sink. */
  def start(vectors: Dataset[VecIn], centroids: Seq[(Long, Seq[Double])],
            outDir: String, checkpointDir: String)
           (implicit s: SparkSession): StreamingQuery = {
    vectors.toDF()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        route(batch.toDF(), centroids)(s)
          .join(batch.toDF(), "vec_id")
          .write.mode("append").partitionBy("cid").parquet(outDir)
      }
      .start()
  }
}
