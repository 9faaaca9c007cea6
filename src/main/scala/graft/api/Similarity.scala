package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic embedding-similarity operators over a float/double array column.
  * Exact (brute-force) forms here; the LSH-bucketed scale path is
  * `graft.operators.Ann`.
  */
object Similarity {

  /** Codegen'd native dot product (single loop, no per-row allocation) —
    * see graft.functions.DotProductExpression for why not the HOF form. */
  def dot(x: Column, y: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.DotProductExpression(
        org.apache.spark.sql.graftbridge.Bridge.expression(x),
        org.apache.spark.sql.graftbridge.Bridge.expression(y)))

  /** Widen a float array to double (float32 math differs across engines). */
  def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Unit-normalize a float/double array column → ARRAY<DOUBLE>. Native
    * one-pass expression (see UnitVectorExpression: the HOF form re-computes
    * the norm per element and breaks whole-stage codegen). Absorbs the
    * float→double widening, so callers pass the raw column. */
  def normalize(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.UnitVectorExpression(
        org.apache.spark.sql.graftbridge.Bridge.expression(c)))

  /** L2 norm of a (float or double) array column. */
  def l2Norm(c: Column): Column =
    sqrt(aggregate(transform(c, x => x.cast("double") * x.cast("double")),
                   lit(0.0), (acc, v) => acc + v))

  /** Symmetric per-vector int8 quantization: scale = max|x|/127, codes =
    * round(x/scale) as `ARRAY<TINYINT>` — 1 byte per dimension plus one
    * float scale per vector, the standard 4× storage cut for float32
    * embedding stores (8× vs float64) that keeps cosine ordering nearly
    * intact (elementwise error ≤ scale/2; recall pinned in ScaleOpsSpec).
    * Pure codegen'd HOFs — no UDF. Zero vectors quantize to zero codes
    * (scale clamped away from ÷0). Returns (idCol, `scale`, `q`). */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val sc = greatest(
      array_max(transform(col(vecCol), x => abs(x.cast("double")))),
      lit(1e-30)) / lit(127.0)
    df.select(col(idCol), sc.as("scale"), col(vecCol).as("__v"))
      .select(col(idCol), col("scale"),
              transform(col("__v"),
                        x => round(x.cast("double") / col("scale")).cast("byte"))
                .as("q"))
  }

  /** Reconstruct approximate double vectors from [[quantizeInt8]] output. */
  def dequantizeInt8(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol),
              transform(col("q"), b => b.cast("double") * col("scale"))
                .as("embedding"))

  /** Exact top-k cosine neighbors of one probe vector. The probe side is a
    * 1-row broadcast under every corpus partition; TakeOrderedAndProject
    * keeps the global top-k without a full sort. */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
                 probeId: Long, k: Int, roundTo: Int = -1): DataFrame = {
    val unit = df.select(col(idCol).as("__id"), normalize(col(vecCol)).as("__u"))
    val probe = unit.filter(col("__id") === probeId).select(col("__u").as("__p"))
    val raw = dot(col("__u"), col("__p"))
    // roundTo >= 0 rounds BEFORE the order-by so ties at the rounded
    // precision break by id — required when an oracle compares rounded
    // values (the raw-cos order can differ inside a rounding bucket).
    val cos = if (roundTo >= 0) round(raw, roundTo) else raw
    unit.filter(col("__id") =!= probeId)
      .crossJoin(broadcast(probe))
      .select(col("__id").as(idCol), cos.as("cos"))
      .orderBy(desc("cos"), asc(idCol))
      .limit(k)
  }

  /** Exact cosine near-dup pairs within a blocking key (vectors pre-unit-
    * normalized so each pair computes one dot product).
    *
    * The repartition on the block key is load-bearing twice over: it
    * co-partitions the self-join, AND it is an Exchange barrier that stops
    * CollapseProject from inlining the normalization expression into the
    * per-pair dot product (which would re-normalize both vectors for every
    * pair — measured 3.5× slower at sf0.1). */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
                  blockCol: String, threshold: Double): DataFrame = {
    val unit = df.select(col(idCol).as("__id"), col(blockCol).as("__blk"),
                         normalize(col(vecCol)).as("__u"))
      .repartition(col("__blk"))
    val a = unit.select(col("__id").as("id1"), col("__blk"), col("__u").as("__ua"))
    val b = unit.select(col("__id").as("id2"), col("__blk").as("__blk2"),
                        col("__u").as("__ub"))
    a.join(b, col("__blk") === col("__blk2") && col("id1") < col("id2"))
      .select(col("id1"), col("id2"), dot(col("__ua"), col("__ub")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** IVF coarse quantizer: cosine of every corpus vector against every
    * centroid — corpus × small-centroid-set as a broadcast nested loop,
    * one codegen'd dot per pair. Returns (idCol, cidCol, "cos").
    *
    * Both sides are unit-normalized once (O(rows)); with `barrier = true`
    * the corpus side gets the same CollapseProject Exchange barrier as
    * [[cosinePairs]] (without it the normalization re-runs per centroid
    * pair). The barrier is a full corpus shuffle — worth it when the
    * centroid set is large (≫ the ~8 re-norms a small set costs), not for a
    * handful of centroids. At 100 TB the centroid set stays a few thousand
    * rows — always broadcastable — and the output feeds a per-vector argmax
    * (window or max_by on (cos, cid)). */
  def scoreAgainstCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                            centroids: DataFrame, cidCol: String,
                            cvecCol: String, barrier: Boolean = true): DataFrame = {
    val normed = corpus
      .select(col(idCol).as("__id"), normalize(col(vecCol)).as("__u"))
    val unit = if (barrier) normed.repartition(col("__id")) else normed
    val cent = centroids
      .select(col(cidCol).as("__cid"), normalize(col(cvecCol)).as("__c"))
    unit.crossJoin(broadcast(cent))
      .select(col("__id").as(idCol), col("__cid").as(cidCol),
              dot(col("__u"), col("__c")).as("cos"))
  }
}
