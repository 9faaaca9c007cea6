package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct sketch — the bounded-state scale path of
  * the `d34_kmv_distinct` declared query (ClickHouse `uniqTheta`-class
  * analog [public: CH docs; Bar-Yossef et al. 2002]).
  *
  * The sketch keeps the k SMALLEST distinct values of a fixed integer hash
  * of the keys; if fewer than k distinct hashes exist the count is exact,
  * otherwise the k-th smallest hash h_k estimates the cardinality as
  * (k−1)·2^32 div h_k (hashes are uniform in [0, 2^32)). Two properties
  * make it the right 100 TB shape:
  *
  *  - BOUNDED mergeable state: at most k longs per group ever exist,
  *    serialize, or shuffle — vs COUNT(DISTINCT)'s (group, value)-domain
  *    pre-aggregation. Same posture as [[UniqUpTo]] and [[HeavyHitters]].
  *  - FULLY deterministic: the hash is fixed (the repo's Knuth
  *    multiplicative family, 31-bit-masked — the a04 overflow lesson) and
  *    "the k smallest of a union" is independent of merge order or
  *    partitioning — so unlike Misra-Gries there is no fold-order caveat:
  *    the sketch is equality-pinned against the d34 SQL formulation, not
  *    just guarantee-checked.
  *
  * Null inputs are skipped (COUNT(DISTINCT) semantics). The buffer rides
  * the product encoder as a sorted Seq for deterministic serialization.
  */
case class KmvBuf(hs: Seq[Long]) // ascending, distinct, length ≤ k

/** Sketch result: how many distinct hashes are tracked (= min(k, distinct))
  * and the cardinality estimate (exact when n_tracked < k). */
case class KmvResult(n_tracked: Int, estimate: Long)

case class Kmv(k: Int) extends Aggregator[java.lang.Long, KmvBuf, KmvResult] {
  require(k >= 2, "KMV needs k >= 2")

  override def zero: KmvBuf = KmvBuf(Seq.empty)

  override def reduce(b: KmvBuf, a: java.lang.Long): KmvBuf =
    if (a == null) b
    else {
      val h = Kmv.hash(a.longValue)
      if (b.hs.length >= k && h >= b.hs.last) b // can't enter the bottom-k
      else if (b.hs.contains(h)) b
      else KmvBuf(((b.hs :+ h).sorted).take(k))
    }

  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf =
    KmvBuf((a.hs ++ b.hs).distinct.sorted.take(k))

  override def finish(b: KmvBuf): KmvResult =
    KmvResult(b.hs.length, Kmv.estimate(b.hs, k))

  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[KmvResult] = Encoders.product[KmvResult]
}

/** The sketch-valued sibling of [[Kmv]]: finishes to the sorted bottom-k
  * hash list itself instead of the cardinality estimate — the mergeable
  * representation theta-style SET OPERATIONS combine (`d45_kmv_set_ops`,
  * the ClickHouse `uniqThetaUnion`/`uniqThetaIntersect` analog): union =
  * bottom-k of the concatenated lists, θ = the union's k-th smallest, and
  * any estimate is integer arithmetic over hashes below θ. Same bounded
  * deterministic state as [[Kmv]] (≤ k longs, merge-order-free). */
case class KmvSketch(k: Int) extends Aggregator[java.lang.Long, KmvBuf, Seq[Long]] {
  private val inner = Kmv(k)
  override def zero: KmvBuf = inner.zero
  override def reduce(b: KmvBuf, a: java.lang.Long): KmvBuf = inner.reduce(b, a)
  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = inner.merge(a, b)
  override def finish(b: KmvBuf): Seq[Long] = b.hs
  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object Kmv {
  /** The repo's shared deterministic hash (ScanOps a04 / Round8g d31 / the
    * d34 oracle, verbatim): Knuth multiplicative on the 31-bit-masked key,
    * into [0, 2^32). Non-negative for non-negative keys. */
  def hash(key: Long): Long =
    ((key % 2147483648L) * 2654435761L) % 4294967296L

  /** The d34 estimator: exact below k, (k−1)·2^32 div h_k at or above. */
  def estimate(sortedHs: Seq[Long], k: Int): Long =
    if (sortedHs.length < k) sortedHs.length.toLong
    else ((k - 1).toLong * 4294967296L) / sortedHs(k - 1)
}
