package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact-until-N distinct counter — the ClickHouse `uniqUpTo(N)` analog
  * [public: CH aggregate-function docs, uniqUpTo]: returns the exact
  * distinct count while the group holds ≤ N distinct values, and N+1 (a
  * "more than N" sentinel) once exceeded.
  *
  * The whole point vs `COUNT(DISTINCT x)` is the BOUNDED merge state: at
  * most N+1 elements are ever held, serialized, or shuffled per group,
  * regardless of the group's true cardinality — a 100 TB group with a
  * billion distinct keys costs the same partial-aggregate bytes as a
  * 1k-row group. Spark's exact count-distinct instead rewrites to a
  * pre-aggregation keyed on (group, value), whose shuffle grows with the
  * value domain. Use this wherever the question is "are there more than N
  * of these?" rather than "exactly how many?".
  *
  * Implementation: a typed [[Aggregator]] (the l02 surface) with a
  * capped-set buffer. Adding stops the moment the cap (N+1) is reached —
  * `reduce` and `merge` are both O(1) after saturation. Null inputs are
  * skipped, matching COUNT(DISTINCT) semantics on both engines. The
  * buffer rides the product encoder as a sorted Seq for deterministic
  * serialization.
  */
case class UniqUpToBuf(seen: Seq[Long])

case class UniqUpTo(n: Int) extends Aggregator[java.lang.Long, UniqUpToBuf, Int] {
  private val cap = n + 1

  override def zero: UniqUpToBuf = UniqUpToBuf(Seq.empty)

  override def reduce(b: UniqUpToBuf, a: java.lang.Long): UniqUpToBuf =
    if (a == null || b.seen.length >= cap || b.seen.contains(a.longValue)) b
    else UniqUpToBuf(b.seen :+ a.longValue)

  override def merge(a: UniqUpToBuf, b: UniqUpToBuf): UniqUpToBuf =
    if (a.seen.length >= cap) a
    else if (b.seen.length >= cap) b
    else UniqUpToBuf((a.seen ++ b.seen).distinct.take(cap))

  override def finish(b: UniqUpToBuf): Int = math.min(b.seen.length, cap)

  override def bufferEncoder: Encoder[UniqUpToBuf] = Encoders.product[UniqUpToBuf]
  override def outputEncoder: Encoder[Int] = Encoders.scalaInt
}
