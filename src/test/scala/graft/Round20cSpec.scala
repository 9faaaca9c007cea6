package graft

import graft.engine.Round20cOps

/** k71 pins: the DoReMi update's invariants — each round's weights are a
  * smoothed distribution (sum 1), ordered by excess (multiplicative
  * weights are monotone in the exponent), floored by the uniform
  * smoothing mass, and the second round actually moves them. */
class Round20cSpec extends SparkSpec {

  test("k71: weights are smoothed distributions, monotone in excess, and round 2 moves them") {
    val rows = Round20cOps.k71.fn(spark, sf001).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.length == 20, "one row per source")
    val k = rows.length
    for ((w, name) <- Seq(rows.map(_._3) -> "w1", rows.map(_._4) -> "w2")) {
      assert(math.abs(w.sum - 1.0) < 1e-3, s"$name must sum to ~1: ${w.sum}")
      assert(w.forall(_ >= 0.01 / k - 1e-9),
        s"$name floored by the uniform smoothing mass")
    }
    // multiplicative weights: sort by excess ⇒ weights sorted too (both rounds)
    val byExcess = rows.sortBy(_._2)
    assert(byExcess.map(_._3).sliding(2).forall(p => p(0) <= p(1) + 1e-9),
      "w1 monotone in excess")
    assert(byExcess.map(_._4).sliding(2).forall(p => p(0) <= p(1) + 1e-9),
      "w2 monotone in excess")
    // round 2 sharpens: the max-excess source gains weight, and w2 != w1
    assert(byExcess.last._4 > byExcess.last._3 - 1e-9)
    assert(rows.exists(r => math.abs(r._4 - r._3) > 1e-6),
      "the second multiplicative round must move the mixture")
  }
}
