package graft

import org.apache.spark.sql.functions._
import graft.operators.AdaptiveHistogram

/** Guarantee tests for the adaptive histogram (ClickHouse `histogram(N)`
  * analog, Ben-Haim & Tom-Tov construction). Like HeavyHitters, the fine
  * bin structure above capacity is merge-order-dependent BY DESIGN, so
  * the pins are the structure's laws plus the exact regime, not a value
  * oracle. */
class AdaptiveHistogramSpec extends SparkSpec {

  private def cents = graft.engine.Tables.events(spark, sf0001)
    .select(col("event_type"),
            (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"),
            col("user_id"))

  test("exact regime: <= n distinct values gives the exact value histogram") {
    val bins = AdaptiveHistogram.byGroup(cents, "event_type", "user_id", 32)
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(b => (b.getDouble(0), b.getLong(1), b.getLong(2))))
      .toMap
    val truth = cents.groupBy("event_type", "user_id").count().collect()
      .groupBy(_.getString(0))
      .map { case (t, rows) =>
        t -> rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      }
    truth.foreach { case (t, want) =>
      val got = bins(t).map(b => (b._1.toLong, b._2))
      assert(got == want.toSeq,
        s"$t: <=n distinct user ids must bin exactly: got $got want ${want.toSeq}")
      // centroid of an exact bin is the integer value itself
      bins(t).foreach { case (c, n, s) => assert(c == s.toDouble / n) }
    }
  }

  test("insertOne fold vs merge-of-partial-folds: exact regime equal, laws always (200 random trials)") {
    // the r14 reduce() fast path must agree with merge() under EVERY
    // fold/split order: in the exact regime (distinct <= n) bit-equal
    // bins; in the compressed regime the conservation/shape laws
    import graft.operators.AdaptiveHistogram.HistState
    val rnd = new scala.util.Random(42)
    def fold(vs: Seq[Long], n: Int): HistState =
      vs.foldLeft(HistState(Array.empty[Long], Array.empty[Long]))(
        (st, v) => graft.operators.AdaptiveHistogram.insertOne(st, v, n))
    for (trial <- 1 to 200) {
      val n = 2 + rnd.nextInt(15)
      val domain = 1 + rnd.nextInt(25)
      val vs = Seq.fill(5 + rnd.nextInt(60))(
        (rnd.nextInt(domain) - domain / 2).toLong * (1 + rnd.nextInt(1000)))
      val cut = rnd.nextInt(vs.length + 1)
      val whole = fold(vs, n)
      val merged = AdaptiveHistogram.Agg(n)
        .merge(fold(vs.take(cut), n), fold(vs.drop(cut), n))
      // laws, every regime
      for (st <- Seq(whole, merged)) {
        assert(st.sums.length <= n, s"trial $trial: ${st.sums.length} bins > $n")
        assert(st.cnts.sum == vs.length, s"trial $trial: weight conservation")
        assert(st.sums.sum == vs.sum, s"trial $trial: sum conservation")
        val cents = st.sums.zip(st.cnts).map { case (s, c) => s.toDouble / c }
        assert(cents.sameElements(cents.sorted), s"trial $trial: centroid order")
      }
      // exact regime: any fold/merge split gives the exact value histogram
      if (vs.distinct.length <= n) {
        val want = vs.groupBy(identity).toSeq.sortBy(_._1)
          .map { case (v, occ) => (v * occ.length, occ.length.toLong) }
        for (st <- Seq(whole, merged)) {
          val got = st.sums.zip(st.cnts).toSeq
          assert(got == want, s"trial $trial exact regime: $got != $want")
        }
      }
    }
  }

  test("compressed regime: laws hold under capacity pressure and reshuffling") {
    val n = 8
    Seq(cents, cents.repartition(13)).foreach { src =>
      val rows = AdaptiveHistogram.byGroup(src, "event_type", "cents", n).collect()
      val truth = cents.groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum("cents").as("s"),
             min("cents").as("mn"), max("cents").as("mx"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      rows.foreach { r =>
        val (cnt, s, mn, mx) = truth(r.getString(0))
        val bins = r.getSeq[org.apache.spark.sql.Row](1)
          .map(b => (b.getDouble(0), b.getLong(1), b.getLong(2)))
        assert(bins.nonEmpty && bins.length <= n, s"bin count ${bins.length}")
        assert(bins.map(_._2).sum == cnt, "weight conservation")
        assert(bins.map(_._3).sum == s, "sum conservation (exact int64)")
        assert(bins.map(_._1) == bins.map(_._1).sorted, "centroids sorted")
        assert(bins.head._1 >= mn && bins.last._1 <= mx, "centroid envelope")
      }
    }
  }
}
