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
