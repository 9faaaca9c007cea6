package graft

import org.apache.spark.sql.functions._
import graft.api.Decorrelate

/** Decorrelate pins: each helper equals the naive correlated/literal
  * formulation it replaces, same-name keys don't trip ambiguous-self-join
  * analysis, and ties are preserved where the pattern demands them. */
class DecorrelateSpec extends SparkSpec {
  import spark.implicits._

  test("withGroupAgg == per-row correlated aggregate (the Q17 shape)") {
    val li = Seq((1L, 2.0), (1L, 10.0), (1L, 30.0), (2L, 4.0), (2L, 8.0))
      .toDF("pk", "q")
    val got = Decorrelate
      .withGroupAgg(li, Seq("pk"), (lit(0.2) * avg($"q")).as("t"))
      .where($"q" < $"t")
      .select("pk", "q").orderBy("pk", "q").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // correlated truth: group means are 14 and 6; thresholds 2.8 / 1.2
    assert(got == Seq((1L, 2.0)), s"got $got")
  }

  test("minByGroupWithTies keeps ALL tied rows; same-name keys don't crash (the Q2 shape)") {
    val cost = Seq((1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 7.0),
                   (2L, 10L, 3.0), (2L, 11L, 4.0)).toDF("pk", "sk", "uc")
    val got = Decorrelate.minByGroupWithTies(cost, Seq("pk"), "uc")
      .select("pk", "sk").orderBy("pk", "sk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 10L), (1L, 11L), (2L, 10L)))
    val gotMax = Decorrelate.maxByGroupWithTies(cost, Seq("pk"), "uc")
      .select("pk", "sk").orderBy("pk", "sk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotMax == Seq((1L, 12L), (2L, 11L)))
    // the data-sized-domain escape hatch returns the same rows without
    // forcing a broadcast build
    val noBc = Decorrelate
      .minByGroupWithTies(cost, Seq("pk"), "uc", broadcastBack = false)
      .select("pk", "sk").orderBy("pk", "sk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(noBc == got)
  }

  test("globalExtremeWithTies: one computation, ties kept, window form (the Q15 shape)") {
    val rev = Seq((1L, 9.0), (2L, 9.0), (3L, 4.0)).toDF("sk", "total")
    val df = Decorrelate.globalExtremeWithTies(rev, "total")
    val got = df.select("sk").orderBy("sk").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L), "both tied maxima must return")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("Window") && !p.contains("Join"),
      s"the extreme must ride a window, not a scalar join:\n$p")
  }

  test("countOfCounts == literal left-join-then-count, zero bucket included (the Q13 shape)") {
    val dim = Seq(1L, 2L, 3L).toDF("ck")
    val fact = Seq(1L, 1L, 2L).toDF("fk")
    val got = Decorrelate.countOfCounts(dim, "ck", fact, "fk")
      .orderBy("c_count").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val literal = dim.join(fact, $"ck" === $"fk", "left")
      .groupBy($"ck").agg(count($"fk").as("c"))
      .groupBy($"c").agg(count(lit(1)).as("n"))
      .orderBy("c").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == literal && got == Seq((0L, 1L), (1L, 1L), (2L, 1L)))
  }
}
