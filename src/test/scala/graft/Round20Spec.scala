package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Round20Ops

/** Round-16 pins: the TPC-H correlated-subquery shapes (c21/c22/c23)
  * keep their decorrelated broadcast plans, and k69 stays map-only. */
class Round20Spec extends SparkSpec {

  private def plan(df: DataFrame): String = {
    df.collect()
    // AQE's toString carries "== Final Plan ==" AND "== Initial Plan ==";
    // pin the FINAL one only (the PlanShapeSpec discipline)
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("c21 Q17 shape: both the brand slice and the threshold frame broadcast; no per-row subquery, no SMJ") {
    val p = plan(Round20Ops.c21.fn(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), s"threshold side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no fact-side sort-merge at this shape:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    // decorrelated: exactly three hash joins — the brand slice joins in
    // under BOTH passes (threshold agg + probe; Q17 reads the fact twice
    // by design) plus the threshold-back join — never one join per row
    assert("BroadcastHashJoin".r.findAllIn(p).length == 3, s"three joins exactly:\n$p")
  }

  test("c22 Q20 shape: the qualifying-supplier set drives a broadcast LEFT SEMI into the dimension") {
    val p = plan(Round20Ops.c22.fn(spark, sf0001))
    assert(p.contains("LeftSemi"), s"the IN-subquery must plan as a semi join:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("c23 Q21 shape: aggregation decorrelation — no semi/anti joins, dimension broadcast, fact joins hash") {
    val p = plan(Round20Ops.c23.fn(spark, sf0001))
    // the EXISTS pair is gone: the per-order regroup replaces both
    assert(!p.contains("LeftSemi") && !p.contains("LeftAnti"),
      s"the regroup form must not re-plan the correlated EXISTS pair:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"supplier x nation must broadcast:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("c23 regroup form == literal EXISTS form on an adversarial micro-fixture") {
    // two independent formulations must agree (the j10 oracle discipline):
    // orders covering every branch — single-supplier flagged (EXISTS
    // fails), multi-supplier with two flagged (NOT EXISTS fails),
    // multi-supplier with one flagged (qualifies), flagged line in a
    // non-'F' order (status filter), and a supplier with two flagged
    // lines in one qualifying order (numwait counts LINES, not orders)
    import spark.implicits._
    val li = Seq(
      (1L, 10L, "R"), (1L, 11L, "N"),             // qualifies for supp 10
      (2L, 10L, "R"),                             // single-supplier: no
      (3L, 10L, "R"), (3L, 11L, "R"),             // two flagged: no
      (4L, 12L, "R"), (4L, 12L, "R"), (4L, 13L, "N"), // two LINES for 12
      (5L, 13L, "R"), (5L, 10L, "N")              // qualifies for supp 13
    ).toDF("l_orderkey", "l_suppkey", "l_returnflag")
    val orders = Seq((1L, "F"), (2L, "F"), (3L, "F"), (4L, "F"), (5L, "O"))
      .toDF("o_orderkey", "o_orderstatus")
    // regroup form (the c23 plan body, inlined on the micro frames):
    // stacked exact aggs — (order,supp) flag-max, then count/sum — the
    // measured 30%-faster replacement for the multi-distinct Expand
    val perOrder = li.groupBy("l_orderkey", "l_suppkey")
      .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("fl"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("ns"), sum(col("fl")).as("nrs"))
    val re = li.filter(col("l_returnflag") === "R")
      .join(orders.filter(col("o_orderstatus") === "F").select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"))
      .join(perOrder, "l_orderkey")
      .where(col("ns") >= 2 && col("nrs") === 1)
      .groupBy("l_suppkey").agg(count(lit(1)).as("numwait"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // literal EXISTS form via SQL on the same frames
    li.createOrReplaceTempView("mli"); orders.createOrReplaceTempView("mord")
    val ex = spark.sql(
      """SELECT l1.l_suppkey, COUNT(*) AS numwait
        |FROM mli l1 JOIN mord ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM mli l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM mli l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY 1""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re == ex, s"regroup $re vs EXISTS $ex")
    assert(re == Map(10L -> 1L, 12L -> 2L), s"branch coverage: $re")
  }

  test("k69 classifier: map-only plan (no join, no aggregate) and the flag bites both ways") {
    val df = Round20Ops.k69.fn(spark, sf0001)
    val p = plan(df)
    assert(!p.contains("Join"), s"k69 must be join-free:\n$p")
    assert(!p.contains("HashAggregate"), s"k69 must be aggregation-free:\n$p")
    val sel = df.groupBy("selected").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sel.keySet == Set(0, 1) && sel(0) > 0 && sel(1) > 0,
      s"the frozen weights must split the corpus, not rubber-stamp it: $sel")
  }

  test("k69 score is the exact frozen dot: hand-computed document") {
    import spark.implicits._
    // "the a the x" -> nt=4, nu=3 (the,a,x), ns=3, nc=11
    // zi = 200*3 - 60*4 + 80*3 - 2*11 - 1000 = 600-240+240-22-1000 = -422
    // z = -0.422, sigma = 1/(1+e^0.422)
    val docs = Seq((7L, "the a the x", "en", "src0", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("k69").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val r = Round20Ops.k69.fn(spark, dir).collect().head
    val want = BigDecimal(1.0 / (1.0 + math.exp(0.422)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(1) == 4L)
    assert(r.getDouble(2) == want, s"${r.getDouble(2)} vs $want")
    assert(r.getInt(3) == 0)
  }
}
