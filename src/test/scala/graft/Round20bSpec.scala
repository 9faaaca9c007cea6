package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Round20bOps

/** Round-16 second-batch pins: the remaining TPC-H shapes (c24/c25/c26,
  * d62–d65) keep their decorrelated / pre-aggregated broadcast plans, and
  * the two-formulation equivalences (d63 pre-agg vs literal, c24
  * decorrelated min vs per-row subquery) hold on adversarial micro
  * frames. */
class Round20bSpec extends SparkSpec {

  private def plan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("c24 Q2 shape: the per-part min frame broadcasts back; no SMJ, no per-row subquery") {
    val p = plan(Round20bOps.c24.fn(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), s"min frame must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no fact-side sort-merge:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("c24 decorrelated min == per-row correlated min on a tie-carrying micro frame") {
    // the equality join back must return ALL tied suppliers (Q2 semantics)
    import spark.implicits._
    val cost = Seq(
      (1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 7.0), // tie at the min
      (2L, 10L, 3.0), (2L, 11L, 4.0)                  // unique min
    ).toDF("pk", "sk", "uc")
    val mc = cost.groupBy("pk").agg(min($"uc").as("m"))
      .withColumnRenamed("pk", "mpk")
    val got = cost.join(mc, $"pk" === $"mpk" && $"uc" === $"m")
      .select($"pk", $"sk").orderBy("pk", "sk").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 10L), (1L, 11L), (2L, 10L)))
  }

  test("c25 Q19 shape: disjunctive predicate still drives ONE broadcast hash join, residual post-join") {
    // sf0.01, not sf0.001: the 200-part micro fixture has no rows in the
    // three brand∩size branches, and AQE folds the empty build side to
    // EmptyRelation — there would be no join to pin
    val p = plan(Round20bOps.c25.fn(spark, sf001))
    assert("BroadcastHashJoin".r.findAllIn(p).length == 1,
      s"exactly one hash join on the extracted equi-key:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the OR must not force a nested-loop shape:\n$p")
  }

  test("c25 part-side union pushdown loses no rows vs the unfiltered join") {
    // the pre-filter (brand ∩ size unions) must be implied by the full
    // predicate: recompute without it and compare the 1-row aggregate
    // (sf0.01 — the sf0.001 slice is empty and would compare 0 == 0)
    val dir = sf001
    val full = graft.engine.Tables.lineitem(spark, dir)
      .join(graft.engine.Tables.part(spark, dir),
            col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#12" && col("l_quantity").between(1, 11) &&
          col("p_size").between(1, 5)) ||
        (col("p_brand") === "Brand#23" && col("l_quantity").between(10, 20) &&
          col("p_size").between(1, 10)) ||
        (col("p_brand") === "Brand#34" && col("l_quantity").between(20, 30) &&
          col("p_size").between(1, 15)))
      .count()
    val declared = Round20bOps.c25.fn(spark, dir)
      .collect()(0).getLong(1)
    assert(declared == full, s"pushdown changed the row set: $declared != $full")
  }

  test("c26 Q15 shape: ONE fact pass — the max is a window over the aggregated frame, not a second branch") {
    val p = plan(Round20bOps.c26.fn(spark, sf0001))
    assert(p.contains("Window"), s"global max must ride the dimension-sized window:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"supplier dimension must broadcast:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    // the scalar-subquery form re-scanned lineitem (AQE canonicalization
    // broke ReusedExchange on the normalized double key — measured); the
    // window form is pinned to exactly one lineitem scan
    val scans = "FileScan parquet".r.findAllIn(p).length
    assert(scans == 2, s"exactly lineitem + supplier scans, got $scans:\n$p")
  }

  test("d62 Q11 shape: the global total reuses the part-sized exchange (one fact pass)") {
    val p = plan(Round20bOps.d62.fn(spark, sf0001))
    assert(p.contains("ReusedExchange"),
      s"the share denominator must re-aggregate v's exchange, not rescan:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("d63 Q13 shape: orders pre-aggregate BEFORE the outer join; zero bucket carries rows") {
    val df = Round20bOps.d63.fn(spark, sf0001)
    val p = plan(df)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    val rows = df.collect()
    val zero = rows.find(_.getLong(0) == 0L)
    assert(zero.isDefined && zero.get.getLong(1) > 0,
      "the LEFT-JOIN zero bucket must carry customers")
  }

  test("d63 pre-agg form == literal left-join-then-count on a micro frame") {
    import spark.implicits._
    val cust = Seq(1L, 2L, 3L).toDF("ck")
    val ords = Seq((1L, "U"), (1L, "U"), (2L, "X")).toDF("ok_cust", "prio")
    // literal Q13: left join raw orders, COUNT(matching order keys)
    val literal = cust.join(ords, $"ck" === $"ok_cust" && $"prio" === "U", "left")
      .groupBy($"ck").agg(count($"ok_cust").as("c"))
      .groupBy($"c").agg(count(lit(1)).as("d"))
      .orderBy("c").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // pre-agg form (the d63 plan body)
    val pre = ords.filter($"prio" === "U").groupBy($"ok_cust")
      .agg(count(lit(1)).as("cnt"))
    val preagg = cust.join(pre, $"ck" === $"ok_cust", "left")
      .select(coalesce($"cnt", lit(0L)).as("c"))
      .groupBy($"c").agg(count(lit(1)).as("d"))
      .orderBy("c").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // cust 1 has TWO 'U' orders (c=2), custs 2 and 3 have none (c=0)
    assert(literal == preagg && literal == Seq((0L, 2L), (2L, 1L)))
  }

  test("d64 Q18 shape: the rare HAVING frame and the customer dimension both broadcast") {
    val p = plan(Round20bOps.d64.fn(spark, sf0001))
    assert("BroadcastHashJoin".r.findAllIn(p).length == 2,
      s"both joins must broadcast (big set is rare, customer is a dim):\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("d64 threshold bites: qualifying orders exist and are rare") {
    val n = Round20bOps.d64.fn(spark, sf0001).count()
    val total = graft.engine.Tables.orders(spark, sf0001).count()
    assert(n > 0 && n < total / 20, s"$n of $total should be a rare slice")
  }

  test("d65 Q22 shape: anti join present; threshold broadcast is the declared 1-row BNLJ") {
    val p = plan(Round20bOps.d65.fn(spark, sf0001))
    assert(p.contains("LeftAnti"), s"NOT EXISTS must plan as an anti join:\n$p")
    assert(!p.contains("CartesianProduct"))
    val rows = Round20bOps.d65.fn(spark, sf0001).collect()
    assert(rows.nonEmpty, "the urgent-order anti slice must keep survivors")
    assert(rows.map(_.getInt(0)).toSeq.sorted == rows.map(_.getInt(0)).toSeq,
      "cntrycode order")
  }
}
