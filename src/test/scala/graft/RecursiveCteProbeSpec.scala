package graft

/** Probe: does Spark 4.1 support WITH RECURSIVE? (DuckDB 1.0 does.) */
class RecursiveCteProbeSpec extends SparkSpec {
  test("recursive CTE probe") {
    val r = spark.sql(
      """WITH RECURSIVE t(n) AS (
        |  SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 5)
        |SELECT SUM(n) AS s FROM t""".stripMargin).collect().head
    assert(r.getLong(0) == 15L)
  }

  test("b09 depth guard refuses an adversarial gap-free run loudly") {
    import spark.implicits._
    // one user holding event_ids 1..100 consecutively: the CTE would need
    // 100 join rounds — the guard must refuse BEFORE the recursion starts
    val ev = (1L to 100L).map(i => (1L, i)).toDF("user_id", "event_id")
    val e = intercept[IllegalArgumentException] {
      graft.engine.ExtOps.requireRunDepth(ev, bound = 64)
    }
    assert(e.getMessage.contains("100 join rounds"))
    assert(e.getMessage.contains("gaps-and-islands"))
  }

  test("b09 depth guard passes interleaved streams through") {
    import spark.implicits._
    // runs of length ≤ 3 (event_ids 1,2,3 then 7,8): depth = 3, under budget
    val ev = Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 7L), (1L, 8L),
                 (2L, 4L), (2L, 6L)).toDF("user_id", "event_id")
    assert(graft.engine.ExtOps.requireRunDepth(ev, bound = 64) == 3L)
  }
}
