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
}
