package graft

/** Every declared Tier-1 query runs and returns rows on sf0.001 (the full
  * value-level check is the DuckDB oracle — scripts/selfcheck.py / driver t2;
  * this guards against runtime regressions in between).
  */
class Tier1SmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL declared for every query") {
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }

  SparkEntry.all.foreach { q =>
    test(s"${q.name} runs non-empty on sf0.001") {
      assert(q.fn(spark, sf0001).count() > 0, s"${q.name} returned 0 rows")
    }
  }
}
