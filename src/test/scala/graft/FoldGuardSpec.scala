package graft

import org.apache.spark.sql.functions._

/** The sorted-collect fold guard (r15 verdict watch item): e20/j10/j11/
  * j16/j18 buffer one user's full event history in a single aggregation
  * buffer before their `aggregate` HOF fold. [[graft.engine.Guards
  * .requireKeyFanout]] is the b09-`requireRunDepth` discipline for that
  * class — a count-only (spillable, OOM-proof) pre-agg that refuses
  * loudly past the documented budget BEFORE any array materializes. */
class FoldGuardSpec extends SparkSpec {

  test("fold guard passes a benign fanout through and reports the hottest key") {
    import spark.implicits._
    val ev = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"), (3L, "e"))
      .toDF("user_id", "v")
    assert(graft.engine.Guards.requireKeyFanout(ev, "user_id", "spec") == 3L)
  }

  test("fold guard refuses a hot key loudly, naming the budget and the escape hatch") {
    import spark.implicits._
    // one user holding 1000 of 1002 rows — a 10%-of-corpus hot key at
    // fixture scale; with bound = 64 the guard must fail BEFORE any
    // collect_list runs
    val ev = ((1L to 1000L).map(i => (42L, i)) ++ Seq((1L, 1L), (2L, 2L)))
      .toDF("user_id", "event_id")
    val e = intercept[IllegalArgumentException] {
      graft.engine.Guards.requireKeyFanout(ev, "user_id", "spec-hot", bound = 64)
    }
    assert(e.getMessage.contains("1000 rows"))
    assert(e.getMessage.contains("budget 64"))
    assert(e.getMessage.contains("streaming twin"))
  }

  test("guarded operators still answer on benign data (guard is pass-through)") {
    import spark.implicits._
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 1L, "signup"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 2L, "click"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), 3L, "purchase"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:04"), 4L, "signup"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val lv = graft.operators.SequenceMatch.funnelLevels(
        ev, "user_id", col("ts"), col("event_id"),
        Seq(col("event_type") === "signup", col("event_type") === "click",
            col("event_type") === "purchase"),
        window = None, mode = "strict_order")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(lv == Map(1L -> 3, 2L -> 1))
  }
}
