package graft

import org.apache.spark.sql.functions._

/** Adversarial edge pins for the round-12 declared queries — cases the
  * fixture data cannot force, exercised on synthesized frames through the
  * same expressions the declared queries compile to. */
class Round12Spec extends SparkSpec {

  test("e27 sweep tie: an interval ending exactly when another starts does not count") {
    val sp = spark
    import sp.implicits._
    // interval A = [0, 100), interval B = [100, 200): half-open — at B's
    // start A is CLOSED, concurrency 1; interval C = [50, 150) overlaps B
    val iv = Seq((1L, 10L, 0L, 100L), (1L, 11L, 100L, 200L),
                 (1L, 12L, 50L, 150L))
      .toDF("user_id", "event_id", "s", "e")
    val ev = iv.select(col("user_id"), col("event_id"), col("s").as("t"),
                       lit(1).as("kind"), lit(1L).as("delta"))
      .unionByName(iv.select(col("user_id"), col("event_id"),
                             col("e").as("t"), lit(0).as("kind"),
                             lit(-1L).as("delta")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(asc("t"), asc("kind"), asc("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                   org.apache.spark.sql.expressions.Window.currentRow)
    val got = ev.withColumn("c", sum("delta").over(w).cast("long"))
      .filter(col("kind") === 1)
      .select("event_id", "c").as[(Long, Long)].collect().toMap
    // A opens alone; C overlaps A; B sees only C (A's end at t=100 sorts
    // BEFORE B's start — kind 0 < 1)
    assert(got == Map(10L -> 1L, 12L -> 2L, 11L -> 2L),
      s"half-open sweep tie broken: $got")
  }

  test("h44 short arrays: shift fills the whole array, rotate wraps mod length") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, "x y"), (2L, "a b c d e")).toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .withColumn("n", size(col("t")))
      .withColumn("k", pmod(lit(3), col("n")))
      .select(col("doc_id"),
              array_join(concat(expr("slice(t, k + 1, n - k)"),
                                expr("slice(t, 1, k)")), "|").as("rot3"),
              array_join(concat(expr("slice(t, 4, greatest(0, n - 3))"),
                                expr("slice(array('_', '_', '_'), 1, least(3, n))")),
                "|").as("shl3"))
      .as[(Long, String, String)].collect()
      .map { case (k, v, w) => k -> ((v, w)) }.toMap
    // len 2: rotate by 3 ≡ rotate by 1; shift by 3 fills both slots
    assert(df(1L) == (("y|x", "_|_")), s"len-2 edge: ${df(1L)}")
    assert(df(2L) == (("d|e|a|b|c", "d|e|_|_|_")), s"len-5: ${df(2L)}")
  }

  test("e24 divisor semantics: the short prefix still divides by the window size") {
    val sp = spark
    import sp.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
      .orderBy(asc("i")).rowsBetween(-4, 0)
    val got = Seq((1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L))
      .toDF("k", "i", "c")
      .withColumn("mavg", expr("sum(c) over (partition by k order by i rows between 4 preceding and current row) div 5"))
      .select("i", "mavg").as[(Long, Long)].collect().toMap
    // CH groupArrayMovingAvg divides by n=5 even over 1-3 elements
    assert(got == Map(1L -> 2L, 2L -> 6L, 3L -> 12L), s"prefix divisor: $got")
  }

  test("d53 span guard: a pathological key range fails LOUDLY, not as a row bomb") {
    val sp = spark
    import sp.implicits._
    // one outlier group whose span (10^12) would explode ~10^12 rows —
    // the guard must kill the job with its own message BEFORE the
    // sequence materializes
    val bomb = Seq(("t1", 0L), ("t1", 1000000000000L)).toDF("g", "k")
      .groupBy("g").agg(min("k").as("mn"), max("k").as("mx"))
      .select(explode(graft.engine.Guards.boundedSequence(
        col("mn"), col("mx"), 1000000L, "spec probe")))
    // local mode surfaces the raise as SparkRuntimeException directly;
    // cluster mode wraps it — intercept the common supertype, pin the text
    val err = intercept[Exception] { bomb.count() }
    assert(err.getMessage.contains("dense-spine guard"),
      s"expected the guard's message, got: ${err.getMessage}")
  }

  test("d53 span guard: just-under-the-bound spans and NULL bounds pass through") {
    val sp = spark
    import sp.implicits._
    // span exactly at the bound: allowed (guard is <=)
    val ok = Seq(("t1", 0L), ("t1", 1000000L)).toDF("g", "k")
      .groupBy("g").agg(min("k").as("mn"), max("k").as("mx"))
      .select(explode(graft.engine.Guards.boundedSequence(
        col("mn"), col("mx"), 1000000L, "spec probe")))
    assert(ok.count() == 1000001L)
    // NULL bounds (a group whose key column is all-NULL): the r10 advice
    // fix — assert_true must NOT throw on the NULL condition; the
    // sequence's native NULL result yields zero rows, like the oracle
    val nul = Seq(("t1", Option.empty[Long]), ("t1", Option.empty[Long]))
      .toDF("g", "k")
      .groupBy("g").agg(min("k").as("mn"), max("k").as("mx"))
      .select(explode_outer(graft.engine.Guards.boundedSequence(
        col("mn"), col("mx"), 1000000L, "spec probe")))
    assert(nul.count() == 1L && nul.head.isNullAt(0))
  }
}
