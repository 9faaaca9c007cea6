package graft

import org.apache.spark.sql.functions._

/** Adversarial edge pins for the round-15 declared queries — cases the
  * fixture cannot force, exercised on synthesized frames through the same
  * plans the declared queries compile to. */
class Round15Spec extends SparkSpec {

  test("j21 NULL disambiguation: chain-at-tail vs no-chain vs chain-mid-stream") {
    val sp = spark
    import sp.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(s: Int) = new java.sql.Timestamp(ts0.getTime + s * 1000L)
    // user 1: click->view->purchase mid-stream, then a SECOND chain
    //   click->view at the tail — first_match must answer off the FIRST
    //   chain ('purchase'), n_chains = 2.
    // user 2: chain exactly at the tail — matched but next is NULL.
    // user 3: click and view present but never adjacent — no chain.
    val ev = Seq(
      (1L, t(1), 10L, "click"), (1L, t(2), 11L, "view"),
      (1L, t(3), 12L, "purchase"), (1L, t(4), 13L, "click"),
      (1L, t(5), 14L, "view"),
      (2L, t(1), 20L, "error"), (2L, t(2), 21L, "click"),
      (2L, t(3), 22L, "view"),
      (3L, t(1), 30L, "click"), (3L, t(2), 31L, "error"),
      (3L, t(3), 32L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    ev.createOrReplaceTempView("events_j21")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val isChain = col("event_type") === "click" && col("n1") === "view"
    val got = ev
      .withColumn("n1", lead(col("event_type"), 1).over(w))
      .withColumn("n2", lead(col("event_type"), 2).over(w))
      .withColumn("key", struct(col("ts"), col("event_id")))
      .withColumn("fck", min(when(isChain, col("key"))).over(wAll))
      .groupBy("user_id")
      .agg(max(when(col("key") === col("fck"), col("n2"))).as("nx"),
           sum(when(isChain, 1).otherwise(0)).cast("long").as("nc"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getLong(2)))).toMap
    assert(got(1L) == ((Some("purchase"), 2L)), s"first-match broken: ${got(1L)}")
    assert(got(2L) == ((None, 1L)), s"chain-at-tail broken: ${got(2L)}")
    assert(got(3L) == ((None, 0L)), s"no-chain broken: ${got(3L)}")
  }

  test("d61 equal-x tie: the event_id struct order decides both extremes") {
    val sp = spark
    import sp.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ts2 = java.sql.Timestamp.valueOf("2024-01-01 01:00:00")
    // type "a": TWO rows at the min timestamp (ids 1, 2 — id 1 must win
    // lo) and TWO at the max (ids 3, 4 — id 4 must win hi): slope reads
    // (c4 - c1) / dx. type "b": a single point — dx = 0, dy = 0 (the
    // undefined-in-CH case pinned to the deterministic 0/0 the declared
    // face computes).
    val ev = Seq(
      ("a", ts, 1L, 10.00), ("a", ts, 2L, 99.00),
      ("a", ts2, 3L, 50.00), ("a", ts2, 4L, 70.00),
      ("b", ts, 5L, 42.00)
    ).toDF("event_type", "ts", "event_id", "value")
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
    val got = ev
      .select(col("event_type"),
              struct(col("ts"), col("event_id"), cents.as("c"),
                     unix_micros(col("ts")).as("us")).as("p"))
      .groupBy("event_type")
      .agg(min(col("p")).as("lo"), max(col("p")).as("hi"))
      .select(col("event_type"),
              (col("hi.c") - col("lo.c")).as("dy"),
              (col("hi.us") - col("lo.us")).as("dx"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("a") == ((7000L - 1000L, 3600000000L)),
      s"tie-break extremes broken: ${got("a")}")
    assert(got("b") == ((0L, 0L)), s"single-point group broken: ${got("b")}")
  }
}
