package graft

import org.apache.spark.sql.functions._

/** Adversarial edge pins for the round-14 declared queries — cases the
  * fixture cannot force, exercised on synthesized frames through the same
  * expressions/operators the declared queries compile to. */
class Round14Spec extends SparkSpec {

  test("h50 dense enumeration: repeats, all-same, all-distinct hand cases") {
    val sp = spark
    import sp.implicits._
    val got = Seq(("a b a c", 1L), ("x x x", 2L), ("p q r", 3L))
      .toDF("text", "doc_id")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), array_join(transform(col("t"), x =>
        size(array_distinct(
          slice(col("t"), lit(1), array_position(col("t"), x).cast("int"))))),
        "|").as("d"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "1|2|1|3", s"repeat case: ${got(1L)}")
    assert(got(2L) == "1|1|1", s"all-same case: ${got(2L)}")
    assert(got(3L) == "1|2|3", s"all-distinct case: ${got(3L)}")
  }

  test("e28 ts-dedup bites: a same-hour duplicate is excluded from the fold") {
    val sp = spark
    import sp.implicits._
    // user 1, one hour: 10.00 then a same-hour spike to 99.00, next hour
    // 20.00. WITH dedup: kept rows 10 → 20, delta_sum = 10.00, n_kept 2,
    // n_dropped 1. WITHOUT dedup the spike would contribute 89 and the
    // fall to 20 would clamp — 89.00, not 10.00: the kept answer proves
    // the duplicate row never reached the fold.
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 10.00),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00"), 2L, 99.00),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 3L, 20.00))
      .toDF("user_id", "ts", "event_id", "value")
    val wh = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), date_trunc("hour", col("ts")))
      .orderBy(asc("ts"), asc("event_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val r = ev
      .select(col("user_id"), col("ts"), col("event_id"),
              col("value").cast("decimal(18,2)").as("v"))
      .withColumn("rn", row_number().over(wh))
      .filter(col("rn") === 1)
      .withColumn("d", col("v") - lag(col("v"), 1).over(w))
      .groupBy("user_id")
      .agg(((sum(greatest(col("d"), lit(0).cast("decimal(18,2)"))) * lit(100))
              .cast("long") / lit(100.0)).as("ds"),
           count(lit(1)).as("n_kept"))
      .as[(Long, Double, Long)].collect().head
    assert(r == ((1L, 10.0, 2L)), s"dedup fold broken: $r")
  }

  test("d56 insert-at: multi-insert slot takes MIN, empty slots render '-'") {
    val sp = spark
    import sp.implicits._
    // slot 2 receives 500 then 300 (min wins); slots 0,1,3 empty on a
    // 4-slot spine
    val per = Seq(("t", 2, 500L), ("t", 2, 300L))
      .toDF("typ", "h", "c")
      .groupBy("typ", "h").agg(min("c").as("v"))
      .groupBy("typ")
      .agg(map_from_entries(collect_list(struct(col("h"), col("v")))).as("m"))
      .select(array_join(transform(sequence(lit(0), lit(3)), i =>
        coalesce(element_at(col("m"), i).cast("string"), lit("-"))), "|"))
      .as[String].collect().head
    assert(per == "-|-|300|-", s"insert-at render broken: $per")
  }

  test("d57 MG exact regime: counts exact and tie-ordered under reshuffling") {
    val sp = spark
    import sp.implicits._
    // 6 distinct values, capacity 8 ≥ 6: reduce never decrements, merge
    // never trims — counts must be EXACT and (count DESC, value ASC)
    // ordered regardless of partitioning (10 partitions forces many
    // partial-merge orders). 'b' and 'f' tie at 30 → b first.
    val rows = Seq.fill(40)("a") ++ Seq.fill(30)("b") ++ Seq.fill(30)("f") ++
      Seq.fill(20)("c") ++ Seq.fill(5)("d") ++ Seq.fill(1)("e")
    val df = new scala.util.Random(7).shuffle(rows).toDF("v").repartition(10)
    val out = df.agg(graft.operators.HeavyHitters
        .approxTopK(col("v"), k = 6, capacity = 8).as("tk"))
      .select(explode(col("tk")))
      .select(col("col._1"), col("col._2"))
      .as[(String, Long)].collect().toSeq
    assert(out == Seq("a" -> 40L, "b" -> 30L, "f" -> 30L, "c" -> 20L,
                      "d" -> 5L, "e" -> 1L),
      s"exact-regime counts/order broken: $out")
  }

  test("j20 range frame: a same-timestamp click neither matches nor masks") {
    val sp = spark
    import sp.implicits._
    // user 1: signup at t=100, click at t=100 (same ts — the oracle's
    // c.t > s.t excludes it), click at t=200 (within bound) → the match
    // must be (100, 200): the same-ts click must not match (rows-frame
    // bug #1) and must not MASK the later valid click (rows-frame bug #2).
    // user 2: signup at t=100, only a same-ts click → NO match.
    val ev = Seq((1L, "signup", 100L), (1L, "click", 100L),
                 (1L, "click", 200L),
                 (2L, "signup", 100L), (2L, "click", 100L))
      .toDF("user_id", "event_type", "t")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(asc("t"))
      .rangeBetween(1, org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val got = ev
      .withColumn("next_click",
        min(when(col("event_type") === "click", col("t"))).over(w))
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "signup" &&
                    col("next_click") <= col("t") + 14400000000L,
                    struct(col("t"), col("next_click")))).as("m"))
      .select(col("user_id"), col("m.t"), col("m.next_click"))
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((Some(100L), Some(200L))),
      s"tie must not mask the later click: ${got(1L)}")
    assert(got(2L) == ((None, None)), s"same-ts-only must not match: ${got(2L)}")
  }

  test("j19 backward bases: single-event user and clickless user edges") {
    val sp = spark
    import sp.implicits._
    // user 1: one event only → prev_tail NULL (base row is the first
    //   event), no clicks → prev_last_click NULL, n_clicks 0.
    // user 2: view → click → view: prev_tail = 'click' (before the last
    //   view), prev_last_click = 'view' (before the only click).
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 10:00:00"), 2L, "view"),
      (2L, ts("2024-01-01 11:00:00"), 3L, "click"),
      (2L, ts("2024-01-01 12:00:00"), 4L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val got = ev
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("key", struct(col("ts"), col("event_id")))
      .withColumn("last_key", max(col("key")).over(wAll))
      .withColumn("last_click_key",
        max(when(col("event_type") === "click", col("key"))).over(wAll))
      .groupBy("user_id")
      .agg(max(when(col("key") === col("last_key"), col("prev_type")))
             .as("pt"),
           max(when(col("key") === col("last_click_key"), col("prev_type")))
             .as("pc"),
           sum(when(col("event_type") === "click", 1).otherwise(0)).as("nc"))
      .as[(Long, Option[String], Option[String], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((None, None, 0L)), s"single-event user: ${got(1L)}")
    assert(got(2L) == ((Some("click"), Some("view"), 1L)),
      s"backward bases: ${got(2L)}")
  }
}
