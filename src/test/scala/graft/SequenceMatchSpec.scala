package graft

import org.apache.spark.sql.functions._
import graft.operators.SequenceMatch
import graft.operators.SequenceMatch.{AnyGap, Step, TimeGap}

/** Unit coverage for the sequenceMatch pattern compiler. The six declared
  * queries (j05/j07/j08/j10/j11/j12) are its oracle-gated regression
  * fixtures; this spec covers the grammar itself and the synthetic edge
  * cases the fixture can't force — above all the non-greedy
  * time-constraint case that motivates the closed-form plans. */
class SequenceMatchSpec extends SparkSpec {

  private val S = 1000000L // one second in micros

  private def events(rows: (Long, Long, Long, String)*) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("k", "ts", "id", "e")
  }

  private def conds = Seq(col("e") === "a", col("e") === "b", col("e") === "c")

  private def matchedKeys(df: org.apache.spark.sql.DataFrame,
                          pattern: String): Set[Long] = {
    val sp = spark
    import sp.implicits._
    SequenceMatch.withMatch(df, "k", col("ts"), col("id"), conds, pattern, "m")
      .groupBy("k").agg(max("m").as("m"))
      .filter(col("m") === 1).select("k").as[Long].collect().toSet
  }

  test("parse: tokens, bounds, and malformed patterns") {
    assert(SequenceMatch.parse("(?1).*(?2)", 2) ==
      Vector(Step(1), AnyGap, Step(2)))
    assert(SequenceMatch.parse("(?1)(?t<=3600)(?2)", 2) ==
      Vector(Step(1), TimeGap("<=", 3600L * S), Step(2)))
    assert(SequenceMatch.parse("(?1)(?2)(?3)", 3) ==
      Vector(Step(1), Step(2), Step(3)))
    intercept[IllegalArgumentException](SequenceMatch.parse("(?3)", 2))
    intercept[IllegalArgumentException](SequenceMatch.parse("(?1).*", 1))
    intercept[IllegalArgumentException](SequenceMatch.parse(".*(?1)", 1))
    intercept[IllegalArgumentException](SequenceMatch.parse("(?1).*.*(?2)", 2))
    intercept[IllegalArgumentException](SequenceMatch.parse("(?1)(?t==5)(?2)", 2))
    intercept[IllegalArgumentException](SequenceMatch.parse("(?1)(?t<=x)(?2)", 2))
    intercept[IllegalArgumentException](SequenceMatch.parse("(?1", 1))
    intercept[IllegalArgumentException](SequenceMatch.parse("xx", 1))
  }

  test("subsequence patterns: .* gaps chain greedily and correctly") {
    // key 1: a..b..c in order; key 2: c before a,b (no a-b-c chain);
    // key 3: a and c only
    val df = events(
      (1L, 1 * S, 1, "a"), (1L, 2 * S, 2, "x"), (1L, 3 * S, 3, "b"),
      (1L, 4 * S, 4, "c"),
      (2L, 1 * S, 5, "c"), (2L, 2 * S, 6, "a"), (2L, 3 * S, 7, "b"),
      (3L, 1 * S, 8, "a"), (3L, 2 * S, 9, "c"))
    assert(matchedKeys(df, "(?1).*(?2).*(?3)") == Set(1L))
    assert(matchedKeys(df, "(?1).*(?2)") == Set(1L, 2L))
    assert(matchedKeys(df, "(?1).*(?3)") == Set(1L, 3L))
    assert(matchedKeys(df, "(?3)") == Set(1L, 2L, 3L))
  }

  test("adjacency runs: consecutive steps must be stream-consecutive") {
    // key 1: a b adjacent, then c later; key 2: a x b — the run breaks
    val df = events(
      (1L, 1 * S, 1, "a"), (1L, 2 * S, 2, "b"), (1L, 5 * S, 3, "x"),
      (1L, 6 * S, 4, "c"),
      (2L, 1 * S, 5, "a"), (2L, 2 * S, 6, "x"), (2L, 3 * S, 7, "b"),
      (2L, 4 * S, 8, "c"))
    assert(matchedKeys(df, "(?1)(?2)") == Set(1L))
    assert(matchedKeys(df, "(?1)(?2).*(?3)") == Set(1L))
    assert(matchedKeys(df, "(?1).*(?2).*(?3)") == Set(1L, 2L))
    // same-ts rows order by the tie column — b(id=11) follows a(id=10)
    val tied = events((9L, 1 * S, 10, "a"), (9L, 1 * S, 11, "b"))
    assert(matchedKeys(tied, "(?1)(?2)") == Set(9L))
  }

  test("(?t<=N): the non-greedy case the closed form exists for") {
    // a@0, a@90, b@100: greedy-earliest picks a@0 (gap 100 > 20 s) and
    // would MISS the a@90→b match; the nearest-preceding running max
    // finds it. This is exactly why longer time-constrained patterns are
    // rejected instead of greedily compiled.
    val df = events(
      (1L, 0 * S, 1, "a"), (1L, 90 * S, 2, "a"), (1L, 100 * S, 3, "b"),
      (2L, 0 * S, 4, "a"), (2L, 100 * S, 5, "b")) // only gap 100: no match
    assert(matchedKeys(df, "(?1)(?t<=20)(?2)") == Set(1L))
    assert(matchedKeys(df, "(?1)(?t<20)(?2)") == Set(1L))
    assert(matchedKeys(df, "(?1)(?t<=100)(?2)") == Set(1L, 2L))
    assert(matchedKeys(df, "(?1)(?t<100)(?2)") == Set(1L))
  }

  test("(?t>N): cooldown uses the earliest preceding step, maximizing the gap") {
    // a@0, b@10 (gap 10), b@200 (gap 200 from the FIRST a)
    val df = events(
      (1L, 0 * S, 1, "a"), (1L, 10 * S, 2, "b"), (1L, 200 * S, 3, "b"),
      (2L, 0 * S, 4, "a"), (2L, 10 * S, 5, "b")) // max gap 10: no cooldown hit
    assert(matchedKeys(df, "(?1)(?t>100)(?2)") == Set(1L))
    assert(matchedKeys(df, "(?1)(?t>=200)(?2)") == Set(1L))
    assert(matchedKeys(df, "(?1)(?t>200)(?2)") == Set.empty[Long])
    assert(matchedKeys(df, "(?1)(?t>5)(?2)") == Set(1L, 2L))
  }

  test("one time constraint composes with .* gaps and runs; two are rejected") {
    // (?1).*(?2)(?t<=20)(?3) — key 1 carries the OPENER trap: the
    // greedy-earliest valid b (b@10) fails the bound, the nearest (b@90)
    // passes; key 3 carries the VALIDITY trap: its only close b precedes
    // the a, so no (?1)-prefixed opener exists despite a tight b→c gap
    val df = events(
      (1L, 0 * S, 1, "a"), (1L, 10 * S, 2, "b"), (1L, 90 * S, 3, "b"),
      (1L, 100 * S, 4, "c"),
      (2L, 0 * S, 5, "a"), (2L, 10 * S, 6, "b"), (2L, 100 * S, 7, "c"),
      (3L, 90 * S, 8, "b"), (3L, 95 * S, 9, "a"), (3L, 100 * S, 10, "c"))
    assert(matchedKeys(df, "(?1).*(?2)(?t<=20)(?3)") == Set(1L))
    assert(matchedKeys(df, "(?1).*(?2)(?t<=90)(?3)") == Set(1L, 2L))
    // lower bound + suffix: the pair must close early enough for a c AFTER
    // the closing b — key 4 has one, key 5's c precedes the qualifying b
    val df2 = events(
      (4L, 0 * S, 1, "a"), (4L, 10 * S, 2, "b"), (4L, 60 * S, 3, "b"),
      (4L, 70 * S, 4, "c"),
      (5L, 0 * S, 5, "a"), (5L, 55 * S, 6, "c"), (5L, 60 * S, 7, "b"))
    assert(matchedKeys(df2, "(?1)(?t>50)(?2).*(?3)") == Set(4L))
    assert(matchedKeys(df2, "(?1)(?t>5)(?2).*(?3)") == Set(4L))
    // adjacency run OPENING the pair: gap measured from the run's LAST
    // event; an intervening event breaks the run, not the time check
    val df3 = events(
      (6L, 0 * S, 1, "a"), (6L, 1 * S, 2, "b"), (6L, 15 * S, 3, "c"),
      (7L, 0 * S, 4, "a"), (7L, 1 * S, 5, "x"), (7L, 2 * S, 6, "b"),
      (7L, 15 * S, 7, "c"))
    assert(matchedKeys(df3, "(?1)(?2)(?t<=20)(?3)") == Set(6L))
    assert(matchedKeys(df3, "(?1).*(?2)(?t<=20)(?3)") == Set(6L, 7L))
    // two time constraints: rejected loudly (Pareto state, not extremum)
    val err = intercept[IllegalArgumentException] {
      SequenceMatch.withMatch(events((1L, 0 * S, 1, "a")), "k", col("ts"),
        col("id"), conds, "(?1)(?t<=10)(?2)(?t<=10)(?3)", "m")
    }
    assert(err.getMessage.contains("ONE time constraint"))
  }

  test("countChains: bracket-matching closed form on adversarial orders") {
    val sp = spark
    import sp.implicits._
    def chains(rows: (Long, Long, Long, String)*): Map[Long, Long] =
      SequenceMatch.countChains(events(rows: _*), "k", col("ts"), col("id"),
          col("e") === "a", col("e") === "b")
        .as[(Long, Long)].collect().toMap
    assert(chains((1L, 1 * S, 1, "a"), (1L, 2 * S, 2, "b"),
                  (1L, 3 * S, 3, "a"), (1L, 4 * S, 4, "b")) == Map(1L -> 2L))
    assert(chains((1L, 1 * S, 1, "b"), (1L, 2 * S, 2, "b"),
                  (1L, 3 * S, 3, "a"), (1L, 4 * S, 4, "a")) == Map(1L -> 0L))
    assert(chains((1L, 1 * S, 1, "a"), (1L, 2 * S, 2, "b"),
                  (1L, 3 * S, 3, "b")) == Map(1L -> 1L))
    assert(chains((1L, 1 * S, 1, "b"), (1L, 2 * S, 2, "a"),
                  (1L, 3 * S, 3, "b"), (1L, 4 * S, 4, "b")) == Map(1L -> 1L))
  }

  private def foldOf(df: org.apache.spark.sql.DataFrame, pattern: String,
                     skip: Boolean = false): Map[Long, (Int, Long, Long)] =
    SequenceMatch.foldMatch(df, "k", col("ts"), col("id"), conds, pattern,
        skipNonMatching = skip)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("foldMatch: two time bounds decided exactly where greedy commits wrong") {
    // The Pareto case the per-row compiler rejects: S_2 = {b@5, b@15}.
    // key 1, '(?1)(?t<=20)(?2)(?t>50)(?3)': c@60 needs a b BEFORE t−50=10
    // — only b@5 (the MIN frontier); a compile committed to the nearest
    // preceding b (15) would miss it.
    // key 2, '(?1)(?t<=20)(?2)(?t<=20)(?3)': c@30 needs a b AT/after
    // t−20=10 — only b@15 (the MAX frontier); a compile committed to the
    // earliest valid b (5) would miss it. Keeping BOTH extrema is exactly
    // why the fold is exact.
    val df = events(
      (1L, 0 * S, 1, "a"), (1L, 5 * S, 2, "b"), (1L, 15 * S, 3, "b"),
      (1L, 60 * S, 4, "c"),
      (2L, 0 * S, 5, "a"), (2L, 5 * S, 6, "b"), (2L, 15 * S, 7, "b"),
      (2L, 30 * S, 8, "c"),
      // key 3: the b→c gap (45) satisfies NEITHER pattern's last bound
      (3L, 0 * S, 9, "a"), (3L, 5 * S, 10, "b"), (3L, 50 * S, 11, "c"))
    val lower = foldOf(df, "(?1)(?t<=20)(?2)(?t>50)(?3)")
    assert(lower(1L) == ((1, 1L, 4L)), s"min-frontier case: ${lower(1L)}")
    assert(lower(2L)._1 == 0 && lower(3L)._1 == 0)
    val upper = foldOf(df, "(?1)(?t<=20)(?2)(?t<=20)(?3)")
    assert(upper(2L) == ((1, 1L, 4L)), s"max-frontier case: ${upper(2L)}")
    assert(upper(1L)._1 == 0 && upper(3L)._1 == 0)
  }

  test("foldMatch: sentinel edges — unreached positions, equal ts, repeated condition") {
    // unreached: only closing-condition events → no position ever
    // completes, the ±2^62 sentinels must auto-fail every gap check
    val only = events((1L, 1 * S, 1, "c"), (1L, 2 * S, 2, "c"))
    assert(foldOf(only, "(?1).*(?2).*(?3)")(1L) == ((0, 0L, 2L)))
    // equal timestamps: strictly-earlier chaining is by (ts, id) — the
    // pre-update acc sees a@10(id=1) before b@10(id=2), and a zero gap
    // passes <=0 but not >0
    val tied = events((1L, 10 * S, 1, "a"), (1L, 10 * S, 2, "b"))
    assert(foldOf(tied, "(?1)(?t<=0)(?2)")(1L)._1 == 1)
    assert(foldOf(tied, "(?1)(?t>0)(?2)")(1L)._1 == 0)
    // repeated condition '(?1).*(?1)': ONE event cannot complete both
    // positions (acc is pre-update — strictly earlier events only)
    val one = events((1L, 1 * S, 1, "a"))
    val two = events((2L, 1 * S, 1, "a"), (2L, 2 * S, 2, "a"))
    assert(foldOf(one, "(?1).*(?1)")(1L)._1 == 0)
    assert(foldOf(two, "(?1).*(?1)")(2L) == ((1, 1L, 2L)))
  }

  test("foldMatch agrees with withMatch on every single-bound explicit-gap pattern") {
    // deterministic pseudo-random stream (fixed seed), 6 keys × 40 events
    val rnd = new scala.util.Random(42)
    val rows = for (k <- 1L to 6L; i <- 1 to 40) yield
      (k, rnd.nextInt(600).toLong * S, k * 1000 + i,
       Seq("a", "b", "c", "x")(rnd.nextInt(4)))
    val df = events(rows: _*)
    for (p <- Seq("(?1).*(?2)", "(?1)(?t<=7)(?2)", "(?1)(?t<7)(?2)",
                  "(?1)(?t>30)(?2)", "(?1)(?t>=30)(?2)",
                  "(?1).*(?2)(?t<=50)(?3)", "(?1)(?t>10)(?2).*(?3)")) {
      val viaWindow = matchedKeys(df, p)
      val viaFold = foldOf(df, p).collect { case (k, (1, _, _)) => k }.toSet
      assert(viaFold == viaWindow, s"pattern $p: fold $viaFold vs window $viaWindow")
    }
  }

  test("foldMatch: adjacency and 63+ conditions are rejected loudly") {
    val df = events((1L, 1 * S, 1, "a"))
    val adj = intercept[IllegalArgumentException] {
      SequenceMatch.foldMatch(df, "k", col("ts"), col("id"), conds, "(?1)(?2)")
    }
    assert(adj.getMessage.contains("explicit gap"))
    val wide = intercept[IllegalArgumentException] {
      SequenceMatch.foldMatch(df, "k", col("ts"), col("id"),
        (1 to 63).map(i => col("e") === s"t$i"), "(?1).*(?2)")
    }
    assert(wide.getMessage.contains("62"))
  }

  test("skipNonMatching: the CH skip-rule dialect flips adjacency answers") {
    // a view between click and purchase: stream-adjacency fails, the CH
    // skip rule (non-condition events dropped before positions) matches —
    // the j14-vs-CH divergence the mode exists to resolve
    val sp = spark
    import sp.implicits._
    val df = events((1L, 1 * S, 1, "a"), (1L, 2 * S, 2, "x"),
                    (1L, 3 * S, 3, "b"))
    assert(matchedKeys(df, "(?1)(?2)") == Set.empty[Long])
    val skipped = SequenceMatch.withMatch(df, "k", col("ts"), col("id"),
        conds, "(?1)(?2)", "m", skipNonMatching = true)
      .groupBy("k").agg(max("m").as("m"))
      .filter(col("m") === 1).select("k").as[Long].collect().toSet
    assert(skipped == Set(1L))
    // and it is semantics-preserving for explicit gaps: same answer with .*
    assert(matchedKeys(df, "(?1).*(?2)") == Set(1L))
    // foldMatch's skip mode counts only condition-matching events
    assert(foldOf(df, "(?1).*(?2)", skip = true)(1L) == ((1, 1L, 2L)))
    assert(foldOf(df, "(?1).*(?2)")(1L) == ((1, 1L, 3L)))
  }

  test("countChainsBounded: span-disjoint greedy with restart, both bound directions") {
    val sp = spark
    import sp.implicits._
    def counts(op: String, boundSec: Long, rows: (Long, Long, Long, String)*): Map[Long, Long] =
      SequenceMatch.countChainsBounded(events(rows: _*), "k", col("ts"),
          col("id"), col("e") === "a", col("e") === "b", op, boundSec * S)
        .select("k", "n_chains").as[(Long, Long)].collect().toMap
    // the opener extremum: A@0, A@60, B@100 with <=50 — only the LATEST
    // A (60) is in bound; a first-A-only automaton would count 0
    assert(counts("<=", 50, (1L, 0 * S, 1, "a"), (1L, 60 * S, 2, "a"),
                  (1L, 100 * S, 3, "b")) == Map(1L -> 1L))
    // restart: two full chains back-to-back
    assert(counts("<=", 15, (1L, 0 * S, 1, "a"), (1L, 10 * S, 2, "b"),
                  (1L, 20 * S, 3, "a"), (1L, 30 * S, 4, "b")) == Map(1L -> 2L))
    // SPAN-disjoint (the CH restart rule): A@0, A@5, B@10, B@12 — the
    // first match consumes the span THROUGH B@10, discarding A@5, so the
    // second B has no opener; an event-disjoint maximal matching would
    // find 2 — this pins which semantics ships
    assert(counts("<=", 20, (1L, 0 * S, 1, "a"), (1L, 5 * S, 2, "a"),
                  (1L, 10 * S, 3, "b"), (1L, 12 * S, 4, "b")) == Map(1L -> 1L))
    // lower bound uses the EARLIEST opener and restarts the same way
    assert(counts(">", 50, (1L, 0 * S, 1, "a"), (1L, 5 * S, 2, "b"),
                  (1L, 100 * S, 3, "b")) == Map(1L -> 1L))
    assert(counts(">", 50, (2L, 0 * S, 1, "a"), (2L, 60 * S, 2, "b"),
                  (2L, 70 * S, 3, "a"), (2L, 140 * S, 4, "b")) == Map(2L -> 2L))
    // equal-ts tie: the A sorts first by id, a zero gap passes <=0
    assert(counts("<=", 0, (3L, 10 * S, 1, "a"), (3L, 10 * S, 2, "b")) ==
      Map(3L -> 1L))
    // no events matching either condition: zero chains, not an error
    assert(counts("<=", 10, (4L, 1 * S, 1, "x")) == Map(4L -> 0L))
  }

  test("generated k-step folds reproduce the shipped 3-step fold strings") {
    // j10 shipped this exact text; StreamingStrictFunnel mirrors it in
    // Scala — the generator must never drift for k = 3
    assert(SequenceMatch.strictStepSql(3).replaceAll("\\s+", " ").trim ==
      ("CASE WHEN acc >= 10 THEN acc WHEN acc = 3 THEN 3 " +
       "WHEN acc = 0 THEN (CASE WHEN s = 1 THEN 1 ELSE 0 END) " +
       "WHEN s = acc + 1 THEN acc + 1 ELSE 10 + acc END"))
    intercept[IllegalArgumentException](SequenceMatch.strictStepSql(10))
    intercept[IllegalArgumentException](SequenceMatch.dedupStepSql(8))
  }
}
