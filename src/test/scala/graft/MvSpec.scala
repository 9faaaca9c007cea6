package graft

import org.apache.spark.sql.functions._
import graft.api.Mv

/** Incremental MV maintenance — the algebra the i09 oracle can't see:
  * merge associativity/commutativity, multi-delta chains, and signed
  * retraction (CollapsingMergeTree) incl. zero-collapse key removal. */
class MvSpec extends SparkSpec {

  private val keys = Seq("event_type")

  private def events = graft.engine.Tables.events(spark, sf001)
    .select("event_id", "event_type", "value")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("event_type").collect().map(_.toString).toIndexedSeq

  test("incremental merge over any batch split equals full recompute") {
    val e = events.cache()
    val full = canon(Mv.finalizeState(Mv.aggState(e, keys, "value"), keys))
    // three different splits of the same log, incl. a 3-way chain
    val byThird = e.withColumn("__b", pmod(col("event_id"), lit(3)))
    val parts = (0 to 2).map(i => byThird.filter(col("__b") === i).drop("__b"))
    val chains = Seq(
      Mv.merge(keys, parts.map(Mv.aggState(_, keys, "value")): _*),
      // same states, opposite merge order (commutativity)
      Mv.merge(keys, parts.reverse.map(Mv.aggState(_, keys, "value")): _*),
      // nested merge of merges (associativity)
      Mv.merge(keys,
        Mv.merge(keys, Mv.aggState(parts(0), keys, "value"),
                       Mv.aggState(parts(1), keys, "value")),
        Mv.aggState(parts(2), keys, "value")))
    chains.foreach(st => assert(canon(Mv.finalizeState(st, keys)) == full))
    e.unpersist()
  }

  test("delta with a brand-new key appears; untouched keys keep exact state") {
    val sp = spark
    import sp.implicits._
    val base = Seq((1L, "a", 1.5), (2L, "a", 2.5), (3L, "b", 10.0))
      .toDF("event_id", "event_type", "value")
    val delta = Seq((4L, "zz_new", 7.0)).toDF("event_id", "event_type", "value")
    val mv = Mv.finalizeState(
      Mv.merge(keys, Mv.aggState(base, keys, "value"),
                     Mv.aggState(delta, keys, "value")), keys)
    val rows = mv.orderBy("event_type").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b", "zz_new"))
    assert(rows(0).getLong(1) == 2 && rows(0).getDouble(2) == 4.0)
    assert(rows(2).getLong(1) == 1 && rows(2).getDouble(2) == 7.0)
  }

  test("signed retraction cancels exactly; fully-retracted key vanishes") {
    val sp = spark
    import sp.implicits._
    val ins = Seq((1L, "a", 1.5, 1), (2L, "a", 2.5, 1), (3L, "b", 10.0, 1))
      .toDF("event_id", "event_type", "value", "sign")
    val st0 = Mv.aggStateSigned(ins, keys, "value", col("sign"))
    // retract row 2 and ALL of b (CollapsingMergeTree: emit the old row with sign=-1)
    val retr = Seq((2L, "a", 2.5, -1), (3L, "b", 10.0, -1))
      .toDF("event_id", "event_type", "value", "sign")
    val st1 = Mv.merge(keys, st0, Mv.aggStateSigned(retr, keys, "value", col("sign")))
    val rows = Mv.finalizeState(st1, keys).collect()
    assert(rows.length == 1)                       // b collapsed to zero → gone
    assert(rows(0).getString(0) == "a")
    assert(rows(0).getLong(1) == 1 && rows(0).getDouble(2) == 1.5)
    // null values count in n but not in the avg denominator
    val withNull = Seq((5L, "a", Option.empty[Double], 1))
      .toDF("event_id", "event_type", "value", "sign")
    val st2 = Mv.merge(keys, st1, Mv.aggStateSigned(withNull, keys, "value", col("sign")))
    val a = Mv.finalizeState(st2, keys).collect()(0)
    assert(a.getLong(1) == 2 && a.getDouble(2) == 1.5 && a.getDouble(3) == 1.5)
  }

  test("merged sums survive past the decimal(18,6) range without nulling") {
    // the silent-overflow hazard the (38,6) state width exists for: two
    // states each holding sum ≈ 9e11 merge to 1.8e12 > decimal(18,6) max —
    // a per-merge (18,6) re-cast yields NULL in non-ANSI mode
    val sp = spark
    import sp.implicits._
    val half = Seq((1L, "a", 9.0e11)).toDF("event_id", "event_type", "value")
    val merged = Mv.merge(keys, Mv.aggState(half, keys, "value"),
                                Mv.aggState(half, keys, "value"))
    val r = Mv.finalizeState(merged, keys).collect()(0)
    assert(!r.isNullAt(2), "merged sum must not silently NULL on overflow")
    assert(r.getDouble(2) == 1.8e12)
  }

  test("HLL distinct state: union is order-invariant and idempotent, estimates near exact") {
    val e = events.cache()
    val dkeys = keys
    def est(st: org.apache.spark.sql.DataFrame): Map[String, Long] =
      Mv.finalizeDistinct(st, dkeys)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = est(Mv.aggStateDistinct(e, dkeys, "event_id"))
    val byThird = e.withColumn("__b", pmod(col("event_id"), lit(3)))
    val parts = (0 to 2).map(i => byThird.filter(col("__b") === i).drop("__b"))
    val states = parts.map(Mv.aggStateDistinct(_, dkeys, "event_id"))
    val merged = est(Mv.mergeDistinct(dkeys, states: _*))
    // union is register-wise max → merge ORDER cannot change the result
    val reversed = est(Mv.mergeDistinct(dkeys, states.reverse: _*))
    assert(reversed == merged, "HLL union must be order-invariant")
    // idempotence: re-merging an already-merged delta cannot overcount
    val re = est(Mv.mergeDistinct(dkeys,
      Mv.mergeDistinct(dkeys, states: _*), states(0)))
    assert(re == merged, "HLL re-merge must be idempotent")
    // accuracy: event_id is unique per row, so exact distinct = row count.
    // The unioned sketch and the directly-built sketch may differ by a hair
    // (wider union accumulator type) — BOTH must sit near exact.
    val exact = e.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("full" -> full, "merged" -> merged).foreach { case (tag, m) =>
      m.foreach { case (k, v) =>
        val ex = exact(k)
        assert(math.abs(v - ex).toDouble / ex < 0.05,
          s"$tag/$k: HLL estimate $v vs exact $ex")
      }
    }
    e.unpersist()
  }
}
