package graft

import org.apache.spark.sql.functions._

/** Round-23 operator semantics: k76 weighted systematic (PPS) sampling.
  * The fixture-level oracle equality is the selfcheck's job; these pin the
  * sampling LAWS the closed form must satisfy (exact-n totals, the
  * variance-free rounding band) plus a hand-corpus closed form and the k64
  * partitioning invariance.
  */
class Round23Spec extends SparkSpec {
  import spark.implicits._

  private def hitsOf(df: org.apache.spark.sql.DataFrame, n: Long) = {
    val run = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(asc("doc_id"))
    val whole = org.apache.spark.sql.expressions.Window.partitionBy("source")
    df.withColumn("c", sum("w").over(run))
      .withColumn("tot", sum("w").over(whole))
      .withColumn("hits", expr(
        s"(c * $n + tot - 1) div tot - ((c - w) * $n + tot - 1) div tot"))
  }

  test("laws on the fixture: per-source hits sum to n exactly; every doc inside the rounding band") {
    val docs = graft.engine.Tables.documents(spark, sf001)
      .select(col("source"), col("doc_id"),
              size(split(col("text"), " ")).cast("long").as("w"))
    val h = hitsOf(docs, 10L)
    // Σ hits = n per source, exactly — the systematic-design total
    val sums = h.groupBy("source").agg(sum("hits").as("s"))
      .filter(col("s") =!= 10L).count()
    assert(sums == 0L, "a source's hits do not sum to n")
    // hits_i ∈ [floor(n·w/W), ceil(n·w/W)] — variance-free rounding
    val out = h.filter(
      col("hits") < expr("(w * 10) div tot") ||
      col("hits") > expr("(w * 10 + tot - 1) div tot")).count()
    assert(out == 0L, "a doc's hits left the floor/ceil share band")
  }

  test("hand corpus closed form: equal weights, n dividing the count") {
    // one source, 6 docs of weight 5 (W=30), n=3: t_j = 0,10,20 land in
    // docs 1, 3, 5 (c-intervals [0,5),[5,10),[10,15),...) — exactly every
    // second doc, hits 1 each
    val docs = (1L to 6L).map(i => ("s", i, 5L)).toDF("source", "doc_id", "w")
    val got = hitsOf(docs, 3L).filter(col("hits") >= 1)
      .select("doc_id", "hits").as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 1L), (3L, 1L), (5L, 1L)), s"got $got")
  }

  test("multiplicity: a doc heavier than the stride takes multiple hits") {
    // W=100, n=10, stride 10: the weight-35 doc spans 3-4 selection points
    val docs = Seq(("s", 1L, 35L), ("s", 2L, 5L), ("s", 3L, 60L))
      .toDF("source", "doc_id", "w")
    val got = hitsOf(docs, 10L).select("doc_id", "hits")
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 4L && got(3L) == 6L, s"got $got") // t=0,10,20,30 / 40..90
    assert(got(2L) == 0L, "the light doc between strides must take none")
    assert(got.values.sum == 10L)
  }

  test("the draw is a pure function of the input SET (k64 invariance)") {
    val docs = graft.engine.Tables.documents(spark, sf001)
      .select(col("source"), col("doc_id"),
              size(split(col("text"), " ")).cast("long").as("w"))
    val a = hitsOf(docs, 10L)
    val b = hitsOf(docs.repartition(7, col("doc_id")), 10L)
    assert(a.select("source", "doc_id", "hits")
      .unionAll(b.select("source", "doc_id", "hits"))
      .groupBy("source", "doc_id", "hits").count()
      .filter(col("count") =!= 2).isEmpty)
    // and the declared face returns rows on the fixture
    assert(graft.engine.Round23Ops.k76.fn(spark, sf001).limit(1).count() == 1L)
  }
}
