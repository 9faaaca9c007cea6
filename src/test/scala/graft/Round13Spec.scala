package graft

import org.apache.spark.sql.functions._

/** Adversarial edge pins for the round-13 declared queries — cases the
  * fixture data cannot force (probed: sf0.01 has ZERO equal-weight
  * (lang, source) ties for d55 and no doc sitting exactly on a k41 rule
  * boundary), exercised on synthesized frames through the same expressions
  * the declared queries compile to. */
class Round13Spec extends SparkSpec {

  test("d55 tie-break: equal weights render source-ASC; slice caps at 3") {
    val sp = spark
    import sp.implicits._
    // lang "x": b and a TIE at weight 7 (a must render first), then c 5,
    // d 3 — four sources, so the slice must drop d. lang "y": one source.
    val df = Seq(("x", "b", 7L), ("x", "a", 7L), ("x", "c", 5L),
                 ("x", "d", 3L), ("y", "solo", 9L))
      .toDF("lang", "source", "wt")
    val got = df.groupBy("lang")
      .agg(slice(array_sort(collect_list(struct(
             (-col("wt")).as("nw"), col("source").as("source"),
             col("wt").as("wt")))), 1, 3).as("top"))
      .select(col("lang"),
              array_join(transform(col("top"),
                e => concat(e("source"), lit(":"),
                            e("wt").cast("string"))), ",").as("r"),
              element_at(col("top"), 1)("wt").as("mx"),
              size(col("top")).as("k"))
      .as[(String, String, Long, Int)].collect()
      .map { case (l, r, mx, k) => l -> ((r, mx, k)) }.toMap
    assert(got("x") == (("a:7,b:7,c:5", 7L, 3)),
      s"tie/slice order broken: ${got("x")}")
    assert(got("y") == (("solo:9", 9L, 1)), s"singleton broken: ${got("y")}")
  }

  test("k41 rule boundaries: thresholds are inclusive exactly as declared") {
    val sp = spark
    import sp.implicits._
    // doc 1: EXACTLY 50 tokens (wc_ok = 1), all-distinct except the two
    //   stopwords 'a'/'the' once each (stop kinds = 2 → stop_ok = 1),
    //   mc = 1, n = 50 → frac 0.02 ≤ 0.1 → keep = 1 on every boundary.
    // doc 2: 49 tokens → wc_ok = 0; ONE stopword kind ('a' twice — kind
    //   count is DISTINCT kinds, not occurrences) → stop_ok = 0.
    // doc 3: 10 all-distinct tokens → mc/n = 1/10; the correctly-rounded
    //   double quotient EQUALS the 0.1 literal, so the ≤ boundary is
    //   INCLUSIVE → conc_ok = 1. doc 4: one dup in 10 → 0.2 → conc_ok = 0.
    val d1 = ("a the " + (1 to 48).map(i => s"w$i").mkString(" "), 1L)
    val d2 = ("a a " + (1 to 47).map(i => s"w$i").mkString(" "), 2L)
    val d3 = ((1 to 10).map(i => s"w$i").mkString(" "), 3L)
    val d4 = ("w1 w1 " + (2 to 9).map(i => s"w$i").mkString(" "), 4L)
    val stops = Seq("a", "the", "of", "and", "to", "value", "data")
    val frac = col("mc").cast("double") / col("n")
    // the declared query's single-leg derivation: after the (doc, type)
    // count agg each type appears once per doc, so counting stopword ROWS
    // there is the distinct-KIND count (doc 2's 'a a' must count 1, not 2)
    val got = Seq(d1, d2, d3, d4).toDF("text", "doc_id")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max(col("c")).as("mc"), sum(col("c")).as("n"),
           sum(when(col("w").isin(stops: _*), 1).otherwise(0))
             .as("n_stop_kinds"))
      .select(col("doc_id"),
              when(col("n") >= 50, 1).otherwise(0).as("wc"),
              when(col("n_stop_kinds") >= 2, 1).otherwise(0).as("st"),
              when(frac <= 0.1, 1).otherwise(0).as("co"))
      .as[(Long, Int, Int, Int)].collect()
      .map { case (id, wc, st, co) => id -> ((wc, st, co)) }.toMap
    assert(got(1L) == ((1, 1, 1)), s"doc1 all-pass boundary: ${got(1L)}")
    assert(got(2L) == ((0, 0, 1)), s"doc2 49-tok/1-kind: ${got(2L)}")
    assert(got(3L) == ((0, 0, 1)), s"doc3 frac==0.1 inclusive: ${got(3L)}")
    assert(got(4L) == ((0, 0, 0)), s"doc4 frac 0.2: ${got(4L)}")
  }

  test("k42 Gram identity: singleton label is exactly 0; hand case agrees") {
    val sp = spark
    import sp.implicits._
    // label 1: v1=(1,2), v2=(3,-1), v3=(0,5) → pairwise dots 3-2=1,
    //   0+10=10, 0-5=-5 → sum 6 → x2 = 12; norms 5+10+25 = 40;
    //   gram2 = (1+3+0)² + (2-1+5)² = 16+36 = 52; 52-40 = 12 ✓
    // label 2: singleton → identity must give exactly 0
    val q = Seq((1L, 1, Seq(1L, 2L)), (2L, 1, Seq(3L, -1L)),
                (3L, 1, Seq(0L, 5L)), (4L, 2, Seq(7L, 9L)))
      .toDF("vec_id", "label", "v")
    val norms = q
      .withColumn("nq", expr("aggregate(v, 0L, (acc, x) -> acc + x * x)"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"), sum(col("nq")).as("sn"))
    val gram = q.select(col("label"), posexplode(col("v")).as(Seq("p", "x")))
      .groupBy("label", "p").agg(sum(col("x")).as("sd"))
      .groupBy("label").agg(sum(col("sd") * col("sd")).as("g2"))
    val got = norms.join(gram, "label")
      .select(col("label"), (col("g2") - col("sn")).as("x2"))
      .as[(Int, Long)].collect().toMap
    assert(got == Map(1 -> 12L, 2 -> 0L), s"Gram identity broken: $got")
  }

  test("h49 zero-match doc: matches NULL (both-engine norm), first_sp empty") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, "spark part"), (2L, "zz qq")).toDF("doc_id", "text")
    val all = regexp_extract_all(col("text"), lit("[a-z]*ar[a-z]*"), lit(0))
    val got = df.select(col("doc_id"),
        size(all).as("n"),
        when(size(all) === 0, lit(null).cast("string"))
          .otherwise(array_join(all, ",")).as("m"),
        regexp_extract(col("text"), "sp([a-z]+)", 1).as("g"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), Option(r.getString(2)), r.getString(3)))).toMap
    assert(got(1L) == ((2, Some("spark,part"), "ark")),
      s"match doc broken: ${got(1L)}")
    // zero-match: matches must be NULL (DuckDB array_to_string([]) is NULL —
    // the Spark '' is normalized TO null, not the reverse); the no-match
    // regexp_extract is '' on BOTH engines (probed), so it stays ''.
    assert(got(2L) == ((0, None, "")), s"zero-match doc broken: ${got(2L)}")
  }

  test("h46 dirty props: admission mirrors json_valid; non-objects count but never sum") {
    val sp = spark
    import sp.implicits._
    // user 1 — every admission class at once (the r12-ADVICE hazard set):
    //   valid object with k        → counted, sums
    //   valid object without k     → counted, no sum
    //   valid object, k wrong type → counted, no sum (PERMISSIVE null field)
    //   valid ARRAY  '[1,2]'       → json_valid TRUE  → counted, no sum
    //   valid scalar '5'           → json_valid TRUE  → counted, no sum
    //   JSON null literal 'null'   → json_valid TRUE  → counted, no sum
    //   malformed '{bad'           → json_valid FALSE → invisible everywhere
    //   SQL NULL                   → invisible everywhere
    // user 2 — ONLY inadmissible rows: must still appear (left join) with
    //   n_items = 0, sum_k/max_k NULL instead of vanishing.
    val ev = Seq(
      (1L, 10L, """{"k":3}"""), (1L, 11L, """{"j":9}"""),
      (1L, 12L, """{"k":"x"}"""), (1L, 13L, """[1,2]"""),
      (1L, 14L, """5"""), (1L, 15L, """null"""),
      (1L, 16L, """{bad"""), (1L, 17L, null.asInstanceOf[String]),
      (1L, 18L, """{"k":4}"""), (1L, 19L, "\t {\"k\":5}"),
      (2L, 20L, """{bad"""), (2L, 21L, null.asInstanceOf[String])
    ).toDF("user_id", "event_id", "props")
    val got = graft.engine.Round13Ops.h46Plan(ev).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Int]), r.getLong(3)))).toMap
    // user 1: 8 json_valid rows admitted (all but '{bad' and SQL NULL),
    // sum over the three integer ks only (including the TAB-prefixed
    // object — the JSON spec allows whitespace before the root token, so
    // it must route to the raw-element leg, not the placeholder), max
    // over the row path likewise
    assert(got(1L) == ((Some(12L), Some(5), 8L)), s"user 1 broken: ${got(1L)}")
    assert(got(2L) == ((None, None, 0L)), s"user 2 vanished/filled: ${got(2L)}")
  }
}
