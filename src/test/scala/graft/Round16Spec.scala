package graft

/** Adversarial edge pins for the round-16 declared query — cases the
  * fixture cannot force, exercised on synthesized frames through the REAL
  * declared plan ([[graft.engine.Round16Ops.k44Plan]] — the h46Plan
  * discipline: the spec drives the shipped plan body, not a hand copy
  * that regressions could silently diverge from). */
class Round16Spec extends SparkSpec {

  private def tok(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")

  test("k44 spans: cross-doc dup vs within-doc repetition vs keep-min vs short doc") {
    val sp = spark
    import sp.implicits._
    val shared = tok("s", 20)
    // doc 1: 5 unique tokens then the shared span at positions 6-25 —
    //   DELIBERATELY straddling the 20-token chunk boundary, the exact
    //   placement k39's stride-aligned chunks cannot flag (its chunk 1 is
    //   tokens 1-20, chunk 2 is 21-25; neither equals the span) but
    //   stride-1 spans catch. 6 windows; only the one starting at 6 is
    //   the shared text, so exactly 1 dup span. Min holder → 0 removed.
    val docA = (tok("a", 5) ++ shared).mkString(" ")
    // doc 2: the shared span opens the doc, 5 unique suffix tokens —
    //   1 dup span out of 6, NOT the min holder → 1 removed.
    val docB = (shared ++ tok("b", 5)).mkString(" ")
    // doc 3: a 20-token run repeated back-to-back WITHIN the doc — its
    //   two identical windows share a digest but dmin = dmax = 3, so
    //   within-doc repetition must NOT count as duplication (the
    //   ExactSubstr predicate is cross-document).
    val docC = (tok("c", 20) ++ tok("c", 20)).mkString(" ")
    // doc 4: 19 tokens — below the span width, absent from the output.
    val docD = tok("d", 19).mkString(" ")
    val docs = Seq((1L, docA), (2L, docB), (3L, docC), (4L, docD))
      .toDF("doc_id", "text")
    val got = graft.engine.Round16Ops.k44Plan(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L), s"short doc must be absent: $got")
    assert(got(1L) == ((6L, 1L, 0L, 0.1667)),
      s"min holder must keep its dup span: ${got(1L)}")
    assert(got(2L) == ((6L, 1L, 1L, 0.1667)),
      s"non-min holder must remove its dup span: ${got(2L)}")
    assert(got(3L) == ((21L, 0L, 0L, 0.0)),
      s"within-doc repetition is not cross-doc duplication: ${got(3L)}")
  }

  test("k45 decontam: train witness only; eval-eval sharing is NOT contamination") {
    val sp = spark
    import sp.implicits._
    // split classes come from md5(doc_id) — ids chosen so the class is
    // forced: 0/2 train, 3/5 test, 10 val (verified md5 first hex chars
    // c/c/e/e/d). S is shared train→test (doc 3 must report witness
    // MIN(0,2) = 0); T is shared test↔val ONLY — duplicated, but with no
    // train holder it must NOT count as contamination on either side.
    val s20 = tok("s", 20)
    val t20 = tok("t", 20)
    val docs = Seq(
      (0L, (s20 ++ tok("a", 5)).mkString(" ")),
      (2L, (s20 ++ tok("b", 5)).mkString(" ")),
      (3L, (tok("c", 5) ++ s20).mkString(" ")),
      (5L, (t20 ++ tok("e", 5)).mkString(" ")),
      (10L, (t20 ++ tok("f", 5)).mkString(" "))
    ).toDF("doc_id", "text")
    val got = graft.engine.Round16Ops.k45Plan(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    assert(got.keySet == Set(3L, 5L, 10L), s"train docs must be absent: $got")
    assert(got(3L) == (("test", 6L, 1L, Some(0L))),
      s"witness must be the MIN train holder: ${got(3L)}")
    assert(got(5L) == (("test", 6L, 0L, None)),
      s"eval-eval sharing counted as contamination: ${got(5L)}")
    assert(got(10L) == (("val", 6L, 0L, None)),
      s"eval-eval sharing counted as contamination: ${got(10L)}")
  }

  test("k46 runs: R consecutive dup windows certify R+19 tokens; regions split on gaps") {
    val sp = spark
    import sp.implicits._
    // two shared regions per doc: a 20-token span (1 window) and a
    // 21-token span (2 consecutive windows) separated by per-doc unique
    // gaps — so islands must NOT merge across the gap: max run 2 →
    // 21 tokens, 2 regions. doc 3 has no cross-doc dup → absent.
    val p = tok("p", 20)
    val q = tok("q", 21)
    val docs = Seq(
      (1L, (p ++ tok("a", 5) ++ q).mkString(" ")),
      (2L, (p ++ tok("b", 5) ++ q).mkString(" ")),
      (3L, tok("z", 40).mkString(" "))
    ).toDF("doc_id", "text")
    val got = graft.engine.Round16Ops.k46Plan(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == Set(1L, 2L), s"no-dup doc must be absent: $got")
    assert(got(1L) == ((21L, 2L)), s"run arithmetic broken: ${got(1L)}")
    assert(got(2L) == ((21L, 2L)), s"run arithmetic broken: ${got(2L)}")
  }

  test("k46 is a REGION statistic: a run may span different partners") {
    val sp = spark
    import sp.implicits._
    // doc 1 = t1..t21: window A (t1..t20) shared only with doc 2, window
    // B (t2..t21) shared only with doc 3. Both positions are duplicated
    // → one run of 2 → a 21-token duplicated REGION, even though no
    // single partner contains the 21 tokens — the declared semantics
    // (the region ExactSubstr removal would excise), pinned so the
    // region-vs-longest-common-substring distinction stays documented
    // and tested.
    val t21 = tok("t", 21)
    val docs = Seq(
      (1L, t21.mkString(" ")),
      (2L, (t21.take(20) ++ tok("x", 5)).mkString(" ")),
      (3L, (tok("y", 5) ++ t21.drop(1)).mkString(" "))
    ).toDF("doc_id", "text")
    val got = graft.engine.Round16Ops.k46Plan(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((21L, 1L)),
      s"two-partner run must still read as one 21-token region: ${got(1L)}")
    assert(got(2L) == ((20L, 1L)) && got(3L) == ((20L, 1L)), s"$got")
  }

  test("k47 top spans: within-doc repeats count occurrences not docs; digest tiebreak") {
    val sp = spark
    import sp.implicits._
    // doc 1 carries span S TWICE back-to-back (windows 1 and 21 — the
    // 19 rotations between them are unique to doc 1 and must be dropped
    // by the n_docs > 1 filter); doc 2 carries S once. So S must report
    // n_docs = 2 but n_occurrences = 3 with first_doc = 1. T is a second
    // 2-doc span — the output must order ties by digest ascending.
    val s20 = tok("s", 20)
    val t20 = tok("t", 20)
    val docs = Seq(
      (1L, (s20 ++ s20).mkString(" ")),
      (2L, (s20 ++ tok("b", 5)).mkString(" ")),
      (3L, (t20 ++ tok("c", 5)).mkString(" ")),
      (4L, (t20 ++ tok("e", 5)).mkString(" "))
    ).toDF("doc_id", "text")
    val rows = graft.engine.Round16Ops.k47Plan(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
                 r.getLong(4)))
    assert(rows.length == 2, s"only the two cross-doc spans survive: ${rows.toSeq}")
    val byText = rows.map(r => r._2 -> r).toMap
    assert(byText(s20.mkString(" "))._3 == 2L &&
           byText(s20.mkString(" "))._4 == 3L &&
           byText(s20.mkString(" "))._5 == 1L,
      s"S must count 2 docs / 3 occurrences / first_doc 1: ${byText(s20.mkString(" "))}")
    assert(byText(t20.mkString(" "))._3 == 2L && byText(t20.mkString(" "))._4 == 2L)
    // both have n_docs = 2 → the emitted order must be digest ascending
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted,
      s"tie order must be digest ASC: ${rows.map(_._1).toSeq}")
  }

  test("k44 plan: one shingle pass, duplication via window, no digest self-join") {
    // the oracle decides duplication with a GROUP-BY + digest-keyed JOIN;
    // the declared plan must NOT — a self-join shingles the corpus twice
    // (the k34 rejection record). Pinned: exactly one Generate, a window,
    // and no join anywhere in the final plan.
    val df = graft.engine.Round16Ops.k44.fn(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val explodes = "\\bGenerate\\b".r.findAllIn(p).length
    assert(explodes == 1,
      s"k44 must shingle the corpus exactly once, found $explodes:\n$p")
    assert(p.contains("Window"), s"k44 should decide dups via the digest window:\n$p")
    assert(!p.contains("Join"), s"k44 must not join:\n$p")
  }

  test("r18 narrowing: binary md5 orders, groups and min-picks exactly like hex md5") {
    // The r18 optimization round rekeyed the span family (and k15/k66) on
    // unhex(md5(...)) — 16-byte binary — in place of the 32-char hex
    // string. Everything downstream (grouping, min/max tie-breaks, sort
    // order) is unchanged ONLY IF BinaryType comparison is unsigned
    // lexicographic and therefore agrees with the hex string's order
    // (nibble → hex char is monotone). A signed-byte comparison would
    // diverge on any digest whose leading byte is ≥ 0x80 — about half of
    // all digests — so 256 values exercise the property thoroughly. This
    // pins the load-bearing equivalence claim of the narrowing commits.
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.{col, expr, hex, lower, md5, min, unhex}
    val df = (1 to 256).map(i => s"tok$i").toDF("s")
      .select(col("s"), md5(col("s")).as("hx"), unhex(md5(col("s"))).as("bin"))
      .localCheckpoint() // one evaluation feeds every assertion below
    // bijection witness: hex(bin) round-trips to the hex digest, row by row
    assert(df.filter(lower(hex(col("bin"))) =!= col("hx")).isEmpty,
      "unhex(md5) must round-trip to the hex digest on every row")
    // the binary really is narrower: 16 bytes vs 32 chars
    assert(df.filter(expr("length(bin) != 16 or length(hx) != 32")).isEmpty)
    // order witness: sorting by the binary key yields the hex-sorted order
    val byHex = df.orderBy("hx").select("s").as[String].collect().toSeq
    val byBin = df.orderBy("bin").select("s").as[String].collect().toSeq
    assert(byHex == byBin,
      "BinaryType ordering must equal the hex string ordering (unsigned lex)")
    // min/tie-break witness: the aggregate min picks the same digest
    val minHex = df.agg(min("hx")).head.getString(0)
    val minBin = df.agg(min("bin")).head.getAs[Array[Byte]](0)
      .map("%02x".format(_)).mkString
    assert(minHex == minBin, s"min over binary must pick min-hex: $minHex vs $minBin")
    // grouping witness: binary keys partition rows exactly like hex keys
    val nHex = df.groupBy("hx").count().count()
    val nBin = df.groupBy("bin").count().count()
    assert(nHex == nBin && nHex == 256L,
      s"binary grouping must match hex grouping: $nHex vs $nBin")
  }
}
