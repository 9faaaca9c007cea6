package graft

import graft.operators.{Kmv, KmvBuf, KmvSketch}

/** Round-11 operator pins: the KMV set-operation lemmas d45 rides on.
  *
  * d45's oracle computes union/intersection statistics over the FULL
  * distinct hash sets while the Spark side combines two bounded bottom-64
  * sketches — the hash match is only guaranteed because of two exact
  * properties, pinned here against brute force on adversarial inputs:
  *
  *  1. k-smallest-of-union: bottomK(bottomK(A) ∪ bottomK(B)) =
  *     bottomK(A ∪ B).
  *  2. common-below-θ: for θ = the union's k-th smallest, every common
  *     hash h < θ is tracked by BOTH side sketches, so the sketch
  *     intersection count equals the full-set count.
  */
class Round11Spec extends SparkSpec {

  private def sketch(keys: Seq[Long], k: Int): Seq[Long] = {
    val agg = KmvSketch(k)
    var b = agg.zero
    keys.foreach(x => b = agg.reduce(b, x))
    agg.finish(b)
  }

  private def bottomK(keys: Seq[Long], k: Int): Seq[Long] =
    keys.map(Kmv.hash).distinct.sorted.take(k)

  // deterministic pseudo-random key sets (no Math.random — replay rule)
  private def keys(seed: Long, n: Int): Seq[Long] =
    (1 to n).scanLeft(seed)((s, _) => (s * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue)
      .tail.map(_ % 1000000L)

  test("bottom-k of two sketches' union equals bottom-k of the full union") {
    for ((na, nb, seed) <- Seq((10, 10, 1L), (500, 7, 2L), (500, 500, 3L),
                               (64, 64, 4L), (63, 1, 5L))) {
      val (a, b) = (keys(seed, na), keys(seed + 100, nb))
      val fromSketches = (sketch(a, 64) ++ sketch(b, 64)).distinct.sorted.take(64)
      assert(fromSketches == bottomK(a ++ b, 64),
        s"union lemma failed for na=$na nb=$nb seed=$seed")
    }
  }

  test("common hashes below the union theta are tracked by both side sketches") {
    for ((na, nb, seed) <- Seq((500, 500, 11L), (2000, 300, 12L), (80, 90, 13L))) {
      // force real overlap: b shares a suffix of a's key domain
      val a = keys(seed, na)
      val b = keys(seed + 7, nb) ++ a.takeRight(na / 3)
      val union = bottomK(a ++ b, 64)
      val theta = if (union.length >= 64) union(63) else 4294967296L
      val fullCommon = a.map(Kmv.hash).toSet
        .intersect(b.map(Kmv.hash).toSet).count(_ < theta)
      val sketchCommon = sketch(a, 64).toSet
        .intersect(sketch(b, 64).toSet).count(_ < theta)
      assert(sketchCommon == fullCommon,
        s"common-below-theta lemma failed for na=$na nb=$nb seed=$seed")
    }
  }

  test("128-bit accumulator: carry correctness and BigDecimal-identical render") {
    import graft.streaming.StreamingCorrMatrix.{add128, toDouble128}
    // adversarial: repeated adds of the max per-row square force carries
    val big = (1e7.toLong) * (1e7.toLong) // 1e14, d46's per-row cap
    var (hi, lo) = (0L, 0L)
    var ref = BigInt(0)
    for (i <- 1 to 300000) {
      val x = if (i % 3 == 0) big else Long.MaxValue / 2 // force carries fast
      val r = add128(hi, lo, x); hi = r._1; lo = r._2
      ref += BigInt(x)
    }
    assert((BigInt(hi) << 64) + (BigInt(lo) & ((BigInt(1) << 64) - 1)) == ref,
      "128-bit sum diverged from BigInt reference")
    assert(toDouble128(hi, lo) == BigDecimal(ref).doubleValue,
      "render must match the BigDecimal (= Spark decimal cast) rounding")
    assert(hi > 0L, "test must actually exercise the carry path")
  }

  test("KmvSketch merge is order- and partitioning-free") {
    val agg = KmvSketch(64)
    val ks = keys(42L, 700)
    def fold(xs: Seq[Long]): KmvBuf =
      xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
    val whole = agg.finish(fold(ks))
    for (cut <- Seq(1, 350, 699); rev <- Seq(false, true)) {
      val (l, r) = ks.splitAt(cut)
      val merged =
        if (rev) agg.merge(fold(r.reverse), fold(l.reverse))
        else agg.merge(fold(l), fold(r))
      assert(agg.finish(merged) == whole, s"cut=$cut rev=$rev diverged")
    }
  }

  test("nonneg-cumsum closed form equals the direct clamped fold") {
    // h36 rides s_i = c_i − min(0, min_{j≤i} c_j); pin it against the
    // defining recursion s_i = max(0, s_{i−1} + x_i) on adversarial inputs
    val cases = Seq(
      Seq(5L, -10L, 3L), Seq(-3L, 2L), Seq(5L, -2L, -9L, 4L),
      Seq(-1L, -1L, -1L), Seq(0L, 0L), Seq(7L),
      keys(99L, 200).map(_ % 21 - 10)) // mixed-sign pseudo-random
    for (xs <- cases) {
      val direct = xs.scanLeft(0L)((s, x) => math.max(0L, s + x)).tail
      val c = xs.scanLeft(0L)(_ + _).tail
      val rm = c.scanLeft(Long.MaxValue)(math.min).tail
      val closed = c.zip(rm).map { case (ci, mi) => ci - math.min(0L, mi) }
      assert(closed == direct, s"closed form diverged on $xs")
    }
  }

  test("r11 exact-sum queries are invariant under shuffle-partition count") {
    // the merge-order-immunity claims (d46/d48's decimal-routed power
    // sums, e21's additive integer units) made physical: different
    // partition counts force different partial-aggregate merge orders;
    // the collected results must be IDENTICAL, not approximately equal
    import graft.engine.Round11Ops
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def run(q: graft.engine.Q, parts: String): Seq[org.apache.spark.sql.Row] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      q.fn(spark, sf0001).collect().toSeq
    }
    try {
      for (q <- Seq(Round11Ops.d46, Round11Ops.d48, Round11Ops.e21,
                    Round11Ops.d45, Round11Ops.d47, Round11Ops.d49,
                    Round11Ops.d50, Round11Ops.e22, Round11Ops.j12)) {
        val a = run(q, "3")
        val b = run(q, "17")
        assert(a == b, s"${q.name} diverged across partition counts")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("graft_gcd: codegen compiles; values match BigInt.gcd; edge semantics") {
    // compile-proof with fallback disabled (the PackBytes discipline)
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback")
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val rows = spark.range(1, 2000)
        .selectExpr("id", "(id * 2654435761L) % 9999991 AS b",
                    "graft_gcd(id, (id * 2654435761L) % 9999991) AS g")
        .collect()
      rows.foreach { r =>
        val want = BigInt(r.getLong(0)).gcd(BigInt(r.getLong(1))).toLong
        assert(r.getLong(2) == want,
          s"gcd(${r.getLong(0)}, ${r.getLong(1)}) = ${r.getLong(2)}, want $want")
      }
      // edges: gcd(0, x) = |x|; gcd(x, 0) = |x|; negatives fold to abs;
      // NULL propagates
      val e = spark.sql(
        """SELECT graft_gcd(0L, 42L) AS a, graft_gcd(42L, 0L) AS b,
          |  graft_gcd(-12L, 18L) AS c, graft_gcd(0L, 0L) AS d,
          |  graft_gcd(CAST(NULL AS BIGINT), 5L) AS e""".stripMargin)
        .collect().head
      assert(e.getLong(0) == 42L && e.getLong(1) == 42L)
      assert(e.getLong(2) == 6L, "negatives fold to |x|")
      assert(e.getLong(3) == 0L)
      assert(e.isNullAt(4), "NULL input propagates")
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      prevFactory match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  /** Synthesize an events fixture dir from (user, µs, type, value) tuples
    * (the DeterminismSpec legacy-dispatch trick) so adversarial boundary
    * cases can run through the DECLARED query functions verbatim. */
  private def eventsDir(rows: Seq[(Long, Long, String, Double)]): String = {
    import org.apache.spark.sql.functions._
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r11-events").toString
    rows.zipWithIndex
      .map { case ((u, us, t, v), i) => (i.toLong, us, u, t, v, """{"k":1}""") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), expr("timestamp_micros(us)").as("ts"),
              col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("j12 boundary semantics: inclusive 1h bound, preceding-only, nearest signup") {
    val H = 3600L * 1000000L
    val base = 1704067200000000L // 2024-01-01 00:00 UTC in µs
    val dir = eventsDir(Seq(
      // user 1: purchase EXACTLY at signup + 1h → inclusive match
      (1L, base, "signup", 1.0), (1L, base + H, "purchase", 1.0),
      // user 2: purchase at +1h +1µs → no match
      (2L, base, "signup", 1.0), (2L, base + H + 1, "purchase", 1.0),
      // user 3: purchase BEFORE any signup → no match (preceding-only)
      (3L, base, "purchase", 1.0), (3L, base + 1, "signup", 1.0),
      // user 4: first signup far out, a NEARER later signup rescues the
      // purchase (nearest-preceding decides, not the first)
      (4L, base, "signup", 1.0), (4L, base + 10 * H, "signup", 1.0),
      (4L, base + 10 * H + 60, "purchase", 1.0),
      // user 5: two qualifying purchases → n_within counts both
      (5L, base, "signup", 1.0), (5L, base + 60, "purchase", 1.0),
      (5L, base + 120, "purchase", 1.0)))
    val got = graft.engine.Round11Ops.j12.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((1, 1L)), 2L -> ((0, 0L)), 3L -> ((0, 0L)),
                      4L -> ((1, 1L)), 5L -> ((1, 2L))),
      s"j12 boundary semantics diverged: $got")
  }

  test("e21 age-grid boundaries: day quantization and the reference-instant cut") {
    val D = 86400L * 1000000L
    val tRef = 1706659200000000L // 2024-01-31 00:00 UTC in µs
    val dir = eventsDir(Seq(
      // age 0: exactly at T, and T − 1µs; age 1: exactly 1 day before;
      // age 0 again: 1 day before + 1µs; excluded: 1µs after T
      (1L, tRef, "click", 1.00), (1L, tRef - 1, "click", 1.00),
      (1L, tRef - D, "click", 1.00), (1L, tRef - D + 1, "click", 1.00),
      (1L, tRef + 1, "click", 99.0)))
    val r = graft.engine.Round11Ops.e21.fn(spark, dir).collect()
    assert(r.length == 1)
    val (units, n) = (r(0).getLong(1), r(0).getLong(3))
    // 100 cents: ages 0, 0, 1, 0 → 3·(100·2^30) + 100·2^29; the after-T
    // event contributes nothing and is not counted
    assert(n == 4L, s"post-reference event must be excluded, n=$n")
    assert(units == 3L * 100L * (1L << 30) + 100L * (1L << 29),
      s"day-grid quantization diverged: $units")
  }
}
