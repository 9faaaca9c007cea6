package graft.engine

import org.apache.spark.sql.functions._

/** Round-8 sixth extension block: geohash encoding (`geohashEncode`) and
  * human-readable duration rendering (`formatReadableTimeDelta`) — two
  * more widely-used ClickHouse scalar families, both with byte-exact
  * string output from pure int64 arithmetic.
  *
  * Scale notes (the 100 TB posture, SURVEY §4): both queries are
  * map-only codegen'd scalar work over a sampled scan — embarrassingly
  * parallel, no shuffle before the closing ORDER BY (and that sort is
  * the declared result contract, not part of the operator).
  *
  * Determinism (SURVEY §2): the geohash bit-interleave and base32 digit
  * extraction are generated as ONE arithmetic string using only
  * `div`/`%`/`*`/`+` (power-of-two multiplies stand in for left shifts,
  * integer division for right shifts), instantiated per dialect with the
  * only difference being the integer-division spelling (`div` vs `//`)
  * — so the two engines evaluate literally the same integer expression.
  * The duration strings are integer div/mod unit splits with
  * NULL-skipping `concat_ws` joins (both engines skip NULL segments;
  * verified in the oracle run). No float exists in either query.
  */
object Round8fOps {

  /** Standard geohash base32 alphabet [public: geohash spec / CH
    * geohashEncode docs]. */
  private val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** The 30-bit geohash of (lon_q, lat_q) — two 15-bit quantized
    * coordinates — interleaved MSB-first starting with longitude, then
    * rendered as 6 base32 chars. Generated once per dialect; `divOp` is
    * the ONLY dialect difference. */
  private def geohashSql(divOp: String): String = {
    val code = (0 to 14).flatMap { i =>
      Seq(s"((lon_q $divOp ${1L << (14 - i)}) % 2) * ${1L << (29 - 2 * i)}",
          s"((lat_q $divOp ${1L << (14 - i)}) % 2) * ${1L << (28 - 2 * i)}")
    }.mkString(" + ")
    val chars = (0 to 5).map { j =>
      s"substr('$alpha', CAST(((($code) $divOp ${1L << (25 - 5 * j)}) % 32) + 1 AS INT), 1)"
    }.mkString(" || ")
    chars
  }

  /** h30 — geohash encoding (ClickHouse `geohashEncode` analog [public:
    * CH geo-function docs; geohash spec]): each sampled order mapped to
    * a deterministic coordinate in hundredths of a degree, quantized to
    * the standard 15-bit-per-axis grid IN INTEGERS
    * (units · 2^15 DIV range — exactly the float (x+180)/360·2^15 the
    * spec describes, computed without the float), bit-interleaved
    * lon-first and rendered as the canonical 6-char base32 geohash.
    * The 4-char prefix column demonstrates the precision ladder
    * (geohash truncation = coarser cell). Map-only; zero float. */
  val h30: Q = Q(
    "h30_geohash",
    s"""SELECT o_orderkey, lon_m, lat_m,
       |  ${geohashSql("//")} AS geohash,
       |  substr(${geohashSql("//")}, 1, 4) AS geohash4
       |FROM (
       |  SELECT o_orderkey, lon_m, lat_m,
       |    (lon_m * 32768) // 36000 AS lon_q,
       |    (lat_m * 32768) // 18000 AS lat_q
       |  FROM (
       |    SELECT o_orderkey, o_orderkey % 36000 AS lon_m,
       |      (o_orderkey * 7) % 18000 AS lat_m
       |    FROM orders WHERE o_orderkey % 17 = 0))
       |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      Tables.orders(s, dir)
        .where(col("o_orderkey") % 17 === 0)
        .select(col("o_orderkey"),
                (col("o_orderkey") % 36000).as("lon_m"),
                ((col("o_orderkey") * 7) % 18000).as("lat_m"))
        .select(col("o_orderkey"), col("lon_m"), col("lat_m"),
                expr("(lon_m * 32768) div 36000").as("lon_q"),
                expr("(lat_m * 32768) div 18000").as("lat_q"))
        .select(col("o_orderkey"), col("lon_m"), col("lat_m"),
                expr(geohashSql("div")).as("geohash"))
        .withColumn("geohash4", substring(col("geohash"), 1, 4))
        .orderBy(asc_nulls_last("o_orderkey"))
    })

  /** h31 — duration rendering (ClickHouse `formatReadableTimeDelta`
    * analog [public: CH other-function docs]): seconds split into
    * day/hour/minute/second units by integer div/mod, rendered with
    * singular/plural forms, zero units omitted via NULL-skipping
    * concat_ws (both engines skip NULL segments), and the all-zero case
    * pinned to '0 seconds'. Completes the h23 formatReadable family.
    * Map-only; byte-exact strings, zero float. */
  val h31: Q = Q(
    "h31_format_time_delta",
    """SELECT o_orderkey, secs,
      |  CASE WHEN secs = 0 THEN '0 seconds' ELSE concat_ws(', ',
      |    CASE WHEN d > 0 THEN d || ' day' || (CASE WHEN d = 1 THEN '' ELSE 's' END) END,
      |    CASE WHEN h > 0 THEN h || ' hour' || (CASE WHEN h = 1 THEN '' ELSE 's' END) END,
      |    CASE WHEN m > 0 THEN m || ' minute' || (CASE WHEN m = 1 THEN '' ELSE 's' END) END,
      |    CASE WHEN s2 > 0 THEN s2 || ' second' || (CASE WHEN s2 = 1 THEN '' ELSE 's' END) END)
      |  END AS delta_str
      |FROM (
      |  SELECT o_orderkey, secs, secs // 86400 AS d,
      |    (secs % 86400) // 3600 AS h, (secs % 3600) // 60 AS m, secs % 60 AS s2
      |  FROM (
      |    SELECT o_orderkey, o_orderkey % 1000000 AS secs
      |    FROM orders WHERE o_orderkey % 19 = 0))
      |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      def seg(c: String, unit: String) =
        when(col(c) > 0,
             concat(col(c).cast("string"), lit(" " + unit),
                    when(col(c) === 1, lit("")).otherwise(lit("s"))))
      Tables.orders(s, dir)
        .where(col("o_orderkey") % 19 === 0)
        .select(col("o_orderkey"), (col("o_orderkey") % 1000000).as("secs"))
        .select(col("o_orderkey"), col("secs"),
                expr("secs div 86400").as("d"),
                expr("(secs % 86400) div 3600").as("h"),
                expr("(secs % 3600) div 60").as("m"),
                (col("secs") % 60).as("s2"))
        .select(col("o_orderkey"), col("secs"),
                when(col("secs") === 0, lit("0 seconds"))
                  .otherwise(concat_ws(", ",
                    seg("d", "day"), seg("h", "hour"),
                    seg("m", "minute"), seg("s2", "second"))).as("delta_str"))
        .orderBy(asc_nulls_last("o_orderkey"))
    })

  /** Bitcoin base58 alphabet [public: base58 spec / CH base58 docs];
    * digit 0 renders as '1'. */
  private val alpha58 =
    "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"

  /** Base58 rendering of a non-negative int64 as an 11-digit div/mod
    * ladder (58^10 ≈ 4.3·10^17, so digit 10 is ≤ 21 for any int64 —
    * never overflows), leading zero-digits ('1') trimmed, zero itself
    * pinned to "1". Generated per dialect like [[geohashSql]]. */
  private def base58Sql(divOp: String): String = {
    val digits = (10 to 0 by -1).map { i =>
      val p = BigInt(58).pow(i).toLong // exact; 58^10 < 2^63
      s"substr('$alpha58', CAST(((v $divOp $p) % 58) + 1 AS INT), 1)"
    }.mkString(" || ")
    // bare long literals parse as BIGINT in both dialects; TRIM(LEADING)
    // is the shared-syntax leading-strip (verified in DuckDB 1.0)
    s"CASE WHEN v = 0 THEN '1' ELSE trim(LEADING '1' FROM $digits) END"
  }

  /** h32 — base58 encoding (ClickHouse `base58Encode` family analog
    * [public: CH string-function docs]; the numeric form — CH encodes
    * byte strings, this encodes the int64 key domain): a well-spread
    * 62-bit value per sampled order (31-bit-masked Knuth multiply — the
    * a04 overflow lesson), rendered in the Bitcoin alphabet via an
    * 11-digit integer div/mod ladder with zero-digit trimming.
    * Complements h19's base64/hex. Map-only, byte-exact strings, zero
    * float. */
  val h32: Q = Q(
    "h32_base58",
    s"""SELECT o_orderkey, v, ${base58Sql("//")} AS b58
       |FROM (
       |  SELECT o_orderkey, (o_orderkey % 2147483648) * 2654435761 AS v
       |  FROM orders WHERE o_orderkey % 23 = 0)
       |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin,
    (s, dir) => {
      Tables.orders(s, dir)
        .where(col("o_orderkey") % 23 === 0)
        .select(col("o_orderkey"),
                expr("(o_orderkey % 2147483648L) * 2654435761L").as("v"))
        .select(col("o_orderkey"), col("v"),
                expr(base58Sql("div")).as("b58"))
        .orderBy(asc_nulls_last("o_orderkey"))
    })

  def ops: Vector[Q] = Vector(h30, h31, h32)
}
