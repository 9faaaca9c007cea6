package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic text-analysis operators for training-data pipelines: quality
  * scoring, token counting, fingerprinting, language-ID scoring — all
  * per-row codegen'd expressions (zero shuffle).
  */
object TextAnalysis {

  /** Whitespace token array. */
  def tokens(textCol: Column, sep: String = " "): Column = split(textCol, sep)

  /** Unicode canonical form — the normalize-before-hash step (CCNet §4.1 /
    * Dolma): NFC → lowercase(ROOT) → NFD → strip marks → NFC, via the
    * codegen'd [[graft.functions.CanonicalizeTextExpression]] (`graft_canon`
    * in SQL; this is its Scala-API face). Map-only, full-ASCII fast path. */
  def canonicalText(textCol: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.CanonicalizeTextExpression(
        org.apache.spark.sql.graftbridge.Bridge.expression(textCol)))

  /** Stopword ratio over a literal stopword set. */
  def stopwordRatio(textCol: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(textCol)
    val stopArr = array(stopwords.map(lit): _*)
    size(filter(toks, t => array_contains(stopArr, t))).cast("double") / size(toks)
  }

  /** Token counts three ways: whitespace, alpha-word regex, BPE-ish
    * vowel-piece regex. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(split(col(textCol), " ")).as("n_ws"),
      regexp_count(col(textCol), lit("[a-z]+")).cast("int").as("n_alpha"),
      regexp_count(col(textCol),
        lit("[bcdfghjklmnpqrstvwxyz]*[aeiou]+[bcdfghjklmnpqrstvwxyz]*"))
        .cast("int").as("n_pieces"))

  /** Order-canonical set fingerprint: md5 over sorted distinct tokens. */
  def setFingerprint(textCol: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(textCol)))))

  /** Order-sensitive polynomial rolling hash mod 1e9+7 (pure integer —
    * bit-identical on any engine). */
  def rollingHash(textCol: Column): Column =
    aggregate(
      transform(tokens(textCol), t => (ascii(t) * 131 + length(t)).cast("bigint")),
      lit(0L),
      (h, v) => (h * 31 + v) % 1000000007L)

  /** Corpus-relative length-band filter at SKETCH cost — the 100 TB form of
    * k31's exact per-group percent_rank window (PipelineOps.k31 documents
    * the swap; this implements it). The exact window sorts every group in
    * one task — fine until a single language holds billions of rows; this
    * path computes per-group [lo, hi] length bounds from ONE
    * approx-percentile aggregate (t-digest-style sketch state, map-side
    * combined [public: Spark ApproximatePercentile]), broadcasts the
    * |groups|-row bounds table back, and filters with a per-row comparison —
    * no global sort, no single-task group, same predicate shape.
    *
    * Divergence from the exact path is confined to the band EDGES: rank
    * inclusion (pr ∈ [lo, hi]) vs value inclusion (len ∈ [p_lo, p_hi])
    * treat boundary ties differently, and the sketch bounds carry
    * approx-percentile error. Band-membership agreement vs the exact
    * window is tolerance-pinned in ScaleOpsSpec. NULL group keys form
    * their own band (null-safe join), matching the window's NULL
    * partition. */
  def lengthBandApprox(df: DataFrame, groupCol: String, idCol: String,
                       lenCol: Column, lo: Double = 0.1, hi: Double = 0.9,
                       accuracy: Int = 10000): DataFrame = {
    val base = df.select(col(groupCol).as("__g"), col(idCol).as("__id"),
                         lenCol.cast("int").as("__len"))
    val bounds = base.groupBy("__g")
      .agg(percentile_approx(col("__len"), array(lit(lo), lit(hi)),
                             lit(accuracy)).as("__b"))
      .select(col("__g").as("__g2"), element_at(col("__b"), 1).as("__lo"),
              element_at(col("__b"), 2).as("__hi"))
    base.join(broadcast(bounds), col("__g") <=> col("__g2"))
      .filter(col("__len") >= col("__lo") && col("__len") <= col("__hi"))
      .select(col("__g").as(groupCol), col("__id").as(idCol),
              col("__len").as("len"))
  }

  /** Membership scores of distinct tokens against named marker sets
    * (language/domain-ID heuristic). */
  def markerScores(df: DataFrame, idCol: String, textCol: String,
                   markers: Map[String, Seq[String]]): DataFrame = {
    val toks = array_distinct(tokens(col(textCol)))
    val scoreCols = markers.toSeq.sortBy(_._1).map { case (k, ws) =>
      size(array_intersect(toks, array(ws.map(lit): _*))).as(s"score_$k")
    }
    df.select(col(idCol) +: scoreCols: _*)
  }

  /** Compression-ratio quality signal [public: RefinedWeb (Penedo et al.
    * 2023) and Dolma (Soldaini et al. 2024) filter on zlib-style
    * compressibility — highly repetitive/templated text compresses far
    * below natural text]: per doc, UTF-8 byte count, deflated byte count
    * at a FIXED Deflater level, and the ROUND-4 ratio (low ratio =
    * repetitive). k30/k37/k39 measure n-gram repetition; this is the
    * generic compressibility axis that also catches repetition no fixed
    * n-gram width sees (long-period templates).
    *
    * Tier-2 by necessity: DuckDB has no zlib, so there is no SQL oracle —
    * the contract is ScaleOpsSpec's planted-case monotonicity, separation
    * and determinism pins. The deflate call is a genuine per-row
    * imperative computation, so this is the repo's documented
    * `mapPartitions` boundary class (the Multimodal decode posture): one
    * Deflater per PARTITION, `reset()` per row (allocation amortized),
    * map-only — no shuffle, linear at any scale. Output length for a
    * fixed (level, strategy, input) is deterministic for a given zlib,
    * which is all the within-run pins need; the RATIO is the signal a
    * threshold consumes, never a cross-engine hash. */
  def compressionRatio(df: DataFrame, idCol: String, textCol: String,
                       level: Int = 6): DataFrame = {
    require(level >= 0 && level <= 9, s"Deflater level 0..9: $level")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val defl = new java.util.zip.Deflater(level, false)
        val buf = new Array[Byte](8192)
        // end() releases the native zlib buffers on EVERY task exit path:
        // the completion listener fires on success, failure, cancellation
        // AND partial consumption (limit/take stops draining the iterator
        // mid-partition), where a hasNext-triggered end() never runs —
        // r19 review found the leak, r20 advice found the partial-drain
        // gap in the first fix. The hasNext path stays as a fast release
        // for the common full-drain case; `ended` makes the two
        // idempotent (Deflater.end() is safe to double-call, but skip
        // the JNI hop anyway).
        val state = new java.util.concurrent.atomic.AtomicBoolean(false)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            if (state.compareAndSet(false, true)) defl.end()
          })
        new Iterator[(Long, Long, Long)] {
          def hasNext: Boolean = {
            val h = it.hasNext
            if (!h && state.compareAndSet(false, true)) defl.end()
            h
          }
          def next(): (Long, Long, Long) = {
            val (id, text) = it.next()
            val in = Option(text).getOrElse("")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            defl.reset()
            defl.setInput(in)
            defl.finish()
            var n = 0L
            while (!defl.finished()) n += defl.deflate(buf)
            (id, in.length.toLong, n)
          }
        }
      }
      .toDF(idCol, "n_bytes", "n_deflated")
      .withColumn("compression_ratio",
        round(col("n_deflated") * lit(1.0) / greatest(col("n_bytes"), lit(1L)), 4))
  }
}
