package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main: measures the heavy dedup stack ABOVE the largest
  * driver fixture — the r8 verdict's "scale evidence beyond sf0.1" item.
  *
  * Corpus: a seed-free, fully deterministic 10× scale-up of the sf0.1
  * documents table at CONSTANT duplicate density — each of 10 replicas
  * keeps the original 5k docs' text verbatim except every token (and the
  * `source` blocking key) carries a per-replica suffix, so each replica's
  * internal near-dup pair structure is EXACTLY the original's and
  * cross-replica pairs are impossible (disjoint vocabularies). That makes
  * expected outputs closed-form: pairs/clusters/rows must be EXACTLY 10×
  * the sf0.1 counts — the probe checks this, so it is a correctness gate
  * at 50k docs as well as a timing. Constant density is the honest model
  * for corpus growth (a 100 TB corpus is not 31 tokens); the
  * super-linear alternative (same vocab, 10× docs → ~100× pairs) measures
  * pair-emission volume, not operator scaling.
  *
  * Usage: sbt "runMain graft.ScaleProbe"  (writes /tmp/graft_scale10,
  * prints one |-separated line per (query, scale) with wall seconds and
  * output rows, plus the auto-selector decision at both scales).
  */
object ScaleProbe {

  final val Queries = Seq("k02_near_dedup_jaccard", "k23_dedup_clusters",
                          "k25_dedup_clusters_star", "k32_containment_neardup")

  def buildCorpus(spark: SparkSession, sfDir: String, outDir: String,
                  replicas: Int): Unit = {
    val base = graft.engine.Tables.documents(spark, sfDir)
    val reps = (0 until replicas).map { r =>
      // suffix once, derive n_chars from the SAME expression result so
      // the two can never drift
      base.select(
        (col("doc_id") + lit(5000L * r)).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(t, lit(s"_$r")))).as("text"),
        col("lang"),
        concat(col("source"), lit(s"-$r")).as("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    reps.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = "/tmp/graft_scale10"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder("graft-scale-probe", Some(s"local[$cpus]"), Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()

    buildCorpus(spark, sfDir, outDir, replicas = 10)

    // the auto-selector's measured decision at both scales
    for ((label, dir) <- Seq("sf0.1" -> sfDir, "scale10" -> outDir)) {
      val stats = graft.api.Dedup.corpusStats(
        graft.engine.Tables.documents(spark, dir), "doc_id", "text", "source")
      val prefix = graft.api.Dedup.prefersPrefixPath(stats)
      println(s"SELECTOR|$label|nDocs=${stats.nDocs}|meanDf=${f"${stats.meanDf}%.2f"}|" +
        s"candPerDoc=${f"${stats.candPerDoc}%.1f"}|" +
        s"blockDensity=${f"${stats.blockDensity}%.4f"}|prefersPrefix=$prefix")
    }

    def run(name: String, dir: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // warm BOTH inputs once (file listing, codegen, first-touch scan) so
    // neither side's measurement carries asymmetric cold-start cost
    Queries.foreach { q => run(q, sfDir); run(q, outDir) }
    val rows1x = Queries.map(q => q -> run(q, sfDir)).toMap
    val rows10x = Queries.map(q => q -> run(q, outDir)).toMap
    Queries.foreach { q =>
      val (t1, n1) = rows1x(q)
      val (t10, n10) = rows10x(q)
      val exact10x = n10 == 10 * n1
      println(f"SCALE|$q|sf0.1=$t1%.2fs/$n1%d rows|x10=$t10%.2fs/$n10%d rows|" +
        f"timeRatio=${t10 / t1}%.1f|rows10xExact=$exact10x")
    }
    spark.stop()
  }
}
