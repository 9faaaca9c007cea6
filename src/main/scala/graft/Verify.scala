package graft

import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args: run only the named queries (local iteration;
    // the driver passes exactly two args so its gate always runs the full set)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession
      .builder("graft-verify", Some(s"local[$cpus]"), Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // Oracle SQL is authored with bare table names for readability; rewrite
    // them to absolute parquet paths for THIS run's sfDir so the SQL is
    // runnable in ANY DuckDB context — with or without pre-registered views
    // (TESTDATA.md documents only 8 of the 10 tables, so relying on the
    // driver to register `documents`/`embeddings` views would silently fail
    // 25+ queries). Word-boundary replace is safe: no oracle query qualifies
    // columns by raw table name, and column names never contain a bare table
    // name (underscores are word chars).
    // name, and column names never contain a bare table name. Quote-aware:
    // odd segments of a split on ' are string literals and left untouched
    // (a01 labels rows with the table names themselves).
    def resolve(sql: String): String =
      sql.split("'", -1).zipWithIndex.map { case (seg, i) =>
        if (i % 2 != 0) seg
        else graft.engine.Tables.names.foldLeft(seg) { (acc, n) =>
          acc.replaceAll("\\b" + n + "\\b", s"'$sfDir/$n.parquet'")
        }
      }.mkString("'")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(resolve(v))}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
