package graft.api

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Write–audit–publish: the commit protocol for dataset exports (k22's
  * shard prep, replica snapshots) — consumers must NEVER see a partial or
  * audit-failing dataset. [public: the WAP pattern popularized by
  * Netflix/Iceberg data engineering practice.]
  *
  * 1. WRITE the full output to a hidden staging dir under the target;
  * 2. AUDIT the staged files with caller-supplied checks (row counts,
  *    null rates, split balance — anything expressible over a DataFrame);
  * 3. PUBLISH by atomic directory rename on success, or leave the staged
  *    dir in place (with the failure reason) for inspection on failure —
  *    the previous published version, if any, is replaced only AFTER a
  *    clean audit, and a crash anywhere leaves either the old or the new
  *    version fully intact, never a mix.
  */
object Publish {

  /** Run the protocol. Returns Right(path) on publish, Left(reason) with
    * the staging dir retained on audit failure. `audits` return
    * Some(reason) to veto. */
  def writeAuditPublish(df: DataFrame, dir: String,
                        audits: Seq[DataFrame => Option[String]])
                       (implicit s: SparkSession): Either[String, String] = {
    val root = new java.io.File(dir)
    root.mkdirs()
    val staging = new java.io.File(root, "_staging")
    val live = new java.io.File(root, "current")
    val retired = new java.io.File(root, "_retired")
    df.write.mode(SaveMode.Overwrite).parquet(staging.getPath)
    val staged = s.read.parquet(staging.getPath)
    audits.view.flatMap(a => a(staged)).headOption match {
      case Some(reason) =>
        Left(s"audit failed, staging retained at ${staging.getPath}: $reason")
      case None =>
        // retire-then-rename: two renames, each atomic; a crash between
        // them leaves no `current` (clearly unpublished), never a mix
        def rmRec(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rmRec)
          f.delete(); ()
        }
        if (retired.exists()) rmRec(retired)
        if (live.exists()) require(live.renameTo(retired),
          s"could not retire previous version at $live")
        require(staging.renameTo(live), s"publish rename failed: $staging -> $live")
        rmRec(retired)
        Right(live.getPath)
    }
  }

  /** Common audits. */
  def minRows(n: Long): DataFrame => Option[String] =
    df => { val c = df.count()
            if (c >= n) None else Some(s"row count $c below floor $n") }
  def noNulls(cols: String*): DataFrame => Option[String] =
    df => {
      import org.apache.spark.sql.functions.col
      cols.flatMap { c =>
        val n = df.filter(col(c).isNull).count()
        if (n == 0) None else Some(s"column $c has $n NULLs")
      }.headOption
    }
}
