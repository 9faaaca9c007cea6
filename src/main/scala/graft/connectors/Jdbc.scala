package graft.connectors

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** MySQL-snapshot source configuration (SURVEY §2.2 rows 1–2).
  *
  * The JDBC *wire* path is DERBY-PROVEN (r16): ConnectorsSpec drives this
  * source end-to-end against an embedded `jdbc:derby:memory:` database —
  * real DriverManager handshake, the partitioned snapshot's numPartitions
  * concurrent range queries (stripe sizes asserted per partition),
  * predicate pushdown into the remote SQL (PushedFilters + wire-answer
  * equality), the incremental watermark pull across two insert batches
  * with durable-checkpoint resume, and the Spark JDBC write leg. Only the
  * MySQL *dialect* remains config-only (no MySQL server or driver jar in
  * the offline image); on a cluster the identical read plan runs with the
  * MySQL driver string, each executor pulling one slice.
  */
final case class JdbcSourceConfig(
    url: String,
    table: String,
    user: String = "",
    password: String = "",
    partitionColumn: Option[String] = None,
    lowerBound: Option[Long] = None,
    upperBound: Option[Long] = None,
    numPartitions: Int = 8,
    fetchSize: Int = 10000,
    driver: String = "com.mysql.cj.jdbc.Driver") {

  require(numPartitions > 0, "numPartitions must be positive")
  require(partitionColumn.isEmpty || (lowerBound.isDefined && upperBound.isDefined),
    "partitionColumn requires lowerBound and upperBound")
  require(lowerBound.zip(upperBound).forall { case (l, u) => l <= u },
    "lowerBound must be <= upperBound")

  /** The exact options handed to `spark.read.format("jdbc")`. */
  def options: Map[String, String] = {
    val base = Map(
      "url" -> url, "dbtable" -> table, "user" -> user, "password" -> password,
      "driver" -> driver, "fetchsize" -> fetchSize.toString)
    partitionColumn match {
      case Some(c) => base ++ Map(
        "partitionColumn" -> c,
        "lowerBound" -> lowerBound.get.toString,
        "upperBound" -> upperBound.get.toString,
        "numPartitions" -> numPartitions.toString)
      case None => base
    }
  }
}

/** A table source that can deliver a full snapshot. */
trait SnapshotSource {
  def snapshot(spark: SparkSession): DataFrame
}

final class JdbcSnapshotSource(val config: JdbcSourceConfig) extends SnapshotSource {
  override def snapshot(spark: SparkSession): DataFrame =
    spark.read.format("jdbc").options(config.options).load()
}

/** Incremental pull: `WHERE watermarkColumn > <checkpoint>` slices with a
  * durable file checkpoint — the classic poll-based replication loop
  * (SURVEY §2.1 i01 proves the slice semantics on real data).
  *
  * The loader is pluggable so the predicate/checkpoint machinery is testable
  * against parquet-backed frames offline; production wiring passes a JDBC
  * loader that appends the predicate via the `dbtable` subquery pushdown.
  */
final class IncrementalSource(
    watermarkColumn: String,
    checkpointPath: String,
    loader: (SparkSession, String) => DataFrame) {

  /** Predicate for the next slice given the persisted checkpoint. */
  def slicePredicate(): String =
    readCheckpoint() match {
      case Some(w) => s"$watermarkColumn > '$w'"
      case None    => "1=1"
    }

  /** Read the next incremental slice. */
  def nextSlice(spark: SparkSession): DataFrame =
    loader(spark, slicePredicate())

  def readCheckpoint(): Option[String] = {
    val p = Paths.get(checkpointPath)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), "UTF-8").trim)
    else None
  }

  /** Atomically persist the new high-watermark (write temp + move). */
  def commitCheckpoint(watermark: String): Unit = {
    val p = Paths.get(checkpointPath)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val tmp = Paths.get(checkpointPath + ".tmp")
    Files.write(tmp, watermark.getBytes("UTF-8"))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
               StandardCopyOption.ATOMIC_MOVE)
  }
}
