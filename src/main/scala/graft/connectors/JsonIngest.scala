package graft.connectors

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Corrupt-tolerant JSON ingestion — the bad-records path every production
  * replication pipeline needs: a malformed payload must never kill the job
  * NOR silently disappear. Rows split into a well-formed stream (typed
  * struct) and a quarantine stream (raw payload kept for replay/repair),
  * mirroring the dead-letter-queue pattern of CDC consumers.
  *
  * Built on `from_json` PERMISSIVE mode with a corrupt-record capture
  * column, so the parse stays a single codegen-friendly projection — no
  * UDF, no job-level failure mode, linear at any scale.
  */
object JsonIngest {

  final val CorruptCol = "_corrupt_record"

  /** `schema` + the corrupt-capture field (PERMISSIVE mode requires it to
    * be part of the parse schema). */
  def withCorruptField(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else StructType(schema.fields :+ StructField(CorruptCol, StringType, nullable = true))

  /** Parse `jsonCol` into struct column `parsed`; malformed payloads yield
    * `parsed._corrupt_record` = the raw string and nulls elsewhere. */
  def parse(df: DataFrame, jsonCol: String, schema: StructType): DataFrame =
    df.withColumn("parsed",
      from_json(col(jsonCol), withCorruptField(schema),
                Map("mode" -> "PERMISSIVE",
                    "columnNameOfCorruptRecord" -> CorruptCol)))

  private def isCorrupt: Column =
    col(s"parsed.$CorruptCol").isNotNull

  /** Rows whose payload parsed cleanly, corrupt column dropped. */
  def wellFormed(parsed: DataFrame): DataFrame =
    parsed.filter(!isCorrupt)
      .withColumn("parsed", col("parsed").dropFields(CorruptCol))

  /** Rows to dead-letter: original columns + the offending payload. */
  def quarantine(parsed: DataFrame, jsonCol: String): DataFrame =
    parsed.filter(isCorrupt)
      .drop("parsed")
      .withColumn("quarantined_payload", col(jsonCol))
}
