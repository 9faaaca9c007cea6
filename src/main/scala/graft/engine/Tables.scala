package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (FIXTURES.md).
  *
  * Every Tier-1 operator takes `sfDir` at call time (SURVEY §2 rule 5) so the
  * same code runs at any scale factor — and, on a real cluster, against any
  * table root. Reads are plain `spark.read.parquet`: column pruning and
  * predicate pushdown then reach the parquet scan via Catalyst with zero help
  * from us (SURVEY §4).
  */
object Tables {
  final val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Uniform loader: returns the table with its canonical engine schema.
    * `events` needs special handling — see [[events]]. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir) else load(spark, sfDir, name)

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `ts` normalization across fixture generations.
    *
    * INVARIANT (pinned in FixtureInvariantsSpec): the returned `ts` is
    * NON-NULL. Struct-ordered extreme reads (d61, j21's chain key) and
    * their NULLS LAST oracles only agree on non-null ts; a fixture that
    * gains NULL ts must re-decide those plans' null posture first.
    *
    * Early driver fixtures
    * stored `ts` as INT64 TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects outright ([PARQUET_TYPE_ILLEGAL]) — those are read as raw
    * nanos via the legacy conf, then truncated to µs with INTEGER
    * division (`div` — a double `/` would lose precision: 2024 epoch
    * nanos ≈ 1.7e18 > 2^53; DuckDB truncates ns→µs the same way).
    * Round-8+ fixtures store timestamp[us], which Spark reads as
    * TIMESTAMP_NTZ — cast to TIMESTAMP under the session's UTC zone, the
    * same instants the nanos route produced. Either way every consumer
    * sees one canonical TIMESTAMP column.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
