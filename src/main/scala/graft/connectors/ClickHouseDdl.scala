package graft.connectors

import org.apache.spark.sql.types._

/** ClickHouse DDL generation — the SURVEY §1.2 type matrix, engine-side
  * (SURVEY §2.2 "ClickHouse JDBC sink"). Produces `CREATE TABLE` statements
  * for the MergeTree family from a Spark schema; golden-tested offline.
  * [public: ClickHouse CREATE TABLE / MergeTree docs]
  */
object ClickHouseDdl {

  /** Spark → ClickHouse type mapping (nullable handled by the caller). */
  def chType(dt: DataType): String = dt match {
    case BooleanType               => "Bool"
    case ByteType                  => "Int8"
    case ShortType                 => "Int16"
    case IntegerType               => "Int32"
    case LongType                  => "Int64"
    case FloatType                 => "Float32"
    case DoubleType                => "Float64"
    case d: DecimalType            => s"Decimal(${d.precision}, ${d.scale})"
    case DateType                  => "Date32"
    case TimestampType             => "DateTime64(6)"
    case StringType                => "String"
    case BinaryType                => "String"
    case ArrayType(et, _)          => s"Array(${chType(et)})"
    case MapType(kt, vt, _)        => s"Map(${chType(kt)}, ${chType(vt)})"
    case st: StructType =>
      "Tuple(" + st.fields.map(f => s"${f.name} ${field(f)}").mkString(", ") + ")"
    case other =>
      throw new IllegalArgumentException(s"no ClickHouse mapping for $other")
  }

  /** Column type with Nullable() wrapping where legal (CH forbids
    * Nullable(Array/Map/Tuple)). */
  def field(f: StructField): String = {
    val t = chType(f.dataType)
    val wrappable = f.dataType match {
      case _: ArrayType | _: MapType | _: StructType => false
      case _                                         => true
    }
    if (f.nullable && wrappable) s"Nullable($t)" else t
  }

  sealed trait Engine { def render: String }
  case object MergeTree extends Engine { val render = "MergeTree()" }
  /** Latest-row-wins on the ORDER BY key (our i02 semantics). */
  final case class ReplacingMergeTree(version: Option[String] = None) extends Engine {
    def render: String = s"ReplacingMergeTree(${version.getOrElse("")})"
  }
  /** Insert/delete collapse by a sign column (our i03 semantics). */
  final case class CollapsingMergeTree(sign: String) extends Engine {
    def render: String = s"CollapsingMergeTree($sign)"
  }

  /** Render the CREATE TABLE statement. Key columns must be non-nullable in
    * CH ORDER BY, so they are rendered bare. */
  def createTable(
      table: String,
      schema: StructType,
      engine: Engine,
      orderBy: Seq[String],
      partitionBy: Option[String] = None,
      ifNotExists: Boolean = true): String = {
    require(orderBy.nonEmpty, "ClickHouse MergeTree requires ORDER BY")
    val keySet = orderBy.toSet
    val cols = schema.fields.map { f =>
      val eff = if (keySet.contains(f.name)) f.copy(nullable = false) else f
      s"  `${f.name}` ${field(eff)}"
    }.mkString(",\n")
    val ine = if (ifNotExists) "IF NOT EXISTS " else ""
    val part = partitionBy.map(p => s"\nPARTITION BY $p").getOrElse("")
    s"""CREATE TABLE $ine`$table` (
       |$cols
       |) ENGINE = ${engine.render}$part
       |ORDER BY (${orderBy.map(c => s"`$c`").mkString(", ")})""".stripMargin
  }

  /** Batched INSERT statement prefix (values streamed by the writer). */
  def insertSql(table: String, schema: StructType): String =
    s"INSERT INTO `$table` (${schema.fieldNames.map(c => s"`$c`").mkString(", ")}) VALUES"
}
