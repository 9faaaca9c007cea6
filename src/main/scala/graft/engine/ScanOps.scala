package graft.engine

import org.apache.spark.sql.functions._

/** SURVEY §2.1 block A — scans / sources.
  *
  * All reads are declarative parquet scans: Catalyst pushes column pruning
  * (a02) and predicate filters (a03) into the vectorized parquet reader, so
  * at 100 TB only the referenced columns / matching row groups are read.
  */
object ScanOps {

  /** a01 — full-scan cardinalities of all 10 tables, unioned. */
  val a01: Q = Q(
    "a01_scan_count",
    Tables.names
      .map(n => s"SELECT '$n' AS tbl, COUNT(*) AS n_rows FROM $n")
      .mkString("", " UNION ALL ", " ORDER BY tbl ASC NULLS LAST"),
    (s, dir) =>
      Tables.names
        .map(n => Tables.table(s, dir, n)
          .agg(count(lit(1)).as("n_rows"))
          .select(lit(n).as("tbl"), col("n_rows")))
        .reduce(_ unionAll _)
        .orderBy(asc_nulls_last("tbl")))

  /** a02 — column pruning: 3 of 11 lineitem columns, first 100 rows.
    * NOTE (l_orderkey, l_linenumber) is NOT unique in the fixtures — the
    * ORDER BY covers every output column so ties are identical rows and the
    * LIMIT cut is deterministic on both engines. */
  val a02: Q = Q(
    "a02_scan_project",
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |ORDER BY l_orderkey ASC NULLS LAST, l_linenumber ASC NULLS LAST,
      |         l_quantity ASC NULLS LAST
      |LIMIT 100""".stripMargin,
    (s, dir) =>
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy(asc_nulls_last("l_orderkey"), asc_nulls_last("l_linenumber"),
                 asc_nulls_last("l_quantity"))
        .limit(100))

  /** a03 — predicate pushdown: one month of shipments, selective columns.
    * The filter reaches the parquet reader as a row-group predicate. */
  val a03: Q = Q(
    "a03_scan_filter_pushdown",
    """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      |ORDER BY l_orderkey ASC NULLS LAST, l_linenumber ASC NULLS LAST,
      |         l_shipdate ASC NULLS LAST, l_quantity ASC NULLS LAST""".stripMargin,
    (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1997-04-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
        .orderBy(asc_nulls_last("l_orderkey"), asc_nulls_last("l_linenumber"),
                 asc_nulls_last("l_shipdate"), asc_nulls_last("l_quantity")))

  def ops: Vector[Q] = Vector(a01, a02, a03)
}
