package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join: pair interval rows [startCol, endCol) with point rows
  * whose pointCol falls inside, sharing an equi key — WITHOUT the
  * BroadcastNestedLoopJoin Spark plans for a raw `ON key AND p BETWEEN s
  * AND e` (fatal at 100 TB: the non-broadcast fallback is cartesian-shaped
  * per key, and event keys are far too hot to nest-loop).
  *
  * Plan: quantize time into fixed bins; each interval is replicated to
  * every bin it touches (⌈span/bin⌉ + 1 rows — bounded when interval
  * length is), each point maps to exactly ONE bin; equi-join on
  * (key, bin) + the exact range post-filter. Because a point has a single
  * bin and an interval covers that bin at most once, no pair can
  * duplicate — no dedup pass. Shuffle is a plain hash exchange on
  * (key, bin); bin granularity trades replication (wider bins) against
  * join fan-in (narrower bins) and should sit near the typical interval
  * length.
  *
  * Returns the interval side's columns + the point side's columns for
  * every match, LEFT semantics: intervals with no points keep one row per
  * touched bin with NULL point columns — aggregate with count(pointCol)
  * (NULL-skipping), exactly how a raw LEFT range join composes.
  */
object RangeJoin {

  def binnedPointJoin(intervals: DataFrame, points: DataFrame,
                      key: String, startCol: String, endCol: String,
                      pointCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    val iv = intervals
      .withColumn("__bin",
        explode(sequence(bin(col(startCol)),
                         bin(greatest(col(endCol) - 1, col(startCol))))))
    val pt = points.withColumn("__bin", bin(col(pointCol)))
    iv.join(pt,
        iv(key) === pt(key) && iv("__bin") === pt("__bin") &&
          pt(pointCol) >= iv(startCol) && pt(pointCol) < iv(endCol),
        "left")
      .drop(pt(key)).drop(iv("__bin")).drop(pt("__bin"))
  }
}
