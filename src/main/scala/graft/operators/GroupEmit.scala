package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded group-and-emit: the shared bucket→pairs shape behind the LSH /
  * SimHash candidate generators (k15/k19), with a skew governor.
  *
  * The naive shape — `groupBy(bucket).agg(collect_list(...))` then explode
  * the i<j pairs — is sub-quadratic only while buckets stay small: one
  * degenerate bucket (a boilerplate-heavy corpus collapsing into a single
  * band) materializes the whole bucket in ONE row and emits O(B²) pairs from
  * ONE task — an executor OOM at 100 TB no parameter tuning can prevent.
  *
  * Here bucket sizes are measured first (window count — WindowExec streams
  * each group through a spillable row buffer, never one giant row), and:
  *  - buckets ≤ cap take the exact path: all i<j pairs, identical output to
  *    the naive shape;
  *  - buckets > cap degrade to STAR pairs (bucket-minimum paired with every
  *    other member): O(B) output, no collect_list at all, and — because
  *    near-dup candidates feed a connected-components/cluster step — the
  *    duplicate cluster the bucket represents stays fully connected. What is
  *    lost is only the non-witness pairs, not the clustering decision.
  *
  * Both branches hang off the same shuffle (identical Exchange subtree), so
  * the expensive upstream — signature computation — executes once and the
  * shuffle output is read twice (ReuseExchange; verified in ScaleOpsSpec).
  *
  * The payload struct must sort by the pair identity first (e.g.
  * `struct(doc_id, ...)`): emitted pairs satisfy x < y in payload order.
  */
object GroupEmit {

  /** Default star-degradation threshold. Oracle-checked callers (k15/k19)
    * rely on every fixture bucket sitting BELOW this — ScaleOpsSpec asserts
    * that headroom against the real bucket histograms at the largest sf. */
  val DefaultCap = 1000

  /** All i<j payload pairs per bucket, star-degraded above `cap` rows.
    * Returns columns `x`, `y` (payload structs). */
  def boundedPairs(df: DataFrame, bucketCols: Seq[String], payload: Column,
                   cap: Int = DefaultCap): DataFrame = {
    val keys = bucketCols.map(col)
    val w = Window.partitionBy(keys: _*)
    val t = df.select(keys :+ payload.as("__p"): _*)
      .withColumn("__sz", count(lit(1)).over(w))
      .withColumn("__min", min(col("__p")).over(w))
    val xs = col("__xs")
    val allPairs = flatten(transform(xs, (x, i) =>
      transform(slice(xs, i + lit(2), size(xs)),
                y => struct(x.as("x"), y.as("y")))))
    val small = t.filter(col("__sz") <= cap)
      .groupBy(keys: _*)
      .agg(sort_array(collect_list(col("__p"))).as("__xs"))
      .filter(size(xs) > 1)
      .select(explode(allPairs).as("__pair"))
    val large = t.filter(col("__sz") > cap && !(col("__p") <=> col("__min")))
      .select(struct(col("__min").as("x"), col("__p").as("y")).as("__pair"))
    small.unionByName(large)
      .select(col("__pair.x").as("x"), col("__pair.y").as("y"))
  }
}
