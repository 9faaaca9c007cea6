package graft

import org.apache.spark.sql.functions._
import graft.api.Bucketing
import graft.engine.Tables

/** Bucketed-layout joins: the write-once-shuffle-never lever (SURVEY §4).
  * Asserts the actual plan property — no Exchange between two tables
  * bucketed by the join key — not just result correctness. */
class BucketingSpec extends SparkSpec {

  test("matching-bucket join eliminates the shuffle; results still correct") {
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the sort-merge path so the Exchange assertion is meaningful
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = Tables.orders(spark, sf0001)
      val c = Tables.customer(spark, sf0001)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      Bucketing.writeBucketed(o, "bkt_orders", s"$dir/o", "o_custkey", 8)
      Bucketing.writeBucketed(c, "bkt_customer", s"$dir/c", "o_custkey", 8)

      val bucketed = Bucketing.bucketedJoin(spark, "bkt_orders", "bkt_customer", "o_custkey")
      assert(!Bucketing.hasShuffle(bucketed),
             "bucketed join must not shuffle:\n" +
               bucketed.queryExecution.executedPlan.toString)

      // same join un-bucketed DOES shuffle (the property is the layout's)
      val plain = o.join(c, "o_custkey")
      assert(Bucketing.hasShuffle(plain))

      assert(bucketed.count() == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_customer")
    }
  }

  test("time-partitioned layout prunes to only the filtered partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_parts").toString
    val ev = Tables.events(spark, sf0001)
      .withColumn("day", to_date(col("ts")))
    Bucketing.writePartitioned(ev, s"$dir/events", "day")
    val all = spark.read.parquet(s"$dir/events")
    val totalFiles = Bucketing.filesRead(all)
    val oneDay = all.filter(col("day") === "2024-01-05")
    val prunedFiles = Bucketing.filesRead(oneDay)
    assert(oneDay.count() ==
      ev.filter(col("day") === "2024-01-05").count())
    assert(prunedFiles > 0, "filtered day must exist in the fixture")
    assert(prunedFiles < totalFiles / 5,
           s"pruning must skip most partitions: read $prunedFiles of $totalFiles files")
  }
}
