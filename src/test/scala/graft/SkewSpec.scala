package graft

import org.apache.spark.sql.functions._
import graft.api.Skew

/** Salted-skew utilities agree exactly with their unsalted equivalents. */
class SkewSpec extends SparkSpec {

  test("saltedAggregate == plain aggregate on a skewed key distribution") {
    val sp = spark
    import sp.implicits._
    // 90% of rows on one key — the classic hot-key shape
    val df = (1 to 10000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "HOT", i * 0.01)
    }.toDF("k", "v")
    val salted = Skew.saltedAggregate(df, Seq("k"), "v", numSalts = 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val plain = df.groupBy("k")
      .agg(sum(col("v").cast("decimal(18,6)")).cast("double").as("sum_v"),
           count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin == plain join") {
    val sp = spark
    import sp.implicits._
    val big = (1 to 5000).map(i => (i.toLong % 3, i)).toDF("k", "payload")
    val small = Seq((0L, "zero"), (1L, "one"), (2L, "two")).toDF("sk", "name")
    val salted = Skew.saltedJoin(big, small, "k", "sk")
      .select("k", "payload", "name")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val plain = big.join(small, col("k") === col("sk"))
      .select("k", "payload", "name")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(salted == plain && salted.size == 5000)
  }
}
