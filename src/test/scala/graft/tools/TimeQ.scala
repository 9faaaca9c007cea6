package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").count()
    args.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.1").count()
      println(f"$n: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
