package graft
import org.apache.spark.sql.SparkSession

/** Scratch plan dump for d44 iteration (test scope, run via
  * `sbt "Test/runMain graft.PlanDumpD44"`). */
object PlanDumpD44 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.engine.Round10Ops.d44.fn(spark, "/root/testdata/sf0.1")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    println("=== D44 PLAN ===")
    println(p.take(14000))
    println("=== exchanges: " + "\\bExchange\\b".r.findAllIn(p).length +
      " reused: " + "ReusedExchange".r.findAllIn(p).length)
    spark.stop()
  }
}
