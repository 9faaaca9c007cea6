package graft

import org.apache.spark.sql.functions._

/** Dev probe: split k23/k25's cost into edge production vs the CC rounds
  * (the r11 brief's "cut the CC constant" needs to know which side owns
  * the time before touching either). Not part of the driver contract. */
object TimeCc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME|$label|${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }
    val docs = graft.engine.Tables.documents(spark, sfDir)
    for (rep <- 1 to 3) {
      val edges = time(s"edges_$rep") {
        val e = graft.api.Dedup.tokenJaccardPairsAuto(
          docs, "doc_id", "text", "source", 0.6).localCheckpoint()
        e.count(); e
      }
      val v = docs.select("doc_id")
      time(s"cc_contracted_$rep") {
        val r = graft.operators.ConnectedComponents.assignContracted(
          v, edges, "doc_id", "id1", "id2")
        r.count()
        graft.operators.ConnectedComponents.freeResult(r)
      }
      time(s"cc_star_seeded_$rep") {
        val r = graft.operators.ConnectedComponents.assignStarSeeded(
          v, edges, "doc_id", "id1", "id2")
        r.count()
        graft.operators.ConnectedComponents.freeResult(r)
      }
      edges.queryExecution.analyzed.foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false)
        case _ => ()
      }
    }
    spark.stop()
  }
}
