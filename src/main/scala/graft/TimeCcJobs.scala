package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev probe (r19 brief item: CC-family round-count reduction): per-JOB
  * wall times for one assignContracted run over the k23 edge set, so the
  * cost of the tail contraction passes (the candidate for fusion/removal)
  * is measured instead of guessed. Edge production is timed separately and
  * checkpointed first so the CC jobs are isolated. Not part of the driver
  * contract.
  */
object TimeCcJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    val docs = graft.engine.Tables.documents(spark, sfDir)
    val t0 = System.nanoTime()
    val edges = graft.api.Dedup.tokenJaccardPairsAuto(
      docs, "doc_id", "text", "source", 0.6).localCheckpoint()
    println(f"EDGES|${edges.count()}|${(System.nanoTime() - t0) / 1e9}%.2f s")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.getOrDefault(je.jobId, 0L)
        if (s > 0)
          println(f"JOB|${je.jobId}|${(System.nanoTime() - s) / 1e9}%.3f s")
      }
    })
    for (rep <- 1 to 3) {
      val t1 = System.nanoTime()
      println(s"--- assignContracted rep $rep")
      val r = graft.operators.ConnectedComponents.assignContracted(
        docs.select("doc_id"), edges, "doc_id", "id1", "id2")
      r.count()
      println(f"CC_TOTAL|$rep|${(System.nanoTime() - t1) / 1e9}%.2f s" +
        s"|trace=${graft.operators.ConnectedComponents.lastTrace.get}")
      graft.operators.ConnectedComponents.freeResult(r)
    }
    spark.stop()
  }
}
