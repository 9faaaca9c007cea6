package graft

/** Dev probe (r19 brief item: b09/c-block overscheduling at 32 cores —
  * 8-core runs measured FASTER on tiny per-stage data): A/B the named
  * queries with `spark.sql.adaptive.coalescePartitions.parallelismFirst`
  * on (Spark's default: coalesce only down to defaultParallelism, so tiny
  * shuffles still run core-count-many tasks) vs off (coalesce by
  * `advisoryPartitionSizeInBytes` — the setting Spark's own docs recommend
  * for production clusters, and the scale-safe fix if the 32-task waves
  * are what b09/c-block pay). Interleaved passes inside ONE session so the
  * A/B shares each host-noise band; per-config medians decide. Not part of
  * the driver contract.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… sbt "runMain graft.TimeWaves q1 q2 …"
  */
object TimeWaves {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    val names = if (args.nonEmpty) args.toSeq
      else Seq("b09_recursive_cte", "c02_join_broadcast", "c10_join_multiway",
               "c17_join_topk_revenue", "c19_join_range_binned",
               "c23_join_q21_waiting", "k02_near_dedup_jaccard")
    val unknown = names.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")
    val key = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    val results = collection.mutable.Map
      .empty[(String, String), List[Double]].withDefaultValue(Nil)
    for (rep <- 1 to runs; pf <- Seq("true", "false")) {
      spark.conf.set(key, pf)
      names.foreach { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        results((n, pf)) ::= dt
        println(f"TIME|$n|pf=$pf|rep=$rep|$dt%.3f")
      }
    }
    def med(xs: List[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    names.foreach { n =>
      val a = med(results((n, "true")))
      val b = med(results((n, "false")))
      println(f"MEDIAN|$n|pfTrue=$a%.3f|pfFalse=$b%.3f|ratio=${b / a}%.3f")
    }
    spark.stop()
  }
}
