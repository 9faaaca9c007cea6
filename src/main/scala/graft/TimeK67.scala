package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dev probe (r19): paired A/B of k67's sweep machinery — the r18 grid
  * BNL join + 10×|pairs| explode + countDistinct expand (OLD, inlined
  * here verbatim) vs the r19 monotone-bucket histogram suffix-sum form
  * (NEW = the shipped `Round19Ops.k67Plan`) — over ONE checkpointed pair
  * frame, alternating inside one session so both forms share each host
  * noise band. Also asserts the two forms return identical rows every
  * rep (the restructure's equivalence, executed). Not part of the driver
  * contract.
  */
object TimeK67 {
  private val SweepGrid = Seq(0.5, 0.6, 0.7, 0.8, 0.9)

  /** The r18 k67 sweep body, verbatim (for the A side). */
  private def oldPlan(pairs: DataFrame): DataFrame = {
    val sp = pairs.sparkSession
    import sp.implicits._
    val grid = SweepGrid.toDF("threshold")
    grid.join(pairs, col("jaccard") >= col("threshold"), "left")
      .select(col("threshold"), explode(array(
        struct(col("id1").as("doc"), lit(false).as("rm")),
        struct(col("id2").as("doc"), lit(true).as("rm")))).as("x"))
      .groupBy("threshold")
      .agg(expr("count(x.doc) DIV 2").as("n_pairs"),
           countDistinct(col("x.doc")).as("n_docs"),
           countDistinct(when(col("x.rm"), col("x.doc"))).as("n_removed_est"))
      .orderBy(asc_nulls_last("threshold"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    val docs = graft.engine.Tables.documents(spark, sfDir)
    val pairs = graft.api.Dedup.tokenJaccardPairsAuto(
      docs, "doc_id", "text", "source", 0.5).localCheckpoint()
    println(s"PAIRS|${pairs.count()}")
    val res = collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (rep <- 1 to runs; side <- Seq("old", "new")) {
      val t0 = System.nanoTime()
      val df = if (side == "old") oldPlan(pairs)
               else graft.engine.Round19Ops.k67Plan(pairs)
      val rows = df.collect()
      val dt = (System.nanoTime() - t0) / 1e9
      res(side) ::= dt
      println(f"TIME|$side|rep=$rep|$dt%.3f|rows=${rows.length}")
      if (side == "new") {
        val want = oldPlan(pairs).collect().map(_.toSeq).toSet
        val got = rows.map(_.toSeq).toSet
        require(got == want, s"k67 forms diverge: $got vs $want")
      }
    }
    def med(xs: List[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    println(f"MEDIAN|old=${med(res("old"))}%.3f|new=${med(res("new"))}%.3f")
    spark.stop()
  }
}
