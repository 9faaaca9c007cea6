package graft

import org.apache.spark.sql.functions._

/** Throwaway: measure dedup-selector stats on the fixtures. */
object TmpStats {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("stats", Some("local[8]"), Some(8)).getOrCreate()
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val df = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val tok = df.select(col("doc_id"), col("source").as("__blk"),
        explode(array_distinct(split(col("text"), " "))).as("__tok"))
      val dfreq = tok.groupBy("__blk", "__tok").agg(count(lit(1)).as("df"))
      val stats = dfreq.agg(
        sum(col("df") * col("df")).as("sum_df2"),
        sum(col("df")).as("sum_df"),
        max(col("df")).as("max_df")).collect()(0)
      val nDocs = df.count()
      val maxBlk = df.groupBy("source").count().agg(max("count")).collect()(0).getLong(0)
      println(s"STATS $sf nDocs=$nDocs maxBlk=$maxBlk sumDf2=${stats.getLong(0)} " +
        s"sumDf=${stats.getLong(1)} maxDf=${stats.getLong(2)} " +
        s"meanDf=${stats.getLong(1).toDouble / dfreq.count()} " +
        s"candPerDoc=${stats.getLong(0).toDouble / nDocs}")
    }
    spark.stop()
  }
}
