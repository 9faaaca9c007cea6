package graft

import org.apache.spark.sql.SparkSession

/** One-off measurement: naive inverted-index Jaccard vs PPJoin prefix
  * filtering at sf0.1 (numbers quoted in Dedup.tokenJaccardPairsPrefix's
  * scaladoc and BASELINE.md). */
object TimePpjoin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.cache().count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n pairs)")
    }
    // warm both paths once, then measure
    for (round <- 0 to 1) {
      val tag = if (round == 0) "warmup" else "measured"
      time(s"$tag naive")(
        graft.api.Dedup.tokenJaccardPairs(docs, "doc_id", "text", "source", 0.6).count())
      time(s"$tag ppjoin")(
        graft.api.Dedup.tokenJaccardPairsPrefix(docs, "doc_id", "text", "source", 0.6).count())
    }
    spark.stop()
  }
}
