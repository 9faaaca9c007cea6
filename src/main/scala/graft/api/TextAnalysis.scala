package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic text-analysis operators for training-data pipelines: quality
  * scoring, token counting, fingerprinting, language-ID scoring — all
  * per-row codegen'd expressions (zero shuffle).
  */
object TextAnalysis {

  /** Whitespace token array. */
  def tokens(textCol: Column, sep: String = " "): Column = split(textCol, sep)

  /** Stopword ratio over a literal stopword set. */
  def stopwordRatio(textCol: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(textCol)
    val stopArr = array(stopwords.map(lit): _*)
    size(filter(toks, t => array_contains(stopArr, t))).cast("double") / size(toks)
  }

  /** Token counts three ways: whitespace, alpha-word regex, BPE-ish
    * vowel-piece regex. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(split(col(textCol), " ")).as("n_ws"),
      regexp_count(col(textCol), lit("[a-z]+")).cast("int").as("n_alpha"),
      regexp_count(col(textCol),
        lit("[bcdfghjklmnpqrstvwxyz]*[aeiou]+[bcdfghjklmnpqrstvwxyz]*"))
        .cast("int").as("n_pieces"))

  /** Order-canonical set fingerprint: md5 over sorted distinct tokens. */
  def setFingerprint(textCol: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(textCol)))))

  /** Order-sensitive polynomial rolling hash mod 1e9+7 (pure integer —
    * bit-identical on any engine). */
  def rollingHash(textCol: Column): Column =
    aggregate(
      transform(tokens(textCol), t => (ascii(t) * 131 + length(t)).cast("bigint")),
      lit(0L),
      (h, v) => (h * 31 + v) % 1000000007L)

  /** Membership scores of distinct tokens against named marker sets
    * (language/domain-ID heuristic). */
  def markerScores(df: DataFrame, idCol: String, textCol: String,
                   markers: Map[String, Seq[String]]): DataFrame = {
    val toks = array_distinct(tokens(col(textCol)))
    val scoreCols = markers.toSeq.sortBy(_._1).map { case (k, ws) =>
      size(array_intersect(toks, array(ws.map(lit): _*))).as(s"score_$k")
    }
    df.select(col(idCol) +: scoreCols: _*)
  }
}
