package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer [public: Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units"; Gage 1994]:
  * deterministic merge-table TRAINING over a distributed word-frequency
  * frame, plus the ENCODE fold — both a reference Scala implementation
  * and the Column-expression form the declared k57 query ships (one
  * definition site, so the plan side and the operator can never drift).
  *
  * Semantics pinned here (BpeSpec):
  *
  *  - TRAIN: iterate `nMerges` times; each round counts ADJACENT symbol
  *    pairs weighted by word frequency and merges the argmax under the
  *    pinned tie rule (count DESC, left ASC, right ASC — a total order,
  *    so training is reproducible bit-for-bit on any cluster layout).
  *  - ENCODE: apply the learned merges IN ORDER, each rule exhaustively
  *    (greedy leftmost within a rule). Sequential full application is
  *    equivalent to the classic lowest-rank-pair-first encode because a
  *    rule's operands are always symbols formed by EARLIER rules only —
  *    a later merge can never re-enable an earlier one (spec-pinned on
  *    the chained-merge corpus).
  *
  * Scale shape of `train`: the input is the WORD-TYPE frame (word,
  * freq) — vocabulary-sized, not corpus-sized (the caller aggregates
  * the corpus once; Zipf bounds word types far below token mass). Each
  * round is ONE distributed explode + hash agg over that frame and one
  * 1-ROW argmax collect (the merge table is model-sized and
  * driver-resident by contract, like the IVF centroid tables); the
  * symbol column is re-derived map-side and `localCheckpoint`ed each
  * round so the plan does not deepen with the merge count (the
  * ConnectedComponents lineage discipline). Encode is map-only.
  */
object Bpe {

  /** Reference encode step: one rule (a, b) → a+b, greedy leftmost.
    * Within one rule no cascade is possible (the merged symbol a+b can
    * never equal `a` again since `b` is nonempty), so a single left
    * fold IS the exhaustive application. */
  def applyMerge(sym: Vector[String], a: String, b: String): Vector[String] =
    sym.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == a && x == b)
        acc.init :+ (a + b)
      else acc :+ x
    }

  /** Reference encode: character symbols → merges in learned order. */
  def encode(word: String, merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(word.toVector.map(_.toString)) { case (s, (a, b)) =>
      applyMerge(s, a, b)
    }

  /** SQL literal guard: merge symbols are embedded in expression strings
    * (and in the k57 oracle's REPLACE patterns, where a space would also
    * break the separator discipline). */
  private def checkSymbol(s: String): String = {
    require(s.nonEmpty && s.forall(c => c != '\'' && c != '\\' && c != ' '),
      s"BPE symbol must be quote/backslash/space-free: '$s'")
    s
  }

  /** Column-expression encode: fold `merges` over a symbol-array SQL
    * expression via nested `aggregate` HOFs — codegen'd, map-only, the
    * exact [[applyMerge]] semantics (bit-parity spec-pinned against the
    * reference on random words). Lambda variables are suffixed per rule
    * because Spark rejects shadowed lambda names in nested HOFs. */
  def encodeExpr(symbolsExpr: String, merges: Seq[(String, String)]): String =
    merges.zipWithIndex.foldLeft(symbolsExpr) { case (e, ((a0, b0), r)) =>
      val a = checkSymbol(a0); val b = checkSymbol(b0)
      s"aggregate($e, cast(array() as array<string>), (ac$r, x$r) -> " +
        s"case when size(ac$r) > 0 and element_at(ac$r, -1) = '$a' " +
        s"and x$r = '$b' " +
        s"then concat(slice(ac$r, 1, size(ac$r) - 1), array('$a$b')) " +
        s"else concat(ac$r, array(x$r)) end)"
    }

  /** Character split of a word expression — the base symbol sequence.
    * `split(w, '')` yields one element per character on both engines
    * (parity spec-pinned). */
  def charsExpr(wordExpr: String): String = s"split($wordExpr, '')"

  /** Deterministic distributed BPE training over a (word, freq) frame.
    * Returns the learned merge table in order; stops early when no
    * adjacent pair remains. */
  def train(words: DataFrame, wordCol: String, freqCol: String,
            nMerges: Int): Seq[(String, String)] = {
    var df = words
      .select(expr(charsExpr(wordCol)).as("__s"),
              col(freqCol).cast("long").as("__f"))
      .localCheckpoint()
    val merges = Vector.newBuilder[(String, String)]
    var done = false
    var round = 0
    while (round < nMerges && !done) {
      // adjacent-pair counts weighted by word frequency — one explode +
      // one vocab-bounded hash agg; argmax is a 1-row TakeOrdered under
      // the pinned total order
      val top = df
        .filter(size(col("__s")) >= 2)
        .select(col("__f"), explode(expr(
          "transform(sequence(1, size(__s) - 1), i -> named_struct(" +
            "'a', element_at(__s, i), 'b', element_at(__s, i + 1)))"))
          .as("__p"))
        .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
        .agg(sum(col("__f")).as("c"))
        .orderBy(desc("c"), asc("a"), asc("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        // re-derive symbols map-side; checkpoint so lineage stays flat
        df = df.withColumn("__s", expr(encodeExpr("__s", Seq((a, b)))))
          .localCheckpoint()
        round += 1
      }
    }
    merges.result()
  }
}
