package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomPrune

/** BloomPrune pins: the semi-join reduction is EXACT (superset prune +
  * exact join downstream ⇒ bit-identical survivors) and actually prunes
  * when the join is selective — the two properties that make it safe and
  * worth it at 100 TB. */
class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("pruned semi join == plain semi join (no false negatives, exact composition)") {
    // keys deliberately adversarial: dense range + the hash-collision-ish
    // negatives right next to the positives
    val big = spark.range(0, 20000).select((col("id") * 7L).as("k"),
                                           col("id").as("payload"))
    val small = spark.range(0, 1000).select((col("id") * 91L).as("ek"))
    val plain = big.join(small.distinct(), col("k") === col("ek"), "left_semi")
      .orderBy("payload").collect().map(_.getLong(1)).toSeq
    val pruned = BloomPrune.semiJoinPruned(big, "k", small, "ek",
                                           expectedItems = 1000L)
      .orderBy("payload").collect().map(_.getLong(1)).toSeq
    assert(pruned == plain, "prune must not change the exact join result")
  }

  test("semiJoinPruned accepts the SAME key name on both sides (the natural shared-digest call)") {
    // regression: the un-aliased form threw AMBIGUOUS_REFERENCE the
    // moment bigKey == smallKey — every digest-keyed caller's natural
    // shape
    val big = spark.range(0, 100).select(col("id").as("g"), col("id").as("p"))
    val small = spark.range(0, 10).select((col("id") * 5L).as("g"))
    val got = BloomPrune.semiJoinPruned(big, "g", small, "g", 10L)
      .select("p").orderBy("p").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 5L, 10L, 15L, 20L, 25L, 30L, 35L, 40L, 45L))
  }

  test("prefilter is a superset of the matching rows and prunes a disjoint big side") {
    // big side: 50k keys, only 500 of which are in the small set —
    // the decontamination selectivity shape
    val big = spark.range(0, 50000).select(col("id").as("k"))
    val small = spark.range(0, 500).select((col("id") * 100L).as("ek")) // 0,100,…,49900 — all inside
    val kept = BloomPrune.prefilter(big, col("k"), small, col("ek"), 500L, 0.01)
      .count()
    // every true match survives (>= 500) and the fpp tail is bounded:
    // 500 + ~0.01 * 49500 ≈ 995; allow 4x slack for sketch variance
    assert(kept >= 500, s"false negative: only $kept survived")
    assert(kept < 500 + 4 * 495, s"prune ineffective: $kept of 50000 kept")
  }

  test("digest-keyed decontamination shape: eval shingles prune the train stream exactly") {
    // the k34-class composition on real fixture text: train-side 3-gram
    // digests pruned by an eval-side Bloom, then the exact semi join
    val docs = graft.engine.Tables.documents(spark, sf0001)
      .select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", expr(
        """transform(sequence(1, greatest(size(toks) - 2, 0)),
          |  i -> xxhash64(concat_ws(' ', slice(toks, i, 3))))""".stripMargin)
        .as("digests"))
      .select($"doc_id", explode($"digests").as("g"))
    val eval_ = docs.filter($"doc_id" % 20 === 0).select($"g".as("eg")).distinct()
    val train = docs.filter($"doc_id" % 20 =!= 0)
    val plain = train.join(eval_, $"g" === $"eg", "left_semi")
      .groupBy("doc_id").count().orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaBloom = BloomPrune.semiJoinPruned(train, "g", eval_, "eg", 100000L)
      .groupBy("doc_id").count().orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaBloom == plain,
      "bloom-pruned contamination counts must equal the exact ones")
  }
}
