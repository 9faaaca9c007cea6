package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter SEMI-JOIN REDUCTION [public: Bloom 1970; the classic
  * distributed-join "bit-vector filtering" of Mackert/Lohman 1986, the
  * same mechanism Spark 4's own runtime row-level filtering injects
  * (`BloomFilterAggregate`/`BloomFilterMightContain`, spark source
  * sql/catalyst/optimizer/InjectRuntimeFilter.scala) — built here
  * EXPLICITLY so a pipeline can apply it where the optimizer's
  * heuristics don't reach: a decontamination join whose small side is an
  * eval set and whose big side is the 100 TB train shingle stream].
  *
  * Contract: `prefilter` returns a SUPERSET of the big side's
  * semi-join survivors — Bloom filters have NO false negatives, so an
  * exact join downstream produces bit-identical results with or without
  * the prune (spec-pinned); the prune only cuts the rows that shuffle.
  * The filter itself is built distributed (one aggregation pass over the
  * SMALL side), collected driver-side (a few MB at the default fpp —
  * the IVF-centroid driver-resident-model posture), and broadcast into
  * a map-side `mightContain` test ahead of any exchange.
  *
  * When to use: small side ≤ ~100M distinct keys (the sketch stays
  * broadcastable), big side arbitrarily large, join selective (most big
  * rows DON'T match — exactly the decontamination shape, where eval
  * n-grams are a vanishing fraction of train n-grams). When the join is
  * NOT selective the prune costs one scan-side test and saves little —
  * the fpp×|big| false-positive tail is the only overshoot either way. */
object BloomPrune {

  /** Build a Bloom filter over `small`'s LONG key column and prune `big`
    * to rows whose key might be present. Long keys only by design: every
    * graft dedup/decontam key is already a digest (`Spans.digestsExpr`,
    * xxhash64) or an id — hash textual keys to 64 bits FIRST (the same
    * normalization both join sides need anyway for the exact join).
    *
    * EAGER: `stat.bloomFilter` runs its TreeAggregate job when this
    * method is CALLED — the sketch must exist before the pruned frame
    * can be built, so constructing the returned plan already executed
    * one pass over `small` (r16 ADVICE: plan-only callers pay it too).
    *
    * @param expectedItems sizing for the sketch (overestimate is safe —
    *                      bits scale linearly; underestimate inflates fpp)
    * @param fpp           target false-positive rate (drives bits/key) */
  def prefilter(big: DataFrame, bigKey: Column,
                small: DataFrame, smallKey: Column,
                expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val spark = big.sparkSession
    // one distributed pass over the small side; merge per partition
    // (BloomFilter.mergeInPlace is associative+commutative — order-free)
    val keyed = small.select(smallKey.cast("long").as("k"))
      .where(col("k").isNotNull)
    // public API: one TreeAggregate pass, per-partition sketches merged
    // associatively (DataFrameStatFunctions.bloomFilter, spark source)
    val bf: BloomFilter = keyed.stat.bloomFilter("k", expectedItems, fpp)
    val bc = spark.sparkContext.broadcast(bf)
    val might = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    big.where(might(bigKey.cast("long")))
  }

  /** The decontamination composition the prune exists for: exact
    * digest-equality SEMI join of `big` against `small`, with the Bloom
    * prune applied to the big side first. Result rows are EXACTLY the
    * unpruned semi join's (no false negatives + exact join downstream);
    * only the shuffle volume changes. */
  def semiJoinPruned(big: DataFrame, bigKey: String,
                     small: DataFrame, smallKey: String,
                     expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val pruned = prefilter(big, col(bigKey), small, col(smallKey),
                           expectedItems, fpp)
    // alias the build side internally so bigKey == smallKey (the natural
    // call for a shared digest column) cannot trip Spark's
    // ambiguous-self-join analysis
    pruned.join(small.select(col(smallKey).as("__bp_key")).distinct(),
                col(bigKey) === col("__bp_key"), "left_semi")
  }
}
