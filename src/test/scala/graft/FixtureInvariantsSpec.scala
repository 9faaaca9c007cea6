package graft

import org.apache.spark.sql.functions._

/** Fixture invariants that declared plans rely on SILENTLY — pinned here so
  * a regenerated fixture that breaks one trips `sbt test` loudly instead of
  * flipping a hash comparison downstream (r13 ADVICE items 1 and 4).
  *
  * Two invariants, each load-bearing for a specific declared-query family:
  *
  *  1. `events.ts` is NON-NULL. d61Plan reads both extremes via
  *     struct-ordered MIN/MAX (`struct(ts, …)` — a NULL ts field sorts
  *     FIRST in Spark's struct ordering) while its oracle orders
  *     `ts ASC NULLS LAST` / `ts DESC` (NULLS LAST both ways in DuckDB);
  *     j21Plan's `min(struct(ts, event_id))` chain key has the same
  *     asymmetry. The two engines agree on every NON-NULL ts and would
  *     pick different extreme rows on a NULL one — so the non-null
  *     invariant is the parity contract, asserted at both test SFs.
  *
  *  2. `events.value` cents are NEVER negative (only exact zeros and
  *     positives). d60's exact-regime Misra-Gries face filters both
  *     engines to `cents > 0`; that filter keeps the domains identical
  *     because the only excluded values are zeros a SUM ignores anyway.
  *     A regenerated fixture carrying a genuinely NEGATIVE value would be
  *     silently absorbed by the filter (positive-only totals, no sketch
  *     contract violation surfaced) — this pin makes it loud instead.
  */
class FixtureInvariantsSpec extends SparkSpec {

  for (dir <- Seq(sf0001, sf001)) {
    val sfName = dir.split('/').last

    test(s"events.ts is non-null at $sfName (d61/j21 struct-extreme contract)") {
      val nulls = graft.engine.Tables.events(spark, dir)
        .filter(col("ts").isNull).count()
      assert(nulls == 0L,
        s"$nulls NULL ts rows in $dir/events.parquet — d61/j21's " +
          "struct-ordered extremes and their NULLS LAST oracles now " +
          "disagree; guard the struct keys before re-declaring")
    }

    test(s"events cents never negative at $sfName (d60 weight-domain contract)") {
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
      val neg = graft.engine.Tables.events(spark, dir)
        .filter(cents < 0).count()
      assert(neg == 0L,
        s"$neg negative-cents rows in $dir/events.parquet — d60's " +
          "cents > 0 filter would silently drop them from BOTH engines; " +
          "decide the Misra-Gries negative-weight posture explicitly")
    }

    test(s"md5 split classes all populated at $sfName (k17/k24/k45/k52 contract)") {
      // the hash-split rule (first md5 hex char: ≤'c' train, 'd' val,
      // else test) must leave every class NON-EMPTY on documents AND
      // embeddings — an eval class emptied by a fixture regeneration
      // would turn k24/k45 (and k52 on vectors) into zero-predicate
      // degenerate passes without failing any hash comparison
      def classes(df: org.apache.spark.sql.DataFrame, id: String) = {
        val h1 = substring(md5(col(id).cast("string")), 1, 1)
        df.select(when(h1 <= "c", "train").when(h1 === "d", "val")
            .otherwise("test").as("split"))
          .groupBy("split").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      val d = classes(graft.engine.Tables.documents(spark, dir), "doc_id")
      val e = classes(graft.engine.Tables.embeddings(spark, dir), "vec_id")
      Seq("train", "val", "test").foreach { c =>
        assert(d.getOrElse(c, 0L) > 0L, s"documents split '$c' empty: $d")
        assert(e.getOrElse(c, 0L) > 0L, s"embeddings split '$c' empty: $e")
      }
    }

    test(s"documents token domain exceeds the k54 vocab budget at $sfName") {
      // k54's OOV predicate only bites while V = 16 < |distinct tokens|;
      // a regenerated fixture with a tiny vocabulary would silently turn
      // the declared coverage metric into an all-zero column
      val distinctToks = graft.engine.Tables.documents(spark, dir)
        .select(explode(split(col("text"), " ")).as("t"))
        .agg(countDistinct(col("t"))).head.getLong(0)
      assert(distinctToks > 16L,
        s"only $distinctToks distinct tokens in $dir — k54's V=16 vocab " +
          "budget no longer bites; re-pick V before re-declaring")
    }

    test(s"documents.text is pure ASCII at $sfName (h53/k72 declared-domain contract)") {
      // h53/k72's oracle equality rests on the build-time codepoint sweep:
      // all injected codepoints are sweep-verified JDK==DuckDB agreers, and
      // the UNDERLYING text contributes only ASCII (where the pipelines
      // agree trivially). A regenerated fixture with non-ASCII text could
      // smuggle in one of the 30 Unicode-13.0 divergers and flip the hash
      // — surface that here, not in the driver's oracle diff.
      val nonAscii = graft.engine.Tables.documents(spark, dir)
        .filter(not(col("text").rlike("^[\\x00-\\x7F]*$")))
        .count()
      assert(nonAscii == 0L,
        s"$nonAscii non-ASCII documents in $dir — re-run the JDK/DuckDB " +
          "codepoint sweep for the new text domain before trusting h53/k72")
    }
  }
}
