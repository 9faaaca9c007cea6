package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic windowed-analytics helpers. */
object Windows {

  /** As-of join: each `right` row enriched with the `left` value nearest
    * its timestamp per key — `mode` picks the direction:
    *   - `"backward"` (default): latest left value at or before the right
    *     ts (trades-get-latest-quote / purchases-get-latest-signup);
    *   - `"forward"`: earliest left value at or after the right ts
    *     (next-snapshot attach);
    *   - `"nearest"`: whichever of the two has the smaller absolute ts
    *     gap; an exact tie resolves backward.
    *
    * NOT a range join: the naive join + per-key extremum materializes
    * |left_k| × |right_k| rows per key (quadratic in per-key activity —
    * one hot key at 100× data skews a single task). Here both inputs are
    * UNIONed and a running `last(struct(ts, value)) IGNORE NULLS` window
    * carries the as-of (ts, value) pair forward (and, for
    * forward/nearest, a mirror window over the reversed order carries it
    * backward): one shuffle on the key, linear per-key work, WindowExec's
    * spillable buffer. Ties at equal ts resolve left-visible-to-right
    * (a left row AT the right row's ts matches in every mode — standard
    * inclusive semantics). NULL keys never match (join parity); NULL-ts
    * left rows contribute nothing (filtered before the union, so they
    * cannot sort ahead of the partition and leak a value); NULL-ts right
    * rows get NULL; NULL-`valueCol` left rows contribute nothing
    * (`IGNORE NULLS` parity with the correlated-subquery oracle). Among
    * several left rows at one (key, ts), the greatest `valueCol` wins —
    * the window order tiebreaks on the value, so the pick is total, not
    * physical-row-order dependent (requires an orderable `valueCol`).
    * `tolerance` (optional) bounds the match gap — the vendor asof-join
    * "max lookback" option: a match farther than the bound (in the units
    * of `tsCol`'s difference type — a long delta, or an INTERVAL for
    * timestamps) yields NULL instead.
    *
    * Returns `right`'s columns plus `outCol` (left's `valueCol` type). */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           valueCol: String, outCol: String = "asof_value",
           mode: String = "backward",
           tolerance: Option[Column] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(mode),
            s"asOf mode must be backward|forward|nearest, got $mode")
    val vType = left.schema(valueCol).dataType
    val lvType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_t", left.schema(tsCol).dataType),
      org.apache.spark.sql.types.StructField("_v", vType)))
    val rowType = org.apache.spark.sql.types.StructType(right.schema.fields)
    val l = left.filter(col(tsCol).isNotNull)
      .select(col(keyCol).as("__k"), col(tsCol).as("__t"),
              when(col(valueCol).isNotNull,
                   struct(col(tsCol).as("_t"), col(valueCol).as("_v"))).as("__lv"),
              lit(0).as("__kind"),
              lit(null).cast(rowType).as("__row"))
    val r = right.select(col(keyCol).as("__k"), col(tsCol).as("__t"),
                         lit(null).cast(lvType).as("__lv"),
                         lit(1).as("__kind"),
                         struct(right.columns.map(col): _*).as("__row"))
    def running(o: Column*) = last(col("__lv"), ignoreNulls = true).over(
      Window.partitionBy("__k").orderBy(o: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    // kind asc keeps a left row at the right row's ts inside the frame in
    // both directions; __lv last tiebreaks equal-ts left rows totally.
    val bw = running(col("__t").asc_nulls_first, col("__kind").asc, col("__lv").asc)
    val fw = running(col("__t").desc_nulls_last, col("__kind").asc, col("__lv").asc)
    val u = l.unionByName(r)
    val scored = mode match {
      case "backward" => u.withColumn("__pick", bw)
      case "forward"  => u.withColumn("__pick", fw)
      case "nearest"  =>
        // tie → backward: chosen when its gap is <= the forward gap
        u.withColumn("__b", bw).withColumn("__f", fw)
          .withColumn("__pick",
            when(col("__f").isNull, col("__b"))
              .when(col("__b").isNull, col("__f"))
              .when(col("__t") - col("__b._t") <= col("__f._t") - col("__t"),
                    col("__b"))
              .otherwise(col("__f")))
    }
    // tolerance (max allowed ts gap, e.g. lit(300L) or an INTERVAL
    // expression matching the ts type's difference): a match farther than
    // the bound returns NULL. Uniform post-mask is exact in every mode —
    // the pick is already the nearest match in its direction(s), so if IT
    // exceeds the bound, every other candidate does too.
    val gap = when(col("__pick._t") <= col("__t"), col("__t") - col("__pick._t"))
      .otherwise(col("__pick._t") - col("__t"))
    val inTol = tolerance.map(tol => gap <= tol).getOrElse(lit(true))
    scored.filter(col("__kind") === 1)
      .select(right.columns.map(c => col(s"__row.$c").as(c)) :+
              when(col("__k").isNull || col("__t").isNull || !inTol,
                   lit(null).cast(vType))
                .otherwise(col("__pick._v")).as(outCol): _*)
  }

  /** Order-statistics rank against a population: each `probes` row enriched
    * with the count of `values` rows whose `valueCol` strictly exceeds the
    * probe's `probeCol` — the "how many X exceed Y" operator, and the
    * scale-safe plan for the non-equi-join shape
    * `probes LEFT JOIN values ON v > p` + COUNT.
    *
    * NOT a theta join: Spark plans `ON v > p` as a nested-loop join and for
    * an outer build may only broadcast the *population* side — fatal when
    * the population is the fact table (15M+ rows at 100× blows any
    * broadcast threshold; the non-broadcast fallback is cartesian-shaped).
    * Here both inputs are UNIONed, range-partitioned descending on the
    * value, and a two-pass prefix sum computes the exact count:
    * per-range-partition running counts, plus a per-partition offset
    * (a #partitions-row aggregate, broadcast back). One range exchange +
    * one pid-hash exchange; the fact side is never broadcast and never
    * joined against itself; per-partition work is linear.
    *
    * Semantics mirror the left non-equi join + COUNT(value_pk): NULL
    * population values never count (filter them before calling if the
    * counted column differs from `valueCol`); a NULL probe matches nothing
    * (count 0); comparison is strict, so equal values do not count.
    * Returns `probes`' columns plus `outCol` (LONG). */
  def rankAgainst(probes: DataFrame, values: DataFrame, probeCol: String,
                  valueCol: String, outCol: String = "n_greater"): DataFrame = {
    val rowT = struct(probes.columns.map(col): _*)
    val p = probes.select(col(probeCol).as("__b"), lit(0L).as("__w"),
                          lit(0).as("__kind"), rowT.as("__row"))
    val v = values.filter(col(valueCol).isNotNull)
      .select(col(valueCol).as("__b"), lit(1L).as("__w"), lit(1).as("__kind"),
              lit(null).cast(p.schema("__row").dataType).as("__row"))
    // desc on value, probes-before-equal-values: a probe's prefix sum then
    // counts exactly the strictly-greater population rows. RangePartitioner
    // keeps equal sort keys in one partition, and a probe/equal-value split
    // across a boundary still resolves correctly (the probe sorts earlier).
    val u = p.unionByName(v)
      .repartitionByRange(col("__b").desc_nulls_last, col("__kind").asc)
      .withColumn("__p", spark_partition_id())
    val wRun = Window.partitionBy("__p")
      .orderBy(col("__b").desc_nulls_last, col("__kind").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // offsets: cumulative population count of all earlier (greater-value)
    // range partitions — #partitions rows, so the global window and the
    // broadcast are both trivially small. Derived from the same `u` subtree
    // so the range exchange is reused (identical boundaries by construction).
    val wOff = Window.orderBy(col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = u.groupBy("__p").agg(sum("__w").as("__tot"))
      .withColumn("__off", coalesce(sum("__tot").over(wOff), lit(0L)))
      .select("__p", "__off")
    u.withColumn("__run", sum("__w").over(wRun))
      .filter(col("__kind") === 0)
      .join(broadcast(offsets), "__p")
      .select(probes.columns.map(c => col(s"__row.$c").as(c)) :+
              when(col(s"__row.$probeCol").isNull, lit(0L))
                .otherwise(col("__run") + col("__off")).as(outCol): _*)
  }

  /** Top-k rows per group. Plans as WindowGroupLimit: per-partition top-k
    * runs before the full window sort materializes, so only k·groups rows
    * survive the shuffle. */
  def topKPerGroup(df: DataFrame, partitionCols: Seq[String],
                   orderCols: Seq[Column], k: Int,
                   rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Batch sessionization with Spark session_window semantics:
    * session end = last event + gap. */
  def sessionize(df: DataFrame, tsCol: String, keyCol: String, gap: String): DataFrame =
    df.groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("session_window.start").as("s_start"),
              col("session_window.end").as("s_end"), col("n_events"))
}
