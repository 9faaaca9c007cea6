package graft

import org.apache.spark.sql.functions._
import graft.api.Bucketing
import graft.engine.Tables

/** Bucketed-layout joins: the write-once-shuffle-never lever (SURVEY §4).
  * Asserts the actual plan property — no Exchange between two tables
  * bucketed by the join key — not just result correctness. */
class BucketingSpec extends SparkSpec {

  test("matching-bucket join eliminates the shuffle; results still correct") {
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the sort-merge path so the Exchange assertion is meaningful
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = Tables.orders(spark, sf0001)
      val c = Tables.customer(spark, sf0001)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      Bucketing.writeBucketed(o, "bkt_orders", s"$dir/o", "o_custkey", 8)
      Bucketing.writeBucketed(c, "bkt_customer", s"$dir/c", "o_custkey", 8)

      val bucketed = Bucketing.bucketedJoin(spark, "bkt_orders", "bkt_customer", "o_custkey")
      assert(!Bucketing.hasShuffle(bucketed),
             "bucketed join must not shuffle:\n" +
               bucketed.queryExecution.executedPlan.toString)

      // same join un-bucketed DOES shuffle (the property is the layout's)
      val plain = o.join(c, "o_custkey")
      assert(Bucketing.hasShuffle(plain))

      assert(bucketed.count() == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_customer")
    }
  }

  test("time-partitioned layout prunes to only the filtered partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_parts").toString
    val ev = Tables.events(spark, sf0001)
      .withColumn("day", to_date(col("ts")))
    Bucketing.writePartitioned(ev, s"$dir/events", "day")
    val all = spark.read.parquet(s"$dir/events")
    val totalFiles = Bucketing.filesRead(all)
    val oneDay = all.filter(col("day") === "2024-01-05")
    val prunedFiles = Bucketing.filesRead(oneDay)
    assert(oneDay.count() ==
      ev.filter(col("day") === "2024-01-05").count())
    assert(prunedFiles > 0, "filtered day must exist in the fixture")
    assert(prunedFiles < totalFiles / 5,
           s"pruning must skip most partitions: read $prunedFiles of $totalFiles files")
  }

  test("Z-order layout: range predicates on EITHER column skip most files") {
    import graft.api.Bucketing
    import graft.engine.Tables
    val li = Tables.lineitem(spark, sf001).select("l_orderkey", "l_partkey", "l_quantity")
    val nFiles = 16
    val zDir = java.nio.file.Files.createTempDirectory("zord").toString
    val linDir = java.nio.file.Files.createTempDirectory("lin").toString
    Bucketing.writeZOrdered(li, zDir, "l_orderkey", "l_partkey", nFiles)
    // control: plain linear sort on the leading column only
    li.repartitionByRange(nFiles, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(linDir)
    def fileRanges(dir: String): Seq[(Long, Long, Long, Long)] =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).toIndexedSeq
        .map { f =>
          val r = spark.read.parquet(f.getPath)
            .agg(min("l_orderkey"), max("l_orderkey"),
                 min("l_partkey"), max("l_partkey")).collect().head
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        }
    // a file is SKIPPABLE for a range predicate when its min/max (the
    // stats every parquet footer carries — what engines prune with)
    // cannot intersect the range
    def skippable(rs: Seq[(Long, Long, Long, Long)], onA: Boolean,
                  lo: Long, hi: Long): Int =
      rs.count { case (amin, amax, bmin, bmax) =>
        if (onA) amax < lo || amin > hi else bmax < lo || bmin > hi
      }
    val (z, lin) = (fileRanges(zDir), fileRanges(linDir))
    assert(z.size == nFiles && lin.size == nFiles)
    val stats = li.agg(min("l_partkey"), max("l_partkey"),
                       min("l_orderkey"), max("l_orderkey")).collect().head
    val (bLo, bHi) = (stats.getLong(0), stats.getLong(1))
    val (aLo, aHi) = (stats.getLong(2), stats.getLong(3))
    // narrow range on the NON-leading column: linear sort spreads partkey
    // over every file (nothing skippable); Z-order clusters it
    val bMid = (bLo + bHi) / 2; val bW = (bHi - bLo) / 16
    val (zB, linB) = (skippable(z, onA = false, bMid, bMid + bW),
                      skippable(lin, onA = false, bMid, bMid + bW))
    assert(linB <= 1, s"control: linear layout can skip ~nothing on partkey, got $linB")
    // measured: 3–5/16 skippable at 16 files (varies with the range
    // partitioner's sample draw), 14/32 at 32 — the ratio grows with file
    // count, and real deployments run thousands of files. Pin the
    // structural separation from the linear layout's ~zero, not an
    // absolute count inside the sampling-jitter band.
    assert(zB >= 3 && zB > linB,
      s"Z-order must make files skippable on the second column: $zB of $nFiles (linear: $linB)")
    // and the leading column still prunes usefully under Z-order
    val aMid = (aLo + aHi) / 2; val aW = (aHi - aLo) / 16
    val zA = skippable(z, onA = true, aMid, aMid + aW)
    assert(zA >= nFiles / 4,
      s"Z-order must keep first-column pruning: $zA of $nFiles skippable")
  }

  test("ranked Z-order: skewed domain prunes like a uniform one (min/max scaling does not)") {
    import graft.api.Bucketing
    // 99% of rows live in [0,100); 1% are huge outliers up to ~6.4e9.
    // Min/max scaling maps the dense mass into z-cell 0 of the skewed
    // column, so its bits contribute nothing to the interleave; rank
    // scaling spreads the mass across all cells.
    val n = 64000L
    val df = spark.range(n).select(
      expr("CASE WHEN id % 100 = 0 THEN id * 100000 ELSE id % 100 END").as("skewed"),
      expr("(id * 2654435761) % 100000").as("uniform"))
    val nFiles = 16
    val mmDir = java.nio.file.Files.createTempDirectory("zmm").toString
    val rkDir = java.nio.file.Files.createTempDirectory("zrk").toString
    Bucketing.writeZOrdered(df, mmDir, "skewed", "uniform", nFiles)
    Bucketing.writeZOrderedRanked(df, rkDir, "skewed", "uniform", nFiles)
    def fileRanges(dir: String): Seq[(Long, Long, Long, Long)] =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).toIndexedSeq
        .map { f =>
          val r = spark.read.parquet(f.getPath)
            .agg(min("skewed"), max("skewed"),
                 min("uniform"), max("uniform")).collect().head
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        }
    def skippable(rs: Seq[(Long, Long, Long, Long)], onA: Boolean,
                  lo: Long, hi: Long): Int =
      rs.count { case (amin, amax, bmin, bmax) =>
        if (onA) amax < lo || amin > hi else bmax < lo || bmin > hi
      }
    val (mm, rk) = (fileRanges(mmDir), fileRanges(rkDir))
    assert(mm.size == nFiles && rk.size == nFiles)
    // range predicate INSIDE the dense region — where real queries live
    val (mmSkew, rkSkew) = (skippable(mm, onA = true, 40, 46),
                            skippable(rk, onA = true, 40, 46))
    assert(mmSkew <= 1,
      s"control: min/max scaling collapses the dense mass, ~no files skippable, got $mmSkew")
    assert(rkSkew >= nFiles / 4,
      s"rank scaling must make the skewed column prune: $rkSkew of $nFiles")
    // done-criterion: skewed-column skip ratio ≥ the uniform-column ratio
    val rkUni = skippable(rk, onA = false, 50000, 56250)
    assert(rkSkew >= rkUni,
      s"skewed-column skips ($rkSkew) must be >= uniform-column skips ($rkUni)")
  }
}
