package graft

import org.apache.spark.sql.functions._

import graft.api.Similarity
import graft.operators.Hnsw

/** HNSW graph-ANN contracts (the r17-verdict growth item): the level law,
  * the structural invariants of the layered graph, full determinism /
  * input-partitioning invariance (the k64 discipline), hand-graph search
  * semantics, and the recall gate against the brute force on the fixture
  * embeddings — the [[graft.operators.Ann]] precedent for grading an
  * approximate index by measurement instead of trust.
  */
class HnswSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.engine.Tables.embeddings(spark, sf001)

  private lazy val index = Hnsw.build(emb, "vec_id", "embedding", dim = 64)

  test("level law: deterministic, geometric-ish, nested node sets") {
    val lv = index.levels
    // deterministic: rebuild assigns identical levels
    val again = emb.select(col("vec_id").as("node"),
                           Hnsw.levelCol("node", m = 8, maxLevel = 3,
                                         seed = 42L).as("level"))
    assert(lv.join(again, "node")
      .filter(lv("level") =!= again("level")).isEmpty)
    // geometric law: P(level >= 1) ~ 1/8; on 500 draws expect ~62, accept
    // a generous band (binomial sd ~7.4)
    val n = lv.count()
    val ge1 = lv.filter(col("level") >= 1).count()
    assert(n == 500)
    assert(ge1 >= 30 && ge1 <= 100, s"level>=1 count $ge1 off the 1/8 law")
    // nesting: layer l's node set is exactly {level >= l} on both ends of
    // every edge
    for (l <- 0 to index.topLayer) {
      val layerNodes = index.adjacency.filter(col("layer") === l)
        .select(explode(array(col("src"), col("dst"))).as("node")).distinct()
      assert(layerNodes.join(lv.filter(col("level") >= l), Seq("node"),
                             "left_anti").isEmpty,
        s"layer $l has an edge endpoint below level $l")
    }
  }

  test("adjacency invariants: out-degree <= 2m, no self-loops, no duplicate edges") {
    val adj = index.adjacency
    assert(adj.filter(col("src") === col("dst")).isEmpty)
    val dup = adj.groupBy("layer", "src", "dst").count()
      .filter(col("count") > 1).count()
    assert(dup == 0L)
    val maxDeg = adj.groupBy("layer", "src").count()
      .agg(max("count")).collect().head.getLong(0)
    assert(maxDeg <= 16L, s"out-degree $maxDeg exceeds the 2m=16 cap")
  }

  test("build and search are pure functions of the input SET (k64 invariance)") {
    val shuffled = emb.repartition(7, col("label"))
    val i2 = Hnsw.build(shuffled, "vec_id", "embedding", dim = 64)
    // identical graphs
    assert(index.adjacency.unionAll(i2.adjacency)
      .groupBy("layer", "src", "dst").count().filter(col("count") =!= 2).isEmpty)
    assert(i2.entryId == index.entryId && i2.topLayer == index.topLayer)
    // identical search results for identical queries
    val qs = emb.filter(col("vec_id") % 97 === 0)
    val r1 = Hnsw.search(index, qs, "vec_id", "embedding", k = 5)
    val r2 = Hnsw.search(i2, qs.repartition(5), "vec_id", "embedding", k = 5)
    assert(r1.unionAll(r2).groupBy("qid", "rank", "vec_id").count()
      .filter(col("count") =!= 2).isEmpty)
    i2.free()
  }

  test("hand graph: greedy descent + beam finds the exact neighborhood") {
    // 5 unit vectors on a 2-D fan: ids 0..4 at angles 0, 10, 20, 30, 90
    // degrees (padded to dim 4 with zeros). Query at 12 degrees: true
    // top-3 by cosine is 1 (10deg), 2 (20deg), 0 (0deg).
    def v(deg: Double) = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat, 0f, 0f)
    }
    val corpus = Seq(0L -> v(0), 1L -> v(10), 2L -> v(20), 3L -> v(30),
                     4L -> v(90)).toDF("vec_id", "embedding")
    val idx = Hnsw.build(corpus, "vec_id", "embedding", dim = 4, m = 2,
                         bands = 1, bandBits = 1)
    val q = Seq(100L -> v(12)).toDF("vec_id", "embedding")
    val got = Hnsw.search(idx, q, "vec_id", "embedding", k = 3, ef = 5)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 0L), s"got $got")
    idx.free()
  }

  test("recall gate: mean recall@10 >= 0.9 vs brute force on the fixture") {
    val probes = emb.filter(col("vec_id") % 25 === 0) // 20 probe queries
    val approx = Hnsw.search(index, probes, "vec_id", "embedding",
                             k = 10, excludeSelf = true)
    val probeIds = probes.select("vec_id").as[Long].collect().sorted
    val recalls = probeIds.map { pid =>
      val truth = Similarity.cosineTopK(emb, "vec_id", "embedding", pid, 10)
        .select("vec_id").as[Long].collect().toSet
      val got = approx.filter(col("qid") === pid)
        .select("vec_id").as[Long].collect().toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.length
    info(f"mean recall@10 = $mean%.3f over ${recalls.length} probes")
    assert(mean >= 0.9, s"mean recall@10 $mean < 0.9 " +
      s"(per-probe: ${recalls.map(r => f"$r%.2f").mkString(", ")})")
  }

  test("ef monotonicity: recall@10 is non-decreasing in ef on the fixture") {
    val probes = emb.filter(col("vec_id") % 50 === 0)
    def recall(ef: Int): Double = {
      val approx = Hnsw.search(index, probes, "vec_id", "embedding",
                               k = 10, ef = ef, excludeSelf = true)
      val probeIds = probes.select("vec_id").as[Long].collect()
      val rs = probeIds.map { pid =>
        val truth = Similarity.cosineTopK(emb, "vec_id", "embedding", pid, 10)
          .select("vec_id").as[Long].collect().toSet
        val got = approx.filter(col("qid") === pid)
          .select("vec_id").as[Long].collect().toSet
        truth.intersect(got).size.toDouble / truth.size
      }
      rs.sum / rs.length
    }
    val r10 = recall(10)
    val r32 = recall(32)
    assert(r32 + 1e-9 >= r10, s"recall fell as ef grew: ef=10 $r10, ef=32 $r32")
  }
}
