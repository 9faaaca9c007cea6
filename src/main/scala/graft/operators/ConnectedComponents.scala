package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the consumer every
  * near-dup candidate generator (k02/k15/k19, MinHashDedup, SimHashDedup)
  * feeds: candidate PAIRS become duplicate CLUSTERS, and a pipeline keeps
  * one representative per cluster. Label = smallest reachable vertex id
  * (the conventional canonical representative).
  *
  * Plan: iterative min-label propagation. Each round every vertex takes
  * the min of its own label and its neighbors' labels — one equi-join of
  * the symmetrized edges against the labels plus one min-aggregate, both
  * hash-partitioned on vertex id, so a round is two shuffles of
  * |edges| + |vertices| rows and NO driver-side data (the driver sees one
  * convergence counter per round). Rounds needed = graph diameter in
  * label-hops; duplicate clusters are near-cliques, so 2-3 rounds
  * converge. Each round persists its labels and unpersists the previous
  * round's (lineage stays one round deep — at 100 TB swap the persist for
  * `checkpoint` on a real cluster for fault-tolerance across a long
  * chain).
  *
  * [public: the label-propagation / alternating small-star formulation of
  * CC on MapReduce — Kiveris et al., "Connected Components in MapReduce
  * and Beyond", SoCC'14; this is the plain propagation variant, right for
  * low-diameter dup graphs.]
  */
object ConnectedComponents {

  /** Label every vertex with its component's minimum vertex id.
    * Returns (`vertexCol`, `component`). Vertices absent from `edges`
    * keep their own id (singleton clusters). */
  def assign(vertices: DataFrame, edges: DataFrame, vertexCol: String,
             srcCol: String, dstCol: String, maxIters: Int = 20): DataFrame = {
    // persist the DIRECTED edges before symmetrizing: every round joins
    // against them, and the edge producer is typically the expensive part
    // (a near-dup join). Persisting the union instead would run the
    // producer once PER UNION BRANCH during materialization (alias
    // renumbering defeats exchange reuse across the two branches);
    // persisting the base runs it exactly once and the symmetric view is
    // two cheap projections of the cache. Measured 18.6 s → 5 s for k23
    // at sf0.1.
    val base = edges.select(col(srcCol).as("__s"), col(dstCol).as("__d")).persist()
    val sym = base
      .select(col("__s").as("__v"), col("__d").as("__n"))
      .unionByName(base.select(col("__d").as("__v"), col("__s").as("__n")))
    var cached = vertices.select(col(vertexCol).as("__v"),
                                 col(vertexCol).as("__label")).persist()
    var labels = cached
    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      // neighbor labels flow along edges; min over {own, neighbors'}. The
      // old label rides along so convergence is read off the SAME
      // materialized frame — one action per round, not a second
      // compare-join job.
      val next = sym
        .join(labels.select(col("__v").as("__n2"), col("__label")),
              col("__n") === col("__n2"))
        .select(col("__v"), col("__label"), lit(null).cast("boolean").as("__own"))
        .unionByName(labels.withColumn("__own", lit(true)))
        .groupBy("__v")
        .agg(min("__label").as("__label"),
             min(when(col("__own"), col("__label"))).as("__old"))
        .persist()
      val changed = next.filter(col("__label") =!= col("__old")).count()
      cached.unpersist()
      cached = next
      labels = next.select("__v", "__label")
      converged = changed == 0
      iters += 1
    }
    base.unpersist()
    // the final labels stay persisted: the caller's sort/write reads the
    // materialized rows (|V| rows), never re-runs the iteration chain
    labels.select(col("__v").as(vertexCol), col("__label").as("component"))
  }
}
