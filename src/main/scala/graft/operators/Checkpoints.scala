package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Shared checkpoint hygiene for the iterative/sequential operators
  * (ConnectedComponents, PageRank, GreedyCover): `localCheckpoint` pins
  * its RDD blocks in storage memory for the session's lifetime, and Spark
  * exposes no public un-checkpoint — without an explicit release a
  * long-lived session (the Bench process runs multiple full passes)
  * accumulates monotone storage creep and GC pressure (measured on the CC
  * queries in r7). Extracted in r22 when the third private copy appeared.
  */
private[operators] object Checkpoints {

  /** Unpersist the cached RDDs behind localCheckpoint'ed frames by walking
    * the analyzed plan to its LogicalRDD leaves (the checkpoint cache).
    * Only safe for frames the OPERATOR owns — a localCheckpoint RDD cannot
    * be recomputed after unpersist, so walking an arbitrary caller frame
    * could poison the caller's later actions (flagged r7). */
  def free(frames: Iterable[DataFrame]): Unit =
    frames.foreach(_.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    })

  /** Release the one cached frame an operator RESULT pins. Guarded to
    * frames whose ROOT plan node is a LogicalRDD — i.e. a checkpoint the
    * operator returned; non-checkpoint roots are a safe no-op (they pin
    * nothing of ours), which protects callers that pass derived frames. */
  def freeResult(labels: DataFrame): Unit =
    labels.queryExecution.analyzed match {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
