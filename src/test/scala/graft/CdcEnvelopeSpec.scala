package graft

import graft.connectors.{CdcCollapse, CdcEvent}

/** The pure CDC collapse semantics (SURVEY §2.2 "Binlog CDC ingestion") —
  * the same rules i02/i03 prove against the DuckDB oracle, here on a typed
  * envelope with hand-built edge cases. */
class CdcEnvelopeSpec extends SparkSpec {

  private def ds(events: CdcEvent*) = {
    val sp = spark
    import sp.implicits._
    spark.createDataset(events)
  }

  test("latest-per-key picks max (ts, position), position breaks ts ties") {
    implicit val s = spark
    val out = CdcCollapse.latestPerKey(ds(
      CdcEvent(1, 10, 1000, "c", "v1"),
      CdcEvent(1, 11, 2000, "u", "v2"),
      CdcEvent(1, 12, 2000, "u", "v3"), // same ts, higher position wins
      CdcEvent(2, 13, 500, "c", "w1")
    )).collect().map(e => e.key -> e.payload).toMap
    assert(out == Map(1L -> "v3", 2L -> "w1"))
  }

  test("tombstone drops a deleted key; resurrect on later insert") {
    implicit val s = spark
    val dead = CdcCollapse.effectiveState(ds(
      CdcEvent(1, 10, 1000, "c", "v1"),
      CdcEvent(1, 11, 2000, "d", ""))).collect()
    assert(dead.isEmpty)
    val resurrected = CdcCollapse.effectiveState(ds(
      CdcEvent(1, 10, 1000, "c", "v1"),
      CdcEvent(1, 11, 2000, "d", ""),
      CdcEvent(1, 12, 3000, "c", "v2"))).collect()
    assert(resurrected.map(_.payload).toSeq == Seq("v2"))
  }

  test("collapse agrees with the i02 window formulation on fixture data") {
    implicit val s = spark
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    val asCdc = graft.engine.Tables.events(spark, sf0001)
      .select(col("user_id").as("key"), col("event_id").as("position"),
              unix_micros(col("ts")).as("tsMicros"),
              when(col("event_type") === "error", "d").otherwise("u").as("op"),
              col("event_type").as("payload"))
      .as[CdcEvent]
    val collapsed = CdcCollapse.latestPerKey(asCdc).collect()
      .map(e => e.key -> e.position).toMap
    val oracle = graft.engine.CdcOps.i02.fn(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(collapsed == oracle)
  }
}
