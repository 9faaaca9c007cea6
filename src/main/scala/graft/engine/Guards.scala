package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Runtime guards for data-dependent row/memory bombs — the repo's
  * loud-failure discipline (the SequenceMatch two-constraint reject, the
  * PITR horizon guard) applied INSIDE distributed expressions, where a
  * driver-side `require` can't see the data.
  */
object Guards {

  /** A dense integer spine `sequence(mn, mx)` whose span is enforced
    * `<= maxSpan` AT RUNTIME, per row: one outlier key (e.g. a
    * timestamp-valued JSON field in a single blob) makes `mx − mn`
    * ~10¹², and the explode is a memory/row bomb BEFORE any downstream
    * filter can save it — ClickHouse's `mapPopulateSeries` shares the
    * hazard silently; we fail loudly instead (the r9 verdict watch
    * item). Implementation: `assert_true` rides inside the upper-bound
    * expression (NULL when the span is legal, a runtime error
    * otherwise), so the guard is evaluated on every row BEFORE its
    * sequence materializes and costs one comparison. */
  def boundedSequence(mn: Column, mx: Column, maxSpan: Long,
                      what: String): Column =
    sequence(
      mn,
      mx + coalesce(
        assert_true(mx - mn <= lit(maxSpan),
          concat(lit(s"$what: key span "), (mx - mn).cast("string"),
                 lit(s" exceeds the $maxSpan dense-spine guard — refusing " +
                     "to explode; pre-filter outlier keys or raise the " +
                     "bound deliberately"))),
        lit(0L)).cast("long"))
}
