package graft.engine

/** The ExactSubstr span predicate shared by k44–k47/k53/k55 [public: Lee
  * et al. 2022 §3.1]: 20-token stride-1 windows of a pre-split token
  * array column named `__t`, as SQL lambda strings for `expr(...)`.
  * One definition site — a change to span width, digest, or delimiter
  * cannot silently de-synchronize the family (each declared query's
  * ORACLE carries its own independent copy of the predicate by design;
  * THIS constant only unifies the Spark plan side). */
private[engine] object Spans {

  /** md5 digests of every 20-token stride-1 span (digests cross the
    * shuffle, never span text). */
  val DigestsExpr: String =
    "transform(sequence(1, size(__t) - 19), " +
      "st -> md5(concat_ws(' ', slice(__t, st, 20))))"

  /** The span TEXTS themselves — only for consumers that must recover
    * text map-side (k47's boilerplate report). */
  val TextsExpr: String =
    "transform(sequence(1, size(__t) - 19), " +
      "st -> concat_ws(' ', slice(__t, st, 20)))"
}
