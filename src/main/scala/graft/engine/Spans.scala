package graft.engine

/** The ExactSubstr span predicate shared by k44–k47/k53/k55 [public: Lee
  * et al. 2022 §3.1]: 20-token stride-1 windows of a pre-split token
  * array column named `__t`, as SQL lambda strings for `expr(...)`.
  * One definition site — a change to span width, digest, or delimiter
  * cannot silently de-synchronize the family (each declared query's
  * ORACLE carries its own independent copy of the predicate by design;
  * THIS constant only unifies the Spark plan side). */
private[engine] object Spans {

  /** md5 digests of every W-token stride-1 window — the ONE definition
    * site for the family's shingling recipe at any width (k44's 20,
    * k59's blocking 5, k61's novelty 5; a digest/delimiter/off-by-one
    * fix lands everywhere at once — the r19 review found the expression
    * hand-rolled in four places).
    *
    * Digests are the 16-BYTE BINARY md5 (`unhex(md5(...))`), not the
    * 32-char hex string (r18 optimization round, guide §2.3 "narrower
    * types"): every consumer uses the digest only as an internal
    * grouping/window/join key — k47, the one query that OUTPUTS a
    * digest, builds its own hex md5 from [[TextsExpr]] — so halving the
    * column halves the digest shuffle bytes of the whole family
    * (windows in k44/k45/k46/k55/k56, the distinct+group in k53, the
    * join keys in k59/k61/k63). Semantics are untouched: hex↔binary is
    * a bijection, and BinaryType's unsigned lexicographic order equals
    * the hex string's order (nibble→hex-char is monotone), so equality,
    * grouping, min/max, and ordering all agree with the hex form. */
  def digestsExpr(w: Int): String =
    s"transform(sequence(1, size(__t) - ${w - 1}), " +
      s"st -> unhex(md5(concat_ws(' ', slice(__t, st, $w)))))"

  /** Binary md5 digests of every 20-token stride-1 span (digests cross
    * the shuffle, never span text). */
  val DigestsExpr: String = digestsExpr(20)

  /** The span TEXTS themselves — only for consumers that must recover
    * text map-side (k47's boilerplate report). */
  val TextsExpr: String =
    "transform(sequence(1, size(__t) - 19), " +
      "st -> concat_ws(' ', slice(__t, st, 20)))"
}
