package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.engine.{Round21Ops, Tables}
import graft.functions.CanonicalizeText

/** Pins for the round-21 batch: the Unicode canonicalization family
  * (h53/k72 + the codegen'd Expression) and the Count-Min exact regime
  * (d66). The cross-engine sweep facts asserted here were measured at
  * build time (JDK 17 vs DuckDB 1.0.0, all 281,360 assigned
  * non-surrogate codepoints — see CanonicalizeTextExpression scaladoc);
  * the JDK side of each fact is pinned so a JDK/Unicode-table upgrade
  * that silently moves the canonical form fails HERE, not in the
  * driver's oracle diff. */
class Round21Spec extends SparkSpec {

  // ------------------------------------------------------ canonicalization

  test("canonString: composed and decomposed inputs canonicalize identically") {
    val composed = "café"          // é precomposed
    val decomposed = "café"       // e + COMBINING ACUTE
    assert(CanonicalizeText.canonString(composed) == "cafe")
    assert(CanonicalizeText.canonString(decomposed) == "cafe")
  }

  test("canonString: case folding, mark stripping, and ß/İ behavior") {
    assert(CanonicalizeText.canonString("STRASSE") == "strasse")
    // ß has no decomposition and no accent — it must survive untouched
    assert(CanonicalizeText.canonString("weiß") == "weiß")
    // İ (U+0130): JDK full lowercase is "i"+U+0307 while utf8proc's simple
    // lowercase is "i" — the mark-strip step erases the difference, which
    // is WHY both engines agree on the pipeline (sweep-verified); pin the
    // JDK-side result
    assert(CanonicalizeText.canonString("İstanbul") == "istanbul")
    // full accent family used by the declared queries (translate targets)
    assert(CanonicalizeText.canonString("ÀÉÎÖÜ") == "aeiou")
    assert(CanonicalizeText.canonString("àéîöü") == "aeiou")
  }

  test("canonString: the 4 BMP Unicode-13.0 divergence points strip JDK-side") {
    // These marks are Unicode 13.0 additions: JDK 17 strips them, DuckDB
    // 1.0.0's utf8proc (Unicode 12.1) passes them through — the ONLY
    // divergence class the build-time sweep found in the BMP. They are
    // pinned so the declared domain restriction ("inject only
    // sweep-verified codepoints") stays an explicit, tested boundary.
    for (cp <- Seq(0x0B55, 0x0D81, 0x1ABF, 0x1AC0)) {
      val s = "x" + new String(Character.toChars(cp)) + "y"
      assert(CanonicalizeText.canonString(s) == "xy",
        s"U+${cp.toHexString} should be stripped by the JDK pipeline")
    }
  }

  test("canonString: Final_Sigma is context-sensitive JDK-side (the excluded divergence class)") {
    // The per-codepoint sweep embedded every char as "x□y" — a fixed
    // context — so it structurally could not see SpecialCasing's
    // context-SENSITIVE rules. The JDK implements Final_Sigma (Σ after a
    // cased letter with no cased letter following → ς); utf8proc/DuckDB
    // applies the simple mapping Σ → σ EVERYWHERE (verified live against
    // DuckDB 1.0.0 at build time: "ΑΣ" → "ασ", "xΣ" → "xσ"). Word-final
    // Σ is therefore the one excluded codepoint-in-context of the
    // declared domain; pin the JDK side so an SDK change that alters the
    // rule fails here, not in an oracle diff.
    assert(CanonicalizeText.canonString("ΑΣ") == "ας")     // final → ς
    assert(CanonicalizeText.canonString("xΣ") == "xς")     // final after cased
    assert(CanonicalizeText.canonString("ΣΑ") == "σα")     // non-final → σ
    assert(CanonicalizeText.canonString("Σ") == "σ")       // no preceding cased
    assert(CanonicalizeText.canonString("ΟΔΥΣΣΕΥΣ") == "οδυσσευς")
  }

  test("canon: full-ASCII fast path equals the general pipeline") {
    for (s <- Seq("The Quick BROWN fox", "", "a", "MiXeD 123 !@#")) {
      val fast = graft.functions.CanonicalizeText.canon(UTF8String.fromString(s))
      assert(fast.toString == CanonicalizeText.canonString(s),
        s"fast path diverged on '$s'")
    }
  }

  test("graft_canon expression: codegen and eval agree, nulls propagate") {
    import spark.implicits._
    val df = Seq(Some("Café STRASSE"), Some("café strasse"), None)
      .toDF("s")
    val out = df.select(expr("graft_canon(s)").as("c")).collect()
    assert(out(0).getString(0) == "cafe strasse")
    assert(out(1).getString(0) == "cafe strasse")
    assert(out(2).isNullAt(0))
  }

  test("h53: canonical text is pure-ASCII lowercase after canonicalization") {
    val rows = Round21Ops.h53.fn(spark, sf001).collect()
    assert(rows.length == 500)
    // every injected accent/case/composition artifact must be gone —
    // except ß, which is the deliberate no-decomposition survivor
    rows.foreach { r =>
      val c = r.getString(1)
      assert(c.endsWith(" cafe strasse ß i"), s"unexpected tail: $c")
      assert(c.replace("ß", "").forall(ch => ch < 0x80), s"non-ASCII: $c")
      assert(!c.exists(_.isUpper), s"uppercase survived: $c")
    }
  }

  test("k72: canonical groups collapse raw-distinct spellings (the witness column)") {
    val rows = Round21Ops.k72.fn(spark, sf001).collect()
    assert(rows.length == 476) // 476 distinct 24-char prefixes over 500 docs
    val byDocs = rows.groupBy(_.getLong(1))
    assert(byDocs(2L).length == 22 && byDocs(3L).length == 1) // 22 pairs + 1 triple
    // multi-doc groups exist ONLY because canon collapsed different raw
    // spellings: at least one such group must carry n_raw_variants > 1
    // (residue classes differ inside a prefix-collision group)
    val collapsed = rows.filter(r => r.getLong(1) >= 2 && r.getLong(2) > 1)
    assert(collapsed.nonEmpty,
      "no group shows canon collapsing distinct raw spellings")
    // and every group's variants are bounded by its size
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1) && r.getLong(2) >= 1))
  }

  // ------------------------------------------------------------------ d66

  test("d66: sketch estimates equal exact GROUP BY counts at both spec SFs") {
    for (dir <- Seq(sf0001, sf001)) {
      // c_nationkey is INTEGER in the fixture — normalize keys to Long
      val est = Round21Ops.d66.fn(spark, dir).collect()
        .map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
      val exact = Tables.customer(spark, dir)
        .groupBy("c_nationkey").count().collect()
        .map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
      assert(est == exact, s"CMS exact regime broken at $dir")
      assert(est.size == 25)
    }
  }
}
