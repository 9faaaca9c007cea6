package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization for dedup keys — the normalize-before-
  * hash step every production corpus pipeline runs ahead of exact dedup
  * [public: CCNet §4.1 and Dolma's `uniseg`/NFD normalization both
  * lowercase + strip accents + NFC-normalize before hashing; the r16
  * verdict named this the one missing genuinely-public LLM-pipeline
  * operator]. Pipeline, applied in this exact order:
  *
  *   canon(s) = NFC( stripMarks( NFD( lowerROOT( NFC(s) ) ) ) )
  *
  * i.e. compose first (so decomposed input like "e"+U+0301 and
  * precomposed U+00E9 canonicalize identically), lowercase with
  * Locale.ROOT (no Turkish-locale surprises), decompose, drop all
  * Unicode Mark codepoints (Mn/Mc/Me — the accent strip), recompose.
  *
  * Oracle equivalence (DuckDB 1.0.0):
  * `nfc_normalize(strip_accents(lower(nfc_normalize(s))))` — verified by
  * an exhaustive sweep over ALL 281,360 assigned non-surrogate
  * codepoints (each embedded as "x□y"; JDK 17 vs DuckDB 1.0.0, r21
  * build log): 281,330 agree BIT-EXACTLY, including every Latin/Greek/
  * Cyrillic accent family, all NFC compositions, ß (both keep it), and
  * U+0130 İ — where the JDK's full lowercase mapping ("i"+U+0307) and
  * utf8proc's simple mapping ("i") DIFFER, but the mark-strip step
  * erases the difference, which is why lower() sits INSIDE the strip in
  * both pipelines. The 30 divergent codepoints are all Unicode-13.0
  * additions (U+0B55, U+0D81, U+1ABF, U+1AC0, U+A7C7–A7CA, U+A82C,
  * U+10EAB–10EAC, U+111CE–111CF, 15 Dives Akuru marks in U+11930–1193E,
  * U+16FE4 + 2 Khitan points) that JDK 17 (Unicode 13.0 tables)
  * classifies as marks/cased but DuckDB 1.0.0's utf8proc (Unicode
  * 12.1) predates — pure Unicode-version skew, pinned in
  * Round21Spec; the declared queries inject only sweep-verified
  * codepoints.
  *
  * One divergence class the per-codepoint sweep structurally CANNOT
  * see (each char was embedded as "x□y", a fixed context): Unicode
  * SpecialCasing's context-SENSITIVE rules. The JDK implements
  * Final_Sigma — Σ after a cased letter with no cased letter following
  * lowercases to ς ("ΑΣ" → "ας", "xΣ" → "xς") — while utf8proc applies
  * only the simple mapping Σ → σ everywhere ("ασ", "xσ"; verified live
  * against DuckDB 1.0.0 at build time). Final_Sigma is the only
  * locale-independent context-sensitive lowercase rule (the Turkish/
  * Lithuanian ones are locale-gated and Locale.ROOT avoids them), so
  * GREEK CAPITAL SIGMA in word-final position is the one excluded
  * codepoint-in-context; Round21Spec pins the JDK-side behavior and
  * the declared queries inject no Σ.
  *
  * Scale shape: map-only scalar (the cheapest class), codegen'd via
  * nullSafeCodeGen calling the static helper below — the same shape as
  * Spark's own Lower (whose body is also a library call), so it stays
  * inside WholeStageCodegen. The full-ASCII fast path skips all four
  * Normalizer passes (one vectorized byte scan + ASCII lowercase): on a
  * real 100 TB corpus the overwhelmingly-ASCII majority never allocates
  * a java.lang.String.
  */
final case class CanonicalizeTextExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_canon"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_canon requires a STRING argument, got ${t.simpleString(10)}")
    }

  override def nullSafeEval(s: Any): Any =
    CanonicalizeText.canon(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CanonicalizeText.canon($c);")

  override protected def withNewChildInternal(
      newChild: Expression): CanonicalizeTextExpression =
    copy(child = newChild)
}

/** The static worker [[CanonicalizeTextExpression]]'s generated code calls. */
object CanonicalizeText {

  /** Full-ASCII fast path (no String allocation, no Normalizer pass —
    * NFC and mark-strip are identities on ASCII); general path otherwise. */
  def canon(u: UTF8String): UTF8String =
    if (u.isFullAscii) u.toLowerCaseAscii
    else UTF8String.fromString(canonString(u.toString))

  /** The JDK-side pipeline; kept as a plain String function so specs can
    * pin codepoint behavior without a Spark session. */
  def canonString(s: String): String = {
    val composed = Normalizer.normalize(s, Normalizer.Form.NFC)
    val lowered = composed.toLowerCase(java.util.Locale.ROOT)
    val decomposed = Normalizer.normalize(lowered, Normalizer.Form.NFD)
    val b = new java.lang.StringBuilder(decomposed.length)
    decomposed.codePoints().forEach { cp =>
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK &&
          t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) b.appendCodePoint(cp)
    }
    Normalizer.normalize(b.toString, Normalizer.Form.NFC)
  }
}
