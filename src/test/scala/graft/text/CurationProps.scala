package graft.text

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import java.text.Normalizer

/** ScalaCheck laws for the curation operators' pure kernels: the
  * properties a consumer silently relies on, checked over generated
  * inputs rather than fixtures. */
object CurationProps extends Properties("curation") {

  // --- NfcNormalize: the expression's compute() against the JDK
  // reference, including the allocation fast paths ---

  private def nfc(s: String): String = {
    val e = graft.functions.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal(s))
    e.compute(org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
  }

  private val anyText: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar,
      Gen.oneOf('́', '̀', '̊', 'é', 'Å',
        'あ', '가', ' '))).map(_.mkString),
    Gen.listOf(Gen.choose(Char.MinValue, '퟿')).map(_.mkString))

  property("nfc == JDK Normalizer on arbitrary text") =
    forAll(anyText) { s =>
      nfc(s) == Normalizer.normalize(s, Normalizer.Form.NFC)
    }

  property("nfc is idempotent") =
    forAll(anyText) { s => nfc(nfc(s)) == nfc(s) }

  property("nfc preserves pure ASCII byte-for-byte") =
    forAll(Gen.asciiPrintableStr) { s => nfc(s) == s }

  // --- Packing key: the portable Lehmer shuffle key must stay inside
  // [0, 2^31-1) for ANY id so the DuckDB signed-% recomputation agrees ---

  property("shuffle key stays in [0, KeyMod) for any non-negative id") =
    forAll(Gen.chooseNum(0L, Long.MaxValue)) { id =>
      val k = ((id % Sampling.KeyMod) * 1103515245L + 12345L) %
        Sampling.KeyMod * 48271L % Sampling.KeyMod
      k >= 0L && k < Sampling.KeyMod
    }

  // --- Markup entity decode: one level per pass, ampersand last ---

  private def decode(s: String): String =
    Markup.EntitySteps.foldLeft(s) { case (acc, (f, t)) => acc.replace(f, t) }

  property("entity decode of encoded text is the original") =
    forAll(Gen.asciiPrintableStr) { s =>
      val encoded = s.replace("&", "&amp;").replace("<", "&lt;")
        .replace(">", "&gt;").replace("\"", "&quot;").replace("'", "&#39;")
      decode(encoded) == s
    }
}
