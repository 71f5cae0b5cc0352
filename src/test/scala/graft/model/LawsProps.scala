package graft.model

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{HashedShingles, MinHashSignature}
import graft.operators.Filters

/** Pure-Scala property laws (ScalaCheck framework, no Spark session):
  * codec roundtrips, ordering homomorphism, wildcard compilation, and the
  * native sketch kernels against naive specifications. */
object LawsProps extends Properties("graft-laws") {

  private val tsoGen: Gen[VirtualTso] = for {
    p <- Gen.chooseNum(0L, 999999999999999999L)
    t <- Gen.chooseNum(0L, 999999999999999999L)
    q <- Gen.chooseNum(0L, 9999999999L)
  } yield VirtualTso(p, t, q)

  property("tso encode/decode roundtrip") = forAll(tsoGen) { tso =>
    VirtualTso.decode(tso.encoded) == tso
  }

  property("tso encoded order == component order") =
    forAll(tsoGen, tsoGen) { (a, b) =>
      (a.encoded.compareTo(b.encoded).sign == a.compare(b).sign)
    }

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val textGen = Gen.listOf(wordGen).map(_.mkString(" "))

  /** Naive shingle spec: distinct word n-grams as strings. */
  private def naiveShingles(text: String, n: Int): Seq[Seq[String]] = {
    val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    if (words.length < n) Seq.empty
    else words.sliding(n).toSeq.distinct
  }

  property("HashedShingles matches the naive spec's cardinality") =
    forAll(textGen, Gen.choose(1, 4)) { (text, n) =>
      val native = HashedShingles(null, n)
        .compute(UTF8String.fromString(text)).toLongArray()
      native.length == naiveShingles(text, n).size &&
        native.toSet.size == native.length // kernel dedupes exactly
    }

  property("HashedShingles jaccard == naive string jaccard") =
    forAll(textGen, textGen, Gen.choose(1, 3)) { (a, b, n) =>
      val ha = HashedShingles(null, n).compute(UTF8String.fromString(a))
        .toLongArray().toSet
      val hb = HashedShingles(null, n).compute(UTF8String.fromString(b))
        .toLongArray().toSet
      val sa = naiveShingles(a, n).toSet
      val sb = naiveShingles(b, n).toSet
      val nativeJ =
        if ((ha ++ hb).isEmpty) 0.0
        else ha.intersect(hb).size.toDouble / (ha ++ hb).size
      val naiveJ =
        if ((sa ++ sb).isEmpty) 0.0
        else sa.intersect(sb).size.toDouble / (sa ++ sb).size
      nativeJ == naiveJ
    }

  property("minhash parameters: odd multipliers, all slots distinct") =
    forAll(Gen.choose(1, 128)) { k =>
      val m = MinHashSignature.multipliers(k)
      m.forall(x => (x & 1L) == 1L) && m.distinct.length == k
    }

  private val patGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      6 -> Gen.alphaLowerChar.map(_.toString),
      1 -> Gen.const("%"), 1 -> Gen.const("_"), 1 -> Gen.const(".")))
      .map(_.mkString)

  /** Naive MySQL wildcard matcher. */
  private def naiveMatch(pat: String, s: String): Boolean = {
    def go(pi: Int, si: Int): Boolean =
      if (pi == pat.length) si == s.length
      else pat(pi) match {
        case '%' => (si to s.length).exists(go(pi + 1, _))
        case '_' => si < s.length && go(pi + 1, si + 1)
        case c => si < s.length &&
          Character.toLowerCase(s(si)) == Character.toLowerCase(c) &&
          go(pi + 1, si + 1)
      }
    go(0, 0)
  }

  property("wildcardToRegex == naive MySQL wildcard semantics") =
    forAll(patGen, textGen) { (pat, s0) =>
      val s = s0.take(24) // keep the naive backtracking matcher fast
      val p = pat.take(12)
      s.matches(Filters.wildcardToRegex(p)) == naiveMatch(p, s)
    }
}
