package graft.model

import org.scalatest.funsuite.AnyFunSuite

class TsoSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)
  private def randTso(): VirtualTso = VirtualTso(
    rnd.nextLong(1000000000000000000L),
    rnd.nextLong(1000000000000000000L),
    rnd.nextLong(10000000000L))

  test("encode/decode roundtrip (property)") {
    (1 to 500).foreach { _ =>
      val tso = randTso()
      assert(VirtualTso.decode(tso.encoded) == tso)
    }
  }

  test("lexicographic order of encoded matches component order (property)") {
    (1 to 500).foreach { _ =>
      val (a, b) = (randTso(), randTso())
      assert((a.encoded < b.encoded) == (a.compare(b) < 0))
      assert((a.encoded == b.encoded) == (a.compare(b) == 0))
    }
  }

  test("physical time extraction and length") {
    val tso = VirtualTso(1234567L, 42L, 7L)
    assert(VirtualTso.physicalTimeMillis(tso.encoded) == 1234567L)
    assert(tso.encoded.length == VirtualTso.EncodedLength)
  }
}
