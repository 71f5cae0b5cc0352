package graft.model

import java.util.UUID

import org.scalatest.funsuite.AnyFunSuite

/** `GtidSet` — the content-addressed replication cursor: text and
  * binary spellings round-trip, interval algebra coalesces and
  * contains correctly. */
class GtidSetSpec extends AnyFunSuite {

  private val a = UUID.fromString("11111111-2222-3333-4444-555555555555")
  private val b = UUID.fromString("aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee")

  test("add coalesces adjacent GNOs into ranges; text is MySQL-shaped") {
    val s = Seq(1L, 2L, 3L, 5L, 7L, 8L)
      .foldLeft(GtidSet.Empty)((acc, g) => acc.add(a, g))
    assert(s.text == s"$a:1-3:5:7-8")
    assert(Seq(1L, 2L, 3L, 5L, 7L, 8L).forall(s.contains(a, _)))
    assert(!s.contains(a, 4L) && !s.contains(a, 6L) && !s.contains(a, 9L))
    assert(!s.contains(b, 1L))
    assert(s.add(a, 2L) == s) // idempotent
    // bridging gno merges three runs into one
    assert(s.add(a, 4L).text == s"$a:1-5:7-8")
  }

  test("parse UNIONS a SID repeated across entries (never last-wins)") {
    // a concatenated cursor ("set1,set2") must not forget intervals —
    // a forgotten executed txn would re-serve
    val s = GtidSet.parse(s"$a:1-5,$a:8,$b:2,$a:6")
    assert(s.text == s"$a:1-6:8,$b:2")
    assert(GtidSet.decode(s.encode) == s)
  }

  test("parse/text and encode/decode round-trip, multi-SID") {
    val txt = s"$a:1-5:9,$b:3"
    val s = GtidSet.parse(txt)
    assert(s.text == txt)
    assert(GtidSet.decode(s.encode) == s)
    assert(GtidSet.parse("") == GtidSet.Empty)
    assert(GtidSet.Empty.encode.length == 8) // just the zero count
    assert(GtidSet.decode(GtidSet.Empty.encode) == GtidSet.Empty)
  }

  test("union and subset are interval-exact") {
    val s1 = GtidSet.parse(s"$a:1-5")
    val s2 = GtidSet.parse(s"$a:4-9,$b:1-2")
    val u = s1.union(s2)
    assert(u.text == s"$a:1-9,$b:1-2")
    assert(s1.isSubsetOf(u) && s2.isSubsetOf(u))
    assert(!u.isSubsetOf(s1))
    assert(GtidSet.Empty.isSubsetOf(s1))
    assert(s1.isSubsetOf(GtidSet.parse(s"$a:1-5"))) // reflexive
    assert(!GtidSet.parse(s"$a:1-6").isSubsetOf(s1))
  }

  test("contains by gtid string; of() builder") {
    val s = GtidSet.of(s"$a:7", s"$a:8", s"$b:1")
    assert(s.contains(s"$a:7") && s.contains(s"$b:1"))
    assert(!s.contains(s"$b:2"))
    assert(s.text == s"$a:7-8,$b:1")
  }
}
