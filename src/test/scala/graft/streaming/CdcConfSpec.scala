package graft.streaming

import scala.collection.immutable.SortedMap

import org.scalatest.funsuite.AnyFunSuite

/** Option parsing and offset serialization for the graft-cdc source:
  * the offset JSON must round-trip EXACTLY (Spark's offset equality is
  * json equality — a non-canonical serialization would re-run batches
  * forever), and malformed options must fail at load time, not
  * mid-stream. */
class CdcConfSpec extends AnyFunSuite {

  test("offset json round-trips canonically, keys sorted") {
    val o = GtidSetOffset(SortedMap(
      "dn2" -> "0a1b2c3d-5555-4444-3333-222211110000:1-4",
      "dn1" -> "",
      "dn10" -> ("0a1b2c3d-5555-4444-3333-222211110000:1-4," +
        "0a1b2c3d-5555-4444-3333-222211110001:7")))
    val parsed = GtidSetOffset.parse(o.json)
    assert(parsed == o)
    assert(parsed.json == o.json)
    // deterministic across construction orders (the equality Spark
    // uses to decide "no new data")
    val o2 = GtidSetOffset(SortedMap(o.sets.toSeq.reverse: _*))
    assert(o2.json == o.json)
  }

  test("options parse: endpoints, tables, startExecuted, flags") {
    val c = CdcConf.fromOptions(Map(
      "endpoints" -> "dn1@localhost:3306,dn2@10.0.0.7:3307",
      "user" -> "repl", "password" -> "pw",
      "tables" -> "db.t:k,seq,v;db.t2:a,b",
      "startExecuted" -> "dn1=0a1b2c3d-5555-4444-3333-222211110000:1-4;dn2=",
      "maxBytesPerPoll" -> "1048576",
      "tsoAuthority" -> "xid"))
    assert(c.endpoints == Seq(("dn1", "localhost", 3306),
      ("dn2", "10.0.0.7", 3307)))
    assert(c.tables == Map(("db", "t") -> Seq("k", "seq", "v"),
      ("db", "t2") -> Seq("a", "b")))
    assert(c.startExecuted("dn1").nonEmpty && c.startExecuted("dn2").isEmpty)
    assert(c.maxBytesPerPoll == 1048576L && c.tsoFromXid)
  }

  test("malformed options refuse at load time") {
    def base = Map("endpoints" -> "dn1@localhost:3306",
      "user" -> "u", "password" -> "p")
    intercept[RuntimeException] {
      CdcConf.fromOptions(base - "endpoints")
    }
    intercept[RuntimeException] {
      CdcConf.fromOptions(base + ("endpoints" -> "dn1-localhost-3306"))
    }
    intercept[IllegalArgumentException] {
      // a DN name carrying offset/option delimiters would corrupt the
      // offset JSON or the option string itself
      CdcConf.fromOptions(base + ("endpoints" -> "dn\"1@localhost:3306"))
    }
    intercept[RuntimeException] {
      CdcConf.fromOptions(base + ("tsoAuthority" -> "guess"))
    }
    // '/' or whitespace in a DN name would splice into the stage FILE
    // PATHS the name keys (inflight/$dn-$att.bin) — refuse at load time
    intercept[IllegalArgumentException] {
      CdcConf.fromOptions(base + ("endpoints" -> "a/b@localhost:3306"))
    }
    intercept[IllegalArgumentException] {
      CdcConf.fromOptions(base + ("endpoints" -> "a b@localhost:3306"))
    }
    intercept[IllegalArgumentException] {
      CdcConf.fromOptions(base + ("maxBytesPerPoll" -> "0"))
    }
  }

  test("drain cap defaults to a REAL bound, not unbounded") {
    val c = CdcConf.fromOptions(Map(
      "endpoints" -> "dn1@localhost:3306", "user" -> "u",
      "password" -> "p"))
    assert(c.maxBytesPerPoll == CdcConf.DefaultMaxBytesPerPoll)
    assert(c.maxBytesPerPoll == (128L << 20))
  }
}
