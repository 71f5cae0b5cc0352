package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

class JsonBSpec extends AnyFunSuite {

  private def roundtrip(json: String): String =
    JsonB.decodeToString(JsonB.encode(json))

  test("golden bytes: the documented small-object example {\"a\":2}") {
    // the widely published jsonb worked example: type 0x00 (small object),
    // count 1, size 0x0C, key entry (offset 0x0B, len 1), value entry
    // (int16 inlined, 2), key "a"
    val expected = Array(0x00, 0x01, 0x00, 0x0C, 0x00, 0x0B, 0x00, 0x01,
      0x00, 0x05, 0x02, 0x00, 0x61).map(_.toByte)
    assert(JsonB.encode("""{"a":2}""").sameElements(expected))
    assert(JsonB.decodeToString(expected) == """{"a":2}""")
  }

  test("scalars roundtrip: literals, int tiers, double, strings") {
    assert(roundtrip("null") == "null")
    assert(roundtrip("true") == "true")
    assert(roundtrip("false") == "false")
    assert(roundtrip("5") == "5")
    assert(roundtrip("-32768") == "-32768")           // int16 edge
    assert(roundtrip("32768") == "32768")             // spills to int32
    assert(roundtrip("2147483648") == "2147483648")   // spills to int64
    assert(roundtrip("-9007199254740993") == "-9007199254740993")
    assert(roundtrip("1.5") == "1.5")
    assert(roundtrip("\"hi\"") == "\"hi\"")
    assert(roundtrip("\"caf\\u00e9 \\u65e5\\u672c\"")
      == "\"café 日本\"")
  }

  test("containers roundtrip, object keys stored MySQL-sorted (length, bytes)") {
    assert(roundtrip("""[1,"two",null,[3,4],{"x":true}]""")
      == """[1,"two",null,[3,4],{"x":true}]""")
    // input order bb, a, c → stored a, c, bb (length first, then bytes)
    assert(roundtrip("""{"bb":1,"a":2,"c":3}""") == """{"a":2,"c":3,"bb":1}""")
    // nesting with every scalar kind
    val doc = """{"s":"x","n":7,"d":2.25,"b":false,"o":{"k":[1,2]},"z":null}"""
    val out = roundtrip(doc)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(mapper.readTree(out) == mapper.readTree(doc))
  }

  test("a long string drives the varlen length past one byte") {
    val s = "x" * 300 // 300 > 127 → two varlen bytes
    assert(roundtrip(s"""{"k":"$s"}""") == s"""{"k":"$s"}""")
  }

  test("a big container spills small → large format and still roundtrips") {
    // > 65535 payload bytes forces 4-byte counts/offsets
    val big = (1 to 3000).map(i => s""""k$i":"${"v" * 20}$i"""")
      .mkString("{", ",", "}")
    val bytes = JsonB.encode(big)
    assert((bytes(0) & 0xFF) == 0x01) // large object tag
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(mapper.readTree(JsonB.decodeToString(bytes)) == mapper.readTree(big))
    // and int32 values inline in the large format (no offset region entry)
    val withInts = (1 to 20000).map(i => s"${100000 + i}")
      .mkString("[", ",", "]")
    val arr = JsonB.encode(withInts)
    assert((arr(0) & 0xFF) == 0x03) // large array tag
    assert(JsonB.decodeToString(arr) == withInts)
  }
}
