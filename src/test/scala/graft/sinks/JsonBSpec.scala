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

  private def varlen(n: Int): Array[Byte] =
    if (n < 0x80) Array(n.toByte)
    else Array((n & 0x7F | 0x80).toByte, (n >> 7).toByte)

  private def opaque(fieldType: Int, data: Array[Byte]): Array[Byte] =
    Array(0x0F.toByte, fieldType.toByte) ++ varlen(data.length) ++ data

  test("opaque DECIMAL-in-JSON decodes to the number's text image") {
    // golden bytes: CAST(1234567890.1234 AS JSON) — opaque tag 0x0F,
    // field type 0xF6 (NEWDECIMAL), varlen(9), precision 14, scale 4,
    // then the documented DECIMAL(14,4) limb bytes
    val limbs = Array(0x81, 0x0D, 0xFB, 0x38, 0xD2, 0x04, 0xD2).map(_.toByte)
    val bytes = opaque(246, Array(14.toByte, 4.toByte) ++ limbs)
    assert(bytes.take(4).sameElements(
      Array(0x0F, 0xF6, 0x09, 0x0E).map(_.toByte)))
    assert(JsonB.decodeToString(bytes) == "1234567890.1234")
    // negative value through the same path (limbs from the wire codec)
    val neg = opaque(246, Array(14.toByte, 4.toByte) ++
      BinlogWire.encodeDecimal(BigDecimal("-98765.4321"), 14, 4))
    assert(JsonB.decodeToString(neg) == "-98765.4321")
  }

  test("opaque DATE/TIME/DATETIME-in-JSON decode to their text images") {
    def packedDatetime(y: Int, mo: Int, d: Int, h: Int, mi: Int, s: Int,
        micros: Long = 0L): Long = {
      val ymd = ((y * 13 + mo) << 5) | d
      val hms = (h << 12) | (mi << 6) | s
      ((ymd.toLong << 17) | hms) << 24 | micros
    }
    def le8(v: Long) = Array.tabulate(8)(i => ((v >> (8 * i)) & 0xFF).toByte)
    // DATE 2024-03-05 (field type 10)
    assert(JsonB.decodeToString(
      opaque(10, le8(packedDatetime(2024, 3, 5, 0, 0, 0)))) ==
      "\"2024-03-05\"")
    // DATETIME 2024-03-05 13:14:15.250000 (field type 12)
    assert(JsonB.decodeToString(
      opaque(12, le8(packedDatetime(2024, 3, 5, 13, 14, 15, 250000L)))) ==
      "\"2024-03-05 13:14:15.250000\"")
    // TIME 13:14:15 (field type 11): ((h<<12|m<<6|s)<<24) + micros
    val timePacked = ((13L << 12) | (14L << 6) | 15L) << 24
    assert(JsonB.decodeToString(opaque(11, le8(timePacked))) ==
      "\"13:14:15\"")
    // negative TIME: MySQL TIME is signed to -838:59:59 and the packed
    // image of a negative value is the NEGATION of the positive packing
    val negPacked = -((((1L << 12) | (2L << 6) | 3L) << 24) + 500000L)
    assert(JsonB.decodeToString(opaque(11, le8(negPacked))) ==
      "\"-01:02:03.500000\"")
    assert(JsonB.decodeToString(opaque(11, le8(0L))) == "\"00:00:00\"")
    // opaque values nest inside containers like any other slot: build a
    // small object whose value region is a hand-assembled opaque date
    val inner = opaque(10, le8(packedDatetime(2020, 1, 2, 0, 0, 0)))
    val obj = Array[Byte](0x00, 0x01, 0x00, (0x0B + inner.length).toByte,
      0x00, 0x0B, 0x00, 0x01, 0x00, inner.head, 0x0C, 0x00, 0x61) ++
      inner.tail
    assert(JsonB.decodeToString(obj) == """{"a":"2020-01-02"}""")
    // an opaque field type outside the temporal/decimal set stays loud
    intercept[RuntimeException] {
      JsonB.decodeToString(opaque(255, Array(1.toByte)))
    }
  }
}
