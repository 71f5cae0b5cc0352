package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.BinlogWire._

/** Field-codec and framing evidence: golden bytes hand-derived from the
  * public MySQL binary-log layouts, plus decode roundtrips. */
class BinlogWireSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xFF}%02X").mkString(" ")

  test("integer cells are little-endian two's complement") {
    assert(hex(encodeCell(Long4, 1)) == "01 00 00 00")
    assert(hex(encodeCell(Long4, -1)) == "FF FF FF FF")
    assert(hex(encodeCell(Long4, 0x12345678)) == "78 56 34 12")
    assert(hex(encodeCell(Short, 258)) == "02 01")
    assert(hex(encodeCell(Tiny, -2)) == "FE")
    assert(hex(encodeCell(Int24, 0x00ABCDEF)) == "EF CD AB")
    assert(hex(encodeCell(LongLong, 0x1122334455667788L)) ==
      "88 77 66 55 44 33 22 11")
  }

  test("float/double cells are IEEE little-endian") {
    assert(hex(encodeCell(Double8, 1.0)) == "00 00 00 00 00 00 F0 3F")
    assert(hex(encodeCell(Float4, 1.0f)) == "00 00 80 3F")
  }

  test("varchar length prefix: 1 byte under 256 max, else 2") {
    assert(hex(encodeCell(VarChar(255), "ab")) == "02 61 62")
    assert(hex(encodeCell(VarChar(1000), "ab")) == "02 00 61 62")
    // blob with explicit length-byte count
    assert(hex(encodeCell(Blob(3), Array[Byte](1, 2))) == "02 00 00 01 02")
  }

  test("charset golden bytes: latin1 CHAR, gbk VARCHAR, binary bridge") {
    // latin1 (cp1252): 'café' is 4 bytes, é = 0xE9 — NOT utf-8's C3 A9
    val latin1 = 8 // latin1_swedish_ci
    assert(hex(encodeCell(CharW(16, latin1), "café")) == "04 63 61 66 E9")
    assert(decodeCell(CharW(16, latin1),
      new ByteReader(Array(0x04, 0x63, 0x61, 0x66, 0xE9).map(_.toByte))) == "café")
    // the same value in the default utf8mb4 collation is 5 bytes
    assert(hex(encodeCell(CharW(16), "café")) == "05 63 61 66 C3 A9")
    // gbk: '中' = D6 D0 (the GBK code point, not utf-8's E4 B8 AD)
    assert(hex(encodeCell(VarChar(255, 28), "中")) == "02 D6 D0")
    // binary (63): arbitrary bytes survive the string image unchanged
    val raw = Array[Byte](0x00, 0x7F.toByte, 0x80.toByte, 0xFF.toByte)
    val img = decodeCell(VarChar(255, Charsets.Binary),
      new ByteReader(encodeCell(VarChar(255, Charsets.Binary), raw)))
    assert(encodeCell(VarChar(255, Charsets.Binary), img)
      .sameElements(encodeCell(VarChar(255, Charsets.Binary), raw)))
    // an unmapped collation id fails loudly — never silent mojibake
    intercept[RuntimeException] { encodeCell(VarChar(255, 9999), "x") }
  }

  test("SEQUENCE/GCN golden bytes: PolarDB-X XA-TSO carrier layouts") {
    // SequenceLogEvent.java:28-58 — 1-byte type + 8-byte LE number;
    // type ordinals INVALID=0 SNAPSHOT=1 COMMIT=2 HEART_BEAT=3
    val seq = sequenceEvent(0L, 1L, CommitSequence, 0x1122334455667788L)
    assert(seq.typeCode == SequenceEvent && SequenceEvent == 80)
    assert(hex(seq.body) == "02 88 77 66 55 44 33 22 11")
    assert(hex(sequenceEvent(0L, 1L, HeartbeatSequence, 1L).body) ==
      "03 01 00 00 00 00 00 00 00")
    // GcnLogEvent.java:29-53 — 1-byte flag + 8-byte LE gcn
    val gcn = gcnEvent(0L, 1L, 5L)
    assert(gcn.typeCode == GcnEvent && GcnEvent == 105)
    assert(hex(gcn.body) == "00 05 00 00 00 00 00 00 00")
  }

  test("heartbeat SEQUENCE events decode to immediate clock rows") {
    val hb = sequenceEvent(5L, 9L, HeartbeatSequence, 777L)
    val rows = decodeStream(Iterator(
      Frame(SequenceEvent, 5L, 9L, 0L, hb.body))).toSeq
    assert(rows == Seq(DecodedRow("", "", "HEARTBEAT", Map.empty, Map.empty,
      Some(777L), None, hdrTs = 5L, serverId = 9L)))
    // a heartbeat between txns does NOT leak its clock into the next
    // txn's tso (snapshot sequences stay invisible)
    val snap = sequenceEvent(6L, 9L, SnapshotSequence, 888L)
    val commit = sequenceEvent(7L, 9L, CommitSequence, 999L)
    val decoded = decodeStream(Iterator(
      Frame(SequenceEvent, 5L, 9L, 0L, hb.body),
      Frame(SequenceEvent, 6L, 9L, 0L, snap.body),
      Frame(SequenceEvent, 7L, 9L, 0L, commit.body),
      Frame(XidEvent, 8L, 9L, 0L, commitEvent(8L, 9L, 42L).body))).toSeq
    assert(decoded.map(r => (r.op, r.tso)) == Seq(("HEARTBEAT", Some(777L))))
  }

  test("temporal cells: DATE, TIME2, DATETIME2, TIMESTAMP2 packings") {
    // DATE: (y<<9 | m<<5 | d) little-endian 3 bytes
    // 2024-03-05 → 2024*512 + 3*32 + 5 = 1036389 = 0x0FD065
    assert(hex(encodeCell(Date3, java.time.LocalDate.of(2024, 3, 5))) ==
      "65 D0 0F")
    // TIME2 fsp=0: big-endian 0x800000 + (h<<12|m<<6|s)
    // 13:14:15 → 0x800000 + 13*4096 + 14*64 + 15 = 0x80D38F
    assert(hex(encodeCell(Time2(), java.time.LocalTime.of(13, 14, 15))) ==
      "80 D3 8F")
    // DATETIME2 fsp=0: 0x8000000000 + (ym<<22 | d<<17 | h<<12 | m<<6 | s)
    // 1970-01-01 00:00:00: ym = 1970*13+1 = 25611, day = 1
    val dt = encodeCell(DateTime2(),
      java.time.LocalDateTime.of(1970, 1, 1, 0, 0, 0))
    assert(hex(dt) == hex(
      Array.tabulate(5)(i => (((0x8000000000L + (25611L << 22) + (1L << 17)) >>
        (8 * (4 - i))) & 0xFF).toByte)))
    // TIMESTAMP2 fsp=0: big-endian epoch seconds
    assert(hex(encodeCell(Timestamp2(), 0x01020304L)) == "01 02 03 04")
  }

  test("NEWDECIMAL golden bytes: the documented DECIMAL(14,4) example") {
    // The canonical example from the MySQL internals documentation:
    // DECIMAL(14,4) value 1234567890.1234 → 81 0D FB 38 D2 04 D2
    assert(hex(encodeDecimal(BigDecimal("1234567890.1234"), 14, 4)) ==
      "81 0D FB 38 D2 04 D2")
    // negative: every byte complemented, MSB then flipped
    assert(hex(encodeDecimal(BigDecimal("-1234567890.1234"), 14, 4)) ==
      "7E F2 04 C7 2D FB 2D")
  }

  test("NEWDECIMAL roundtrips across precisions, scales and signs") {
    val cases = Seq(
      ("0", 1, 0), ("0.00", 5, 2), ("1", 1, 0), ("-1", 1, 0),
      ("99999", 5, 0), ("-99999", 5, 0),
      ("123456789", 9, 0), ("1234567890.1234", 14, 4),
      ("-0.000000001", 10, 9), ("123456789012345678901234567890", 30, 0),
      ("-9999999999999999999999999.99999", 30, 5),
      ("3.14159265358979", 16, 14))
    cases.foreach { case (s, p, sc) =>
      val v = BigDecimal(s).setScale(sc)
      val enc = encodeDecimal(v, p, sc)
      assert(decodeDecimal(enc, p, sc) == v, s"roundtrip $s DECIMAL($p,$sc)")
      // byte length matches the MySQL size formula
      val intd = p - sc
      val expLen = (intd / 9) * 4 + Seq(0, 1, 1, 2, 2, 3, 3, 4, 4, 4)(intd % 9) +
        (sc / 9) * 4 + Seq(0, 1, 1, 2, 2, 3, 3, 4, 4, 4)(sc % 9)
      assert(enc.length == expLen, s"length $s DECIMAL($p,$sc)")
    }
  }

  test("null bitmap sets bit i of byte i/8") {
    assert(hex(nullBitmap(Seq(true, false, false, true))) == "09")
    assert(hex(nullBitmap(Seq.fill(8)(false) ++ Seq(true))) == "00 01")
  }

  test("row image: bitmap + cells, null cells contribute no bytes") {
    val specs = Seq(ColSpec("id", Long4), ColSpec("v", VarChar(10)),
      ColSpec("n", Tiny))
    val img = rowImage(specs, Seq(Some(7), None, Some(1)))
    // bitmap 0x02 (col 1 null), then 07 00 00 00, then 01
    assert(hex(img) == "02 07 00 00 00 01")
  }

  test("oversized varchar values fail loudly instead of wrapping the length") {
    intercept[IllegalArgumentException] {
      encodeCell(VarChar(100), "x" * 300) // 1-byte prefix, 300-byte value
    }
    intercept[IllegalArgumentException] {
      encodeCell(VarChar(65535), "x" * 70000) // 2-byte prefix overflow
    }
    // within bounds still fine
    assert(encodeCell(VarChar(65535), "x" * 300).length == 302)
  }

  test("mark event leading byte is the capped query length") {
    val short = markEvent(0L, 1, "CTS::42")
    assert((short.body(0) & 0xFF) == 7)
    val long = markEvent(0L, 1, "x" * 300)
    assert((long.body(0) & 0xFF) == 255) // capped; full text to event end
    assert(long.body.length == 301)
  }

  test("a transaction without its own mark decodes with tso=None") {
    val specs = Seq(ColSpec("id", LongLong))
    def row(v: Long) = rowsEvent(0L, 1, WriteRowsEventV2, 9, specs,
      Seq(rowImage(specs, Seq(Some(v)))))
    val file = assembleFile(Seq(
      formatDescription(0L, 1),
      tableMap(0L, 1, 9, "app", "t", specs),
      markEvent(0L, 1, "CTS::100"), beginEvent(0L, 1), row(1),
      commitEvent(0L, 1, 100L),
      // second txn arrives WITHOUT a CTS mark (plain MySQL logs have none)
      beginEvent(0L, 1), row(2), commitEvent(0L, 1, 200L)))
    val rows = decodeFile(file, Map(("app", "t") -> Seq("id")))
    assert(rows.map(_.tso) == Seq(Some(100L), None))
    assert(rows.map(_.xid) == Seq(Some(100L), Some(200L)))
  }

  test("lenEnc thresholds") {
    assert(hex(lenEnc(250)) == "FA")
    assert(hex(lenEnc(251)) == "FC FB 00")
    assert(hex(lenEnc(0x10000)) == "FD 00 00 01")
  }

  test("file assembly: magic, chained positions, parse-back") {
    val specs = Seq(ColSpec("id", Long4), ColSpec("v", VarChar(16)))
    val fde = formatDescription(1000L, serverId = 7)
    val tm = tableMap(1000L, 7, tableId = 42, "app", "t", specs)
    val rows = rowsEvent(1000L, 7, WriteRowsEventV2, 42, specs, Seq(
      rowImage(specs, Seq(Some(1), Some("a"))),
      rowImage(specs, Seq(Some(2), None))))
    val file = assembleFile(Seq(fde, tm, rows))
    val frames = parseFile(file)
    assert(frames.map(_.typeCode) ==
      Seq(FormatDescriptionEvent, TableMapEvent, WriteRowsEventV2))
    // next_position chain: cumulative event lengths from the magic
    val lens = Seq(fde, tm, rows).map(_.length)
    assert(frames.map(_.nextPos) == lens.scanLeft(4L)(_ + _).tail)
    // the table map body carries both column type codes
    val tmBody = frames(1).body
    assert(tmBody.containsSlice(Array(Long4.typeCode.toByte,
      VarChar(16).typeCode.toByte)))
    // total size is exactly magic + sum of events
    assert(file.length == 4 + lens.sum)
  }

  test("fractional temporals: fsp packing sizes and byte layout") {
    // DATETIME2(3): 5 base + 2 frac bytes; .123 stored as 4-digit 1230
    val dt3 = encodeCell(DateTime2(3),
      java.time.LocalDateTime.of(2024, 1, 2, 3, 4, 5, 123000000))
    assert(dt3.length == 7)
    assert(((dt3(5) & 0xFF) << 8 | (dt3(6) & 0xFF)) == 1230)
    // TIME2(6): 3 base + 3 frac bytes carrying full microseconds
    val t6 = encodeCell(Time2(6),
      java.time.LocalTime.of(1, 2, 3, 456789000))
    assert(t6.length == 6)
    assert(((t6(3) & 0xFF) << 16 | (t6(4) & 0xFF) << 8 | (t6(5) & 0xFF)) ==
      456789)
    // TIMESTAMP2(2): 4 base + 1 frac byte (centiseconds)
    val ts2 = encodeCell(Timestamp2(2),
      java.time.Instant.ofEpochSecond(1000L, 250000000L))
    assert(ts2.length == 5 && (ts2(4) & 0xFF) == 25)
  }

  test("fsp survives the table-map metadata roundtrip") {
    val specs = Seq(ColSpec("id", LongLong), ColSpec("dt", DateTime2(3)),
      ColSpec("t", Time2(6)))
    val img = rowImage(specs, Seq(Some(5L),
      Some(java.time.LocalDateTime.of(2024, 1, 2, 3, 4, 5, 123000000)),
      Some(java.time.LocalTime.of(1, 2, 3, 456789000))))
    val file = assembleFile(Seq(
      formatDescription(0L, 1),
      tableMap(0L, 1, 9, "app", "t", specs),
      rowsEvent(0L, 1, WriteRowsEventV2, 9, specs, Seq(img))))
    val rows = decodeFile(file, Map(("app", "t") -> specs.map(_.name)))
    assert(rows.head.after("dt") == "2024-01-02 03:04:05.123")
    assert(rows.head.after("t") == "01:02:03.456789")
    assert(rows.head.after("id") == "5")
  }

  test("CRC32 checksums: verified trailers, corruption detected") {
    val specs = Seq(ColSpec("id", LongLong))
    val events = Seq(
      formatDescription(1000L, 7, checksummed = true),
      tableMap(1000L, 7, 1, "app", "t", specs),
      rowsEvent(1000L, 7, WriteRowsEventV2, 1, specs,
        Seq(rowImage(specs, Seq(Some(42L))))))
    val file = assembleFile(events, checksummed = true)
    // four extra bytes per event vs the unchecksummed assembly
    val plain = assembleFile(Seq(
      formatDescription(1000L, 7),
      tableMap(1000L, 7, 1, "app", "t", specs),
      rowsEvent(1000L, 7, WriteRowsEventV2, 1, specs,
        Seq(rowImage(specs, Seq(Some(42L)))))))
    assert(file.length == plain.length + 3 * 4)
    // parse verifies + strips the trailers: same frame bodies either way
    val fcs = parseFile(file)
    val fpl = parseFile(plain)
    assert(fcs.map(_.typeCode) == fpl.map(_.typeCode))
    assert(fcs(1).body.sameElements(fpl(1).body)) // table map body identical
    assert(fcs(2).body.sameElements(fpl(2).body))
    // flip one payload byte → CRC verification must fail loudly
    val corrupted = file.clone()
    corrupted(file.length - 7) = (corrupted(file.length - 7) ^ 0x01).toByte
    intercept[IllegalArgumentException] { parseFile(corrupted) }
  }

  test("parseStream: incremental decode matches parseFile; truncation is loud") {
    val specs = Seq(ColSpec("id", LongLong))
    val file = assembleFile(Seq(
      formatDescription(1000L, 7, checksummed = true),
      tableMap(1000L, 7, 1, "app", "t", specs),
      rowsEvent(1000L, 7, WriteRowsEventV2, 1, specs,
        Seq(rowImage(specs, Seq(Some(42L)))))), checksummed = true)
    // the streaming parser sees exactly what the whole-buffer parser does
    val streamed = parseStream(new java.io.ByteArrayInputStream(file)).toSeq
    val buffered = parseFile(file)
    assert(streamed.map(_.typeCode) == buffered.map(_.typeCode))
    streamed.zip(buffered).foreach { case (s, b) =>
      assert(s.typeCode == b.typeCode && s.timestamp == b.timestamp &&
        s.serverId == b.serverId && s.nextPos == b.nextPos &&
        s.body.sameElements(b.body))
    }
    // a file cut mid-event (a crashed writer's tail) fails loudly — a
    // silent partial decode would drop the tail of a committed batch
    intercept[java.io.EOFException] {
      parseStream(new java.io.ByteArrayInputStream(
        file.dropRight(3))).toSeq
    }
  }

  test("BIT/ENUM/SET/CHAR/GEOMETRY/JSON cells: layout and meta") {
    // BIT(10) → 2 bytes big-endian; meta (bits%8, bits/8)
    assert(encodeCell(Bit(10), 0x2ABL).sameElements(Array(0x02, 0xAB).map(_.toByte)))
    assert(Bit(10).meta.sameElements(Array(2.toByte, 1.toByte)))
    // ENUM: 1-based ordinal in packLen bytes; member string accepted
    val e = EnumW.of("red", "green", "blue")
    assert(encodeCell(e, "green").sameElements(Array(2.toByte)))
    assert(encodeCell(e, 3L).sameElements(Array(3.toByte)))
    intercept[IllegalArgumentException] { encodeCell(e, "mauve") }
    // SET: member bitmask LE; comma list accepted
    val s = SetW.of("a", "b", "c", "d")
    assert(encodeCell(s, "a,c").sameElements(Array(5.toByte)))
    assert(encodeCell(s, 9L).sameElements(Array(9.toByte)))
    // CHAR: length-prefixed like varchar; meta folds length's high bits
    assert(encodeCell(CharW(20), "hi").sameElements(
      Array(2.toByte, 'h'.toByte, 'i'.toByte)))
    assert(CharW(772).meta.sameElements( // 772 = 0x304
      Array((0xFE ^ 0x30).toByte, 0x04.toByte)))
    // GEOMETRY: 4-byte LE length + opaque payload
    assert(encodeCell(Geometry, Array[Byte](1, 2, 3)).sameElements(
      Array(3, 0, 0, 0, 1, 2, 3).map(_.toByte)))
    // JSON: 4-byte LE length + jsonb document
    val j = encodeCell(Json, """{"a":2}""")
    assert(j.take(4).sameElements(Array(13, 0, 0, 0).map(_.toByte)))
    assert((j(4) & 0xFF) == 0x00) // small-object tag
  }

  test("legacy temporal cells: packed-decimal DATETIME, HHMMSS TIME, epoch TIMESTAMP") {
    val dt = java.time.LocalDateTime.of(2024, 3, 7, 9, 5, 2)
    // YYYYMMDDHHMMSS as a decimal number, LE uint64
    val enc = encodeCell(DatetimeLegacy, dt)
    var v = 0L
    (0 until 8).foreach(i => v |= (enc(i) & 0xFFL) << (8 * i))
    assert(v == 20240307090502L)
    val t = encodeCell(TimeLegacy, java.time.LocalTime.of(23, 59, 58))
    assert((t(0) & 0xFF | (t(1) & 0xFF) << 8 | (t(2) & 0xFF) << 16) == 235958)
    val ts = encodeCell(TimestampLegacy, java.time.Instant.ofEpochSecond(1700000000L))
    var tv = 0L
    (0 until 4).foreach(i => tv |= (ts(i) & 0xFFL) << (8 * i))
    assert(tv == 1700000000L)
  }

  test("new wire types survive the full file framing roundtrip") {
    val specs = Seq(
      ColSpec("b", Bit(12)), ColSpec("e", EnumW.of("x", "y", "z")),
      ColSpec("s", SetW.of("p", "q", "r")), ColSpec("c", CharW(16)),
      ColSpec("g", Geometry), ColSpec("j", Json),
      ColSpec("dl", DatetimeLegacy), ColSpec("tl", TimeLegacy),
      ColSpec("sl", TimestampLegacy))
    val row = rowImage(specs, Seq(
      Some(0x5AL), Some("y"), Some("p,r"), Some("hello"),
      Some(Array[Byte](0, 1, 2, 3)), Some("""{"k":[1,"two"]}"""),
      Some(java.time.LocalDateTime.of(2024, 1, 2, 3, 4, 5)),
      Some(java.time.LocalTime.of(6, 7, 8)),
      Some(java.time.Instant.ofEpochSecond(1700000123L))))
    val file = assembleFile(Seq(
      formatDescription(1000L, 7, checksummed = true),
      tableMap(1000L, 7, 1, "app", "t", specs),
      rowsEvent(1000L, 7, WriteRowsEventV2, 1, specs, Seq(row))),
      checksummed = true)
    val decoded = decodeFile(file,
      Map(("app", "t") -> specs.map(_.name)))
    assert(decoded.length == 1)
    val img = decoded.head.after
    assert(img("b") == 0x5A.toString)
    assert(img("e") == "2")            // ordinal of "y" — names live in the schema
    assert(img("s") == "5")            // bitmask of {p, r}
    assert(img("c") == "hello")
    assert(img("g") == "00010203")
    assert(img("j") == """{"k":[1,"two"]}""")
    assert(img("dl") == "2024-01-02 03:04:05")
    assert(img("tl") == "06:07:08")
    assert(img("sl") == "1700000123")
  }

  test("GTID events: SID+GNO roundtrip, txn-scoped, cleared at commit") {
    val sid = java.util.UUID.fromString("3E11FA47-71CA-11E1-9E33-C80AA9429562")
    val specs = Seq(ColSpec("id", LongLong))
    def txn(tso: Long, v: Long) = Seq(
      gtidEvent(1000L, 7, sid, gno = tso),
      markEvent(1000L, 7, s"CTS::$tso"),
      beginEvent(1000L, 7),
      rowsEvent(1000L, 7, WriteRowsEventV2, 1, specs,
        Seq(rowImage(specs, Seq(Some(v))))),
      commitEvent(1000L, 7, xid = tso))
    val file = assembleFile(
      Seq(formatDescription(1000L, 7),
        previousGtidsEvent(1000L, 7, Seq(sid -> Seq((1L, 5L)))),
        tableMap(1000L, 7, 1, "app", "t", specs)) ++
        txn(5L, 50L) ++ txn(6L, 60L))
    val rows = decodeFile(file, Map(("app", "t") -> Seq("id")))
    assert(rows.length == 2)
    // each txn carries ITS OWN gtid — sid:gno with gno = tso
    assert(rows.map(_.gtid) == Seq(
      Some(s"${sid.toString.toLowerCase}:5"),
      Some(s"${sid.toString.toLowerCase}:6")))
    assert(rows.map(_.tso) == Seq(Some(5L), Some(6L)))
    // PREVIOUS_GTIDS parses structurally (no rows out of it)
    val frames = parseFile(file)
    assert(frames.count(_.typeCode == PreviousGtidsEvent) == 1)
    assert(frames.count(_.typeCode == GtidEvent) == 2)
  }

  test("update rows event carries two present bitmaps; write carries one") {
    val specs = Seq(ColSpec("id", Long4))
    val w = rowsEvent(0L, 1, WriteRowsEventV2, 1, specs, Seq.empty)
    val u = rowsEvent(0L, 1, UpdateRowsEventV2, 1, specs, Seq.empty)
    assert(u.body.length == w.body.length + 1)
  }
}
