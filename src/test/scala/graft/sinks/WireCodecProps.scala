package graft.sinks

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.sinks.BinlogWire._

/** Field-codec fuzz: decode(encode(v)) must reproduce the canonical
  * string image for RANDOM values across every packed representation —
  * sign extension on the 1/2/3/4-byte ints, the 13-month DATETIME2
  * year-month packing, fractional-second truncation widths, NEWDECIMAL's
  * 9-digit/4-byte limb packing with negative-value bit inversion, and
  * the 1-vs-2-byte string length prefixes. Complements BinlogWireSpec's
  * golden fixtures (exact byte layouts) with coverage of the value
  * space. Pure Scala — no Spark session. */
object WireCodecProps extends Properties("wire-codecs") {

  private def roundtrip(w: Wire, v: Any): String =
    decodeCell(w, new ByteReader(encodeCell(w, v)))

  property("tiny sign-extends") = forAll(Gen.chooseNum(-128L, 127L)) { v =>
    roundtrip(Tiny, v) == v.toString
  }
  property("short sign-extends") = forAll(Gen.chooseNum(-32768L, 32767L)) { v =>
    roundtrip(Short, v) == v.toString
  }
  property("int24 sign-extends") =
    forAll(Gen.chooseNum(-(1L << 23), (1L << 23) - 1)) { v =>
      roundtrip(Int24, v) == v.toString
    }
  property("long4 sign-extends") =
    forAll(Gen.chooseNum(Int.MinValue.toLong, Int.MaxValue.toLong)) { v =>
      roundtrip(Long4, v) == v.toString
    }
  property("longlong is exact") = forAll { (v: Long) =>
    roundtrip(LongLong, v) == v.toString
  }
  property("year offsets by 1900") = forAll(Gen.chooseNum(1901L, 2155L)) { v =>
    roundtrip(Year, v) == v.toString
  }
  property("float4 bits survive") = forAll { (v: Float) =>
    !java.lang.Float.isNaN(v) ==> (roundtrip(Float4, v) == v.toString)
  }
  property("double8 bits survive") = forAll { (v: Double) =>
    !java.lang.Double.isNaN(v) ==> (roundtrip(Double8, v) == v.toString)
  }

  private val dateGen = for {
    y <- Gen.chooseNum(1000, 9999)
    m <- Gen.chooseNum(1, 12)
    d <- Gen.chooseNum(1, java.time.YearMonth.of(y, m).lengthOfMonth())
  } yield java.time.LocalDate.of(y, m, d)

  property("date3 packs y/m/d") = forAll(dateGen) { d =>
    roundtrip(Date3, d) == f"${d.getYear}%04d-${d.getMonthValue}%02d-${d.getDayOfMonth}%02d"
  }

  private def fracGen(fsp: Int): Gen[Long] = // micros truncated to fsp digits
    Gen.chooseNum(0L, math.pow(10, fsp).toLong - 1)
      .map(_ * math.pow(10, 6 - fsp).toLong)
  private def fracStr(micros: Long, fsp: Int): String =
    if (fsp == 0) ""
    else "." + ("%0" + fsp + "d").format(micros / math.pow(10, 6 - fsp).toLong)

  private val timeGen = for {
    fsp <- Gen.oneOf(0, 1, 3, 6)
    h <- Gen.chooseNum(0, 23); m <- Gen.chooseNum(0, 59)
    s <- Gen.chooseNum(0, 59); micros <- fracGen(fsp)
  } yield (fsp, java.time.LocalTime.of(h, m, s, micros.toInt * 1000))

  property("time2 packs hms + fraction") = forAll(timeGen) { case (fsp, t) =>
    roundtrip(Time2(fsp), t) ==
      f"${t.getHour}%02d:${t.getMinute}%02d:${t.getSecond}%02d" +
        fracStr(t.getNano / 1000L, fsp)
  }

  private val datetimeGen = for {
    fsp <- Gen.oneOf(0, 2, 6)
    d <- dateGen
    h <- Gen.chooseNum(0, 23); mi <- Gen.chooseNum(0, 59)
    s <- Gen.chooseNum(0, 59); micros <- fracGen(fsp)
  } yield (fsp, java.time.LocalDateTime.of(d,
    java.time.LocalTime.of(h, mi, s, micros.toInt * 1000)))

  property("datetime2 13-month packing") = forAll(datetimeGen) { case (fsp, dt) =>
    roundtrip(DateTime2(fsp), dt) ==
      f"${dt.getYear}%04d-${dt.getMonthValue}%02d-${dt.getDayOfMonth}%02d " +
        f"${dt.getHour}%02d:${dt.getMinute}%02d:${dt.getSecond}%02d" +
        fracStr(dt.getNano / 1000L, fsp)
  }

  private val asciiGen = Gen.chooseNum(0, 60)
    .flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))

  property("varchar 1-byte prefix") = forAll(asciiGen) { s =>
    roundtrip(VarChar(255), s) == s
  }
  property("varchar 2-byte prefix") = forAll(asciiGen) { s =>
    roundtrip(VarChar(300), s) == s
  }
  property("char metadata packing") = forAll(asciiGen) { s =>
    roundtrip(CharW(64), s) == s
  }
  property("blob length prefixes") =
    forAll(asciiGen, Gen.oneOf(1, 2, 3, 4)) { (s, lenBytes) =>
      roundtrip(Blob(lenBytes), s) == s
    }
  property("utf8 multibyte survives varchar") =
    forAll(Gen.chooseNum(0, 20).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf('å', 'ß', '語', 'é', 'a', '9')))) { s =>
      roundtrip(VarChar(255), s) == s
    }

  private val decimalGen = for {
    (p, s) <- Gen.oneOf((12, 2), (18, 0), (9, 4), (20, 6), (10, 10))
    unscaled <- Gen.chooseNum(-(math.pow(10, math.min(p, 18)).toLong - 1),
      math.pow(10, math.min(p, 18)).toLong - 1)
  } yield (p, s, unscaled)

  property("newdecimal limb packing, both signs") =
    forAll(decimalGen) { case (p, s, unscaled) =>
      val v = new java.math.BigDecimal(
        java.math.BigInteger.valueOf(unscaled), s)
      roundtrip(NewDecimal(p, s), v) == v.toPlainString
    }

  property("bit big-endian packing") =
    forAll(Gen.oneOf(1, 7, 10, 33, 63), Gen.chooseNum(0L, Long.MaxValue)) {
      (bits, raw) =>
        val v = raw % (1L << bits)
        roundtrip(Bit(bits), v) == v.toString
    }

  property("timestamp2 epoch + fraction") =
    forAll(Gen.chooseNum(1L, 0xFFFFFFFFL), Gen.oneOf(0, 3, 6)) { (epoch, fsp) =>
      val i = java.time.Instant.ofEpochSecond(epoch, 0)
      roundtrip(Timestamp2(fsp), i) == epoch.toString + fracStr(0L, fsp)
    }

  // ---- charset-aware string codecs (non-UTF8 collations) ----

  private val latin1Str = Gen.chooseNum(0, 60).flatMap(n =>
    Gen.stringOfN(n, Gen.oneOf("aZ9 àéîõüÿñÑçÇß€—".toSeq)))
  private val gbkStr = Gen.chooseNum(0, 40).flatMap(n =>
    Gen.stringOfN(n, Gen.oneOf("aZ9中文数据库引擎变更日志".toSeq)))

  property("latin1 collation roundtrips cp1252 text at 1 byte/char") =
    forAll(latin1Str, Gen.oneOf(5, 8, 47, 48)) { (s, coll) =>
      roundtrip(VarChar(255, coll), s) == s &&
        roundtrip(CharW(300, coll), s) == s &&
        roundtrip(Blob(2, coll), s) == s &&
        // cp1252 is single-byte: the wire image is exactly 1 byte/char
        encodeCell(VarChar(255, coll), s).length == 1 + s.length
    }

  property("gbk collation roundtrips CJK text at 2 bytes/han") =
    forAll(gbkStr, Gen.oneOf(28, 87)) { (s, coll) =>
      val ascii = s.count(_ < 128)
      roundtrip(VarChar(255, coll), s) == s &&
        roundtrip(CharW(300, coll), s) == s &&
        encodeCell(VarChar(255, coll), s).length ==
          1 + ascii + 2 * (s.length - ascii)
    }

  property("binary collation preserves exact bytes through the string image") =
    forAll(Gen.listOfN(24, Gen.chooseNum(-128, 127).map(_.toByte))) { l =>
      val bytes = l.toArray
      val w = VarChar(255, Charsets.Binary)
      val image = roundtrip(w, bytes)
      encodeCell(w, image).sameElements(encodeCell(w, bytes))
    }

  // collation-id map spot checks (reference CharsetConversion.java):
  // 52 is cp1251_general_cs (NOT cp1257), real cp1257 ids are 29/58/59,
  // real latin2 ids are 2/9/21/27/77, and armscii8 (32/64) has no JVM
  // charset so it must fail loudly rather than silently decode as latin2.
  property("cyrillic/baltic/latin2 collation ids map to their charsets") =
    forAll(Gen.oneOf(51, 14, 23, 50, 52), Gen.oneOf(29, 58, 59),
        Gen.oneOf(2, 9, 21, 27, 77)) { (cyr, balt, lat2) =>
      roundtrip(VarChar(255, cyr), "Привет") == "Привет" &&
        roundtrip(VarChar(255, balt), "ąžuolas") == "ąžuolas" &&
        roundtrip(VarChar(255, lat2), "příliš žluťoučký") ==
          "příliš žluťoučký" &&
        encodeCell(VarChar(255, cyr), "Привет").length == 1 + 6
    }

  property("armscii8 collation ids (32/64) fail loudly — unmapped") =
    forAll(Gen.oneOf(32, 64)) { coll =>
      scala.util.Try(encodeCell(VarChar(255, coll), "x")).isFailure
    }

  property("unrepresentable value fails loudly instead of mojibake") =
    forAll(Gen.oneOf(5, 8, 28)) { coll =>
      // a char outside the collation's repertoire: han is absent from
      // latin1; dotless i (U+0131) is absent from gbk
      val bad = if (coll == 28) "ı" else "漢"
      scala.util.Try(encodeCell(VarChar(255, coll), bad)).isFailure
    }

  property("SEQUENCE body roundtrips any tso at any type") =
    forAll(Gen.zip(Gen.oneOf(SnapshotSequence, CommitSequence,
        HeartbeatSequence), Gen.choose(Long.MinValue, Long.MaxValue))) {
      case (t, tso) =>
        val r = new ByteReader(sequenceEvent(0L, 1L, t, tso).body)
        r.u8() == t && r.le(8) == tso
    }

  property("GCN body roundtrips any gcn") =
    forAll { (gcn: Long) =>
      val r = new ByteReader(gcnEvent(0L, 1L, gcn).body)
      r.u8() == 0 && r.le(8) == gcn
    }
}
