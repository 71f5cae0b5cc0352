package graft.sinks

import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeFactory

/** MySQL binary JSON ("jsonb") — the in-cell document format behind the
  * JSON column type on the binlog wire.
  *
  * Reference semantics: format/field/JsonField.java converts the textual
  * JSON the CDC pipeline carries into the server's binary document before
  * framing it into the row image. The byte layout implemented here is the
  * publicly documented jsonb encoding (mysql/json_binary.h): a 1-byte
  * type tag, then small/large objects and arrays as
  * [count][size][key-entries][value-entries][keys][values] with
  * offset-or-inlined value slots, strings behind a 7-bit varlen, numbers
  * little-endian. Small containers use 2-byte counts/offsets and inline
  * literal/int16/uint16; large use 4 bytes and also inline int32/uint32.
  * Object keys are stored sorted by (length, bytes) — the server's key
  * ordering.
  *
  * Scope: encode covers the node types JSON text can produce (objects,
  * arrays, strings, integers as int16/int32/int64, non-integers as
  * double, literals). Decode additionally understands the OPAQUE (0x0F)
  * values a real server's binlog carries for `CAST(col AS JSON)`
  * columns — DECIMAL-in-JSON (precision/scale + NEWDECIMAL limbs) and
  * DATE/TIME/DATETIME-in-JSON (the packed-temporal int64) — rendering
  * them to their text images exactly as the reference's
  * canal/.../binlog/JsonConversion.java opaque branches do. Other
  * opaque field types still reject loudly rather than guessing.
  */
object JsonB {

  private val mapper = new ObjectMapper()

  // type tags
  private val TSmallObject = 0x00
  private val TLargeObject = 0x01
  private val TSmallArray = 0x02
  private val TLargeArray = 0x03
  private val TLiteral = 0x04
  private val TInt16 = 0x05
  private val TUInt16 = 0x06
  private val TInt32 = 0x07
  private val TUInt32 = 0x08
  private val TInt64 = 0x09
  private val TUInt64 = 0x0A
  private val TDouble = 0x0B
  private val TString = 0x0C
  private val TOpaque = 0x0F

  private def le(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * i)) & 0xFF).toByte)

  private def rdLE(b: Array[Byte], pos: Int, n: Int): Long = {
    var v = 0L
    (0 until n).foreach(i => v |= (b(pos + i) & 0xFFL) << (8 * i))
    v
  }

  /** 7-bit little-endian groups, high bit = continuation. */
  private def varlen(n: Int): Array[Byte] = {
    val out = Array.newBuilder[Byte]
    var v = n
    var done = false
    while (!done) {
      val b = v & 0x7F
      v >>>= 7
      if (v == 0) { out += b.toByte; done = true }
      else out += (b | 0x80).toByte
    }
    out.result()
  }

  private def rdVarlen(b: Array[Byte], pos0: Int): (Int, Int) = {
    var v = 0
    var shift = 0
    var pos = pos0
    var done = false
    while (!done) {
      val x = b(pos) & 0xFF
      v |= (x & 0x7F) << shift
      shift += 7
      pos += 1
      done = (x & 0x80) == 0
    }
    (v, pos)
  }

  // ---- encode ----

  def encode(json: String): Array[Byte] = {
    val (t, payload) = ser(mapper.readTree(json))
    t.toByte +: payload
  }

  /** Encode with the repair-or-quarantine stance (the reference never
    * hard-fails the stream on a broken JSON payload —
    * task/.../filter/JsonRepairUtil.java:37 rebuilds instead of
    * throwing): malformed text is repaired by
    * [[graft.operators.JsonRepair]] first; unrepairable text encodes
    * as the JSON null literal. Returns (jsonb bytes, quarantined). */
  def encodeTolerant(json: String): (Array[Byte], Boolean) =
    try (encode(json), false)
    catch {
      case _: Exception =>
        val (fixed, quarantined) =
          graft.operators.JsonRepair.repairOrQuarantine(json)
        (encode(fixed), quarantined)
    }

  /** (type tag, payload bytes) for one value. */
  private def ser(n: JsonNode): (Int, Array[Byte]) =
    if (n.isNull) (TLiteral, Array(0x00.toByte))
    else if (n.isBoolean)
      (TLiteral, Array(if (n.asBoolean) 0x01.toByte else 0x02.toByte))
    else if (n.isIntegralNumber) {
      val v = n.asLong
      if (v >= scala.Short.MinValue && v <= scala.Short.MaxValue)
        (TInt16, le(v, 2))
      else if (v >= Int.MinValue && v <= Int.MaxValue) (TInt32, le(v, 4))
      else (TInt64, le(v, 8))
    } else if (n.isNumber)
      (TDouble, le(java.lang.Double.doubleToLongBits(n.asDouble), 8))
    else if (n.isTextual) {
      val b = n.asText.getBytes(UTF_8)
      (TString, varlen(b.length) ++ b)
    } else if (n.isArray)
      serContainer(None, n.elements().asScala.toSeq)
    else if (n.isObject) {
      val fields = n.fields().asScala.toSeq.map(e => (e.getKey, e.getValue))
        .sortBy { case (k, _) => (k.getBytes(UTF_8).length, k) }
      serContainer(Some(fields.map(_._1)), fields.map(_._2))
    } else sys.error(s"jsonb: unsupported node $n")

  private def inlined(t: Int, large: Boolean): Boolean =
    t == TLiteral || t == TInt16 || t == TUInt16 ||
      (large && (t == TInt32 || t == TUInt32))

  private def serContainer(keys: Option[Seq[String]],
      vals: Seq[JsonNode]): (Int, Array[Byte]) = {
    val children = vals.map(ser)
    val keyBytes = keys.map(_.map(_.getBytes(UTF_8)))

    def attempt(large: Boolean): Option[Array[Byte]] = {
      val w = if (large) 4 else 2
      val n = vals.length
      val headerLen = 2 * w +
        keyBytes.map(_.length * (w + 2)).getOrElse(0) + n * (1 + w)
      var off = headerLen // keys then values land after the header
      val keyEntries = Array.newBuilder[Byte]
      keyBytes.foreach(_.foreach { kb =>
        keyEntries ++= le(off.toLong, w) ++ le(kb.length.toLong, 2)
        off += kb.length
      })
      val valueEntries = Array.newBuilder[Byte]
      val valueRegion = Array.newBuilder[Byte]
      children.foreach { case (t, payload) =>
        valueEntries += t.toByte
        if (inlined(t, large))
          valueEntries ++= payload.padTo(w, 0.toByte) // low bytes hold the value
        else {
          valueEntries ++= le(off.toLong, w)
          valueRegion ++= payload
          off += payload.length
        }
      }
      val size = off // total payload bytes, count+size fields included
      if (!large && (size > 0xFFFF || n > 0xFFFF)) None
      else {
        val out = Array.newBuilder[Byte]
        out ++= le(n.toLong, w) ++= le(size.toLong, w)
        out ++= keyEntries.result() ++= valueEntries.result()
        keyBytes.foreach(_.foreach(out ++= _))
        out ++= valueRegion.result()
        Some(out.result())
      }
    }

    val base = if (keys.isDefined) TSmallObject else TSmallArray
    attempt(large = false) match {
      case Some(p) => (base, p)
      case None => (base + 1, attempt(large = true).get)
    }
  }

  // ---- decode ----

  def decode(bytes: Array[Byte]): JsonNode =
    parseValue(bytes(0) & 0xFF, bytes, 1)

  /** Canonical compact JSON text (the string image decodeCell serves). */
  def decodeToString(bytes: Array[Byte]): String = decode(bytes).toString

  /** Decode with the quarantine stance: a truncated/corrupt jsonb blob
    * (binary — there is no text to repair) yields the JSON null
    * literal instead of wedging the decode of the whole stream. */
  def decodeToStringTolerant(bytes: Array[Byte]): String =
    try decodeToString(bytes)
    catch { case _: Exception => "null" }

  private def parseValue(t: Int, b: Array[Byte], pos: Int): JsonNode = {
    val f = JsonNodeFactory.instance
    t match {
      case TSmallObject => parseContainer(b, pos, large = false, obj = true)
      case TLargeObject => parseContainer(b, pos, large = true, obj = true)
      case TSmallArray => parseContainer(b, pos, large = false, obj = false)
      case TLargeArray => parseContainer(b, pos, large = true, obj = false)
      case TLiteral => (b(pos) & 0xFF) match {
        case 0x00 => f.nullNode()
        case 0x01 => f.booleanNode(true)
        case 0x02 => f.booleanNode(false)
        case other => sys.error(s"jsonb: bad literal $other")
      }
      case TInt16 => f.numberNode(rdLE(b, pos, 2).toShort.toLong)
      case TUInt16 => f.numberNode(rdLE(b, pos, 2))
      case TInt32 => f.numberNode(rdLE(b, pos, 4).toInt.toLong)
      case TUInt32 => f.numberNode(rdLE(b, pos, 4))
      case TInt64 => f.numberNode(rdLE(b, pos, 8))
      case TUInt64 => f.numberNode(java.math.BigDecimal.valueOf(rdLE(b, pos, 8)))
      case TDouble =>
        f.numberNode(java.lang.Double.longBitsToDouble(rdLE(b, pos, 8)))
      case TString =>
        val (len, p) = rdVarlen(b, pos)
        f.textNode(new String(b, p, len, UTF_8))
      case TOpaque =>
        // [1-byte MySQL field type][varlen data length][data]
        val fieldType = b(pos) & 0xFF
        val (len, p) = rdVarlen(b, pos + 1)
        parseOpaque(fieldType, b, p, len)
      case other => sys.error(f"jsonb: unsupported value type 0x$other%02x")
    }
  }

  /** The opaque server types a binlog's CAST(… AS JSON) columns carry,
    * decoded to their text/number images (reference: JsonConversion's
    * opaque branches). DECIMAL: 1 byte precision + 1 byte scale + the
    * NEWDECIMAL limb bytes. DATE/TIME/DATETIME: the packed-temporal
    * int64 (my_time.h packing: ((ymd<<17|hms)<<24)+micros, ymd =
    * (year*13+month)<<5|day), little-endian. Fractions render only when
    * non-zero — the opaque payload carries no fsp. */
  private def parseOpaque(fieldType: Int, b: Array[Byte], pos: Int,
      len: Int): JsonNode = {
    val f = JsonNodeFactory.instance
    fieldType match {
      case 246 => // MYSQL_TYPE_NEWDECIMAL
        val p = b(pos) & 0xFF
        val s = b(pos + 1) & 0xFF
        val limbs = java.util.Arrays.copyOfRange(b, pos + 2, pos + len)
        f.numberNode(BinlogWire.decodeDecimal(limbs, p, s).bigDecimal)
      case 10 | 14 => // DATE / NEWDATE
        val (dt, _) = unpackDatetime(rdLE(b, pos, 8))
        f.textNode(dt.toLocalDate.toString)
      case 12 | 7 => // DATETIME / TIMESTAMP (stored as packed datetime)
        val (dt, micros) = unpackDatetime(rdLE(b, pos, 8))
        val base = f"${dt.getYear}%04d-${dt.getMonthValue}%02d-" +
          f"${dt.getDayOfMonth}%02d ${dt.getHour}%02d:" +
          f"${dt.getMinute}%02d:${dt.getSecond}%02d"
        f.textNode(if (micros == 0) base else base + f".$micros%06d")
      case 11 => // TIME
        // MySQL TIME is signed (down to -838:59:59): the packed image of
        // a negative time is the negation of the positive packing, so
        // decode |packed| and prefix '-' (reference JsonConversion
        // opaque-TIME branch does exactly this via abs()).
        val packed = rdLE(b, pos, 8)
        val abs = math.abs(packed)
        val sign = if (packed < 0) "-" else ""
        val micros = abs & 0xFFFFFF
        val hms = abs >> 24
        val base = f"$sign${hms >> 12}%02d:${(hms >> 6) & 0x3F}%02d:" +
          f"${hms & 0x3F}%02d"
        f.textNode(if (micros == 0) base else base + f".$micros%06d")
      case other =>
        sys.error(s"jsonb: unsupported opaque field type $other")
    }
  }

  private def unpackDatetime(packed: Long): (java.time.LocalDateTime, Long) = {
    val micros = packed & 0xFFFFFF
    val v = packed >> 24
    val ymd = v >> 17
    val hms = v & 0x1FFFF
    val ym = ymd >> 5
    (java.time.LocalDateTime.of((ym / 13).toInt, (ym % 13).toInt,
      (ymd & 0x1F).toInt, (hms >> 12).toInt, ((hms >> 6) & 0x3F).toInt,
      (hms & 0x3F).toInt), micros)
  }

  private def parseContainer(b: Array[Byte], payloadStart: Int,
      large: Boolean, obj: Boolean): JsonNode = {
    val w = if (large) 4 else 2
    val count = rdLE(b, payloadStart, w).toInt
    val keyEntriesAt = payloadStart + 2 * w
    val keys: IndexedSeq[String] =
      if (!obj) IndexedSeq.empty
      else (0 until count).map { i =>
        val off = rdLE(b, keyEntriesAt + i * (w + 2), w).toInt
        val klen = rdLE(b, keyEntriesAt + i * (w + 2) + w, 2).toInt
        new String(b, payloadStart + off, klen, UTF_8)
      }
    val valueEntriesAt = keyEntriesAt + (if (obj) count * (w + 2) else 0)
    def value(i: Int): JsonNode = {
      val ep = valueEntriesAt + i * (1 + w)
      val t = b(ep) & 0xFF
      if (inlined(t, large)) parseValue(t, b, ep + 1)
      else parseValue(t, b, payloadStart + rdLE(b, ep + 1, w).toInt)
    }
    if (obj) {
      val o = JsonNodeFactory.instance.objectNode()
      (0 until count).foreach(i => o.set[JsonNode](keys(i), value(i)))
      o
    } else {
      val a = JsonNodeFactory.instance.arrayNode()
      (0 until count).foreach(i => a.add(value(i)))
      a
    }
  }
}
