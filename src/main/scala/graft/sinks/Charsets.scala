package graft.sinks

import java.nio.charset.Charset
import java.nio.charset.StandardCharsets.UTF_8

/** MySQL collation id → Java charset, for the collations an operational
  * fleet actually carries (the reference maps the full 300+ table —
  * polardbx-cdc-canal/.../binlog/CharsetConversion.java:29; string
  * fields encode in the COLUMN's charset,
  * polardbx-cdc-format/.../field/StringField.java:35). Unknown ids
  * fail loudly — silently mojibake'ing a charset is the one wrong
  * answer.
  *
  * `binary` (63) maps to ISO-8859-1: the 1:1 byte↔char latin-1 bridge,
  * so VARBINARY/BLOB string images preserve the exact bytes through
  * encode∘decode (the engine-internal convention for opaque bytes;
  * MySQL itself does no conversion for binary).
  */
object Charsets {

  /** utf8mb4_0900_ai_ci — MySQL 8's default; the codec default. */
  val Utf8mb4Default = 255

  /** The `binary` pseudo-charset id. */
  val Binary = 63

  private val latin1 = Charset.forName("windows-1252") // MySQL latin1 = cp1252
  private val byId: Map[Int, Charset] = {
    val m = Map.newBuilder[Int, Charset]
    // latin1 family
    Seq(5, 8, 15, 31, 47, 48, 49, 94).foreach(m += _ -> latin1)
    // utf8mb4: legacy general/bin + the 8.0 0900 series
    (Seq(45, 46) ++ (255 to 308)).foreach(m += _ -> UTF_8)
    // utf8mb3 (utf8_general_ci, utf8_bin, utf8_unicode series)
    (Seq(33, 83) ++ (192 to 223)).foreach(m += _ -> UTF_8)
    // East-Asian double-byte sets
    Seq(28, 87).foreach(m += _ -> Charset.forName("GBK"))
    Seq(24, 86).foreach(m += _ -> Charset.forName("GB2312"))
    Seq(248, 249, 250).foreach(m += _ -> Charset.forName("GB18030"))
    Seq(1, 84).foreach(m += _ -> Charset.forName("Big5"))
    Seq(13, 88).foreach(m += _ -> Charset.forName("Shift_JIS"))
    Seq(95, 96).foreach(m += _ -> Charset.forName("windows-31j")) // cp932
    Seq(12, 91).foreach(m += _ -> Charset.forName("EUC-JP")) // ujis
    Seq(97, 98).foreach(m += _ -> Charset.forName("EUC-JP")) // eucjpms
    Seq(19, 85).foreach(m += _ -> Charset.forName("EUC-KR"))
    // single-byte workhorses
    Seq(11, 65).foreach(m += _ -> Charset.forName("US-ASCII"))
    // latin2: ids 2/9/21/27/77 (32/64 are armscii8 — Armenian, no JVM
    // charset — so they stay unmapped and fail loudly per the object doc)
    Seq(2, 9, 21, 27, 77).foreach(m += _ -> Charset.forName("ISO-8859-2"))
    Seq(25, 70).foreach(m += _ -> Charset.forName("ISO-8859-7")) // greek
    Seq(16, 71).foreach(m += _ -> Charset.forName("ISO-8859-8")) // hebrew
    Seq(30, 78).foreach(m += _ -> Charset.forName("ISO-8859-9")) // latin5
    Seq(51, 14, 23, 50, 52).foreach(m += _ -> Charset.forName("windows-1251")) // cp1251 (52 = cp1251_general_cs)
    Seq(57, 67).foreach(m += _ -> Charset.forName("windows-1256")) // cp1256
    Seq(29, 58, 59).foreach(m += _ -> Charset.forName("windows-1257")) // cp1257
    Seq(18, 89).foreach(m += _ -> Charset.forName("TIS-620")) // tis620
    Seq(7, 74).foreach(m += _ -> Charset.forName("KOI8-R"))
    Seq(22, 75).foreach(m += _ -> Charset.forName("KOI8-U"))
    // UCS-2 / UTF-16 / UTF-32 (MySQL's are big-endian)
    (Seq(35, 90) ++ (128 to 151)).foreach(m += _ -> Charset.forName("UTF-16BE"))
    (Seq(54, 55) ++ (101 to 124)).foreach(m += _ -> Charset.forName("UTF-16BE"))
    (Seq(60, 61) ++ (160 to 183)).foreach(m += _ -> Charset.forName("UTF-32BE"))
    // binary: byte-preserving bridge (see object doc)
    m += Binary -> Charset.forName("ISO-8859-1")
    m.result()
  }

  /** The Java charset for a MySQL collation id; loud on unknown ids. */
  def of(collationId: Int): Charset =
    byId.getOrElse(collationId, sys.error(
      s"unmapped MySQL collation id $collationId — add it to " +
        "graft.sinks.Charsets (silent fallback would corrupt strings)"))
}
