package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Validation checksums.
  *
  * Reference semantics: ValSQLGenerator builds
  * `SELECT BIT_XOR(CAST(CRC32(CONCAT_WS(',', cols..., ISNULL flags)) AS
  * UNSIGNED))` per table/chunk for src-vs-dst comparison
  * (polardbx-cdc-rpl/.../validation/ValSQLGenerator.java:75,125,188,222).
  *
  * Spark mapping: pure built-ins (`bit_xor(crc32(concat_ws(...)))`) —
  * codegen'd, partial-aggregated map-side, and order-independent (XOR is
  * commutative), so a 100 TB table checksums in one pass with a scalar
  * shuffle. No custom aggregate needed.
  */
object Checksum {

  /** Row checksum column: crc32 over concat of columns + null flags,
    * mirroring the ISNULL(col) terms the reference appends so NULL and
    * empty-string rows hash differently. */
  def rowChecksum(cols: Seq[Column]): Column = {
    val nullFlags = cols.map(c => when(c.isNull, lit("1")).otherwise(lit("0")))
    crc32(concat_ws(",", (cols.map(c => coalesce(c.cast("string"), lit(""))) ++ nullFlags): _*))
  }

  /** Whole-frame checksum: order-independent bit_xor of row checksums. */
  def tableChecksum(df: DataFrame, colNames: Seq[String]): DataFrame =
    df.agg(expr(
      s"bit_xor(${rowChecksumSql(colNames)})").as("checksum"))

  private def rowChecksumSql(colNames: Seq[String]): String = {
    val vals = colNames.map(c => s"coalesce(cast(`$c` as string), '')")
    val flags = colNames.map(c => s"if(`$c` is null, '1', '0')")
    s"crc32(concat_ws(',', ${(vals ++ flags).mkString(", ")}))"
  }

  /** Chunked checksum: one checksum per key-range chunk (the reference
    * validates chunk-by-chunk, then drills into rows only for mismatched
    * chunks — TableValidator.java:100-161). */
  def chunkChecksums(df: DataFrame, chunkExpr: Column, colNames: Seq[String]): DataFrame =
    df.groupBy(chunkExpr.as("chunk"))
      .agg(expr(s"bit_xor(${rowChecksumSql(colNames)})").as("checksum"),
        count(lit(1)).as("n"))
}
