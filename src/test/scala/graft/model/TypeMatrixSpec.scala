package graft.model

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.Checksum

/** Type-matrix roundtrip — the DataTypeTest analog (polardbx-cdc-test/
  * .../binlog/DataTypeTest.java:41 over the metadata properties boundary
  * values): every engine-supported column type with boundary values must
  * survive a write/read roundtrip bit-exactly, checksum stably, and
  * survive the string-image encode/decode used by the change envelope. */
class TypeMatrixSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("c_bool", BooleanType),
    StructField("c_int", IntegerType),
    StructField("c_bigint", LongType),
    StructField("c_decimal", DecimalType(18, 4)),
    StructField("c_float", FloatType),
    StructField("c_double", DoubleType),
    StructField("c_date", DateType),
    StructField("c_timestamp", TimestampType),
    StructField("c_char", StringType),
    StructField("c_blob", BinaryType),
    StructField("c_json", StringType),
    StructField("c_set", ArrayType(StringType)),
    StructField("c_year", IntegerType)))

  private def rows = Seq(
    Row(1L, true, Int.MaxValue, Long.MaxValue,
      new java.math.BigDecimal("99999999999999.9999"), Float.MaxValue,
      Double.MaxValue, Date.valueOf("9999-12-31"),
      Timestamp.valueOf("2038-01-19 03:14:07.999999"), "ZZZZ",
      Array[Byte](0, 1, -1, 127, -128), """{"k":[1,2,{"n":null}]}""",
      Seq("a", "b"), 2155),
    Row(2L, false, Int.MinValue, Long.MinValue,
      new java.math.BigDecimal("-99999999999999.9999"), Float.MinPositiveValue,
      -0.0d, Date.valueOf("1000-01-01"),
      Timestamp.valueOf("1970-01-01 00:00:01.0"), "", Array[Byte](),
      "{}", Seq.empty[String], 1901),
    Row(3L, null, null, null, null, null, null, null, null, null, null,
      null, null, null))

  private lazy val df = spark.createDataFrame(
    spark.sparkContext.parallelize(rows, 2), schema)

  test("parquet write/read roundtrip is exact for all types incl. nulls") {
    val dir = Files.createTempDirectory("graft-types").toString + "/t"
    df.write.parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema == schema.copy(fields = schema.fields.map(
      f => f.copy(nullable = true))) || back.schema == schema)
    val a = df.orderBy("id").collect().map(normalize)
    val b = back.orderBy("id").collect().map(normalize)
    assert(a.toSeq == b.toSeq)
  }

  test("checksum is stable across roundtrip and row order") {
    val cols = schema.fields.filterNot(_.dataType.isInstanceOf[ArrayType])
      .map(_.name).toSeq // concat_ws skips arrays; checksum scalar cols
    val c1 = Checksum.tableChecksum(df, cols).head().getLong(0)
    val dir = Files.createTempDirectory("graft-types2").toString + "/t"
    df.orderBy(desc("id")).write.parquet(dir)
    val c2 = Checksum.tableChecksum(spark.read.parquet(dir), cols)
      .head().getLong(0)
    assert(c1 == c2)
  }

  test("string-image encode/decode (change envelope) preserves scalar values") {
    // encode scalars to the before/after string-map image, then cast back
    // (RowEventReformator positional resolution analog)
    val scalarCols = Seq("c_int", "c_bigint", "c_decimal", "c_double",
      "c_date", "c_timestamp", "c_char")
    val img = df.select(
      (col("id") +: scalarCols.map(c => col(c).cast("string").as(s"s_$c"))): _*)
    val back = img.select(
      col("id"),
      col("s_c_int").cast(IntegerType).as("c_int"),
      col("s_c_bigint").cast(LongType).as("c_bigint"),
      col("s_c_decimal").cast(DecimalType(18, 4)).as("c_decimal"),
      col("s_c_double").cast(DoubleType).as("c_double"),
      col("s_c_date").cast(DateType).as("c_date"),
      col("s_c_timestamp").cast(TimestampType).as("c_timestamp"),
      col("s_c_char").as("c_char"))
    val orig = df.select(("id" +: scalarCols).map(col): _*)
      .orderBy("id").collect().map(normalize)
    val got = back.orderBy("id").collect().map(normalize)
    assert(orig.toSeq == got.toSeq)
  }

  private def normalize(r: Row): Seq[Any] = r.toSeq.map {
    case b: Array[Byte] => b.toSeq
    case x => x
  }
}
