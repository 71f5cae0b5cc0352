package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The fused vector kernels (vec_dot / vec_l2sq / vec_normalize) must be
  * bit-identical to the higher-order-function formulations they replaced
  * on the ANN hot path — same accumulation order, same null/length
  * semantics — or oracle-checked sims/ranks would move. */
class VecExpressionsSpec extends SparkSpec {
  import spark.implicits._

  // deterministic float vectors incl. negatives, zeros and a zero vector
  private lazy val vecs = {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 50).map { i =>
      (i.toLong, Seq.fill(64)((rnd.nextGaussian() * (i % 5)).toFloat))
    } :+ (50L, Seq.fill(64)(0.0f))
    rows.toDF("id", "v")
  }

  private def hofDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("vec_dot == aggregate(zip_with) bit-for-bit on float pairs") {
    val pairs = vecs.select($"id".as("id1"), $"v".as("v1"))
      .crossJoin(vecs.select($"id".as("id2"), $"v".as("v2")))
      .filter($"id1" < $"id2")
    val diff = pairs.select(
        sketch.vec_dot($"v1", $"v2").as("nat"),
        hofDot($"v1", $"v2").as("hof"))
      .filter($"nat" =!= $"hof" || $"nat".isNull =!= $"hof".isNull)
    assert(diff.count() == 0)
  }

  test("vec_l2sq == aggregate(zip_with) bit-for-bit vs a double literal") {
    val cLit = array((0 until 64).map(i => lit(i * 0.25 - 4.0)): _*)
    val hof = aggregate(zip_with($"v", cLit,
        (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, x) => acc + x)
    val diff = vecs.select(sketch.vec_l2sq($"v", cLit).as("nat"), hof.as("hof"))
      .filter($"nat" =!= $"hof")
    assert(diff.count() == 0)
  }

  test("vec_normalize == when/transform chain bit-for-bit (incl. zero vector)") {
    val n = sqrt(hofDot($"v", $"v"))
    val hof = when(n === 0.0, transform($"v", x => x.cast("double")))
      .otherwise(transform($"v", x => x.cast("double") / n))
    val rows = vecs.select(sketch.vec_normalize($"v").as("nat"), hof.as("hof"))
      .as[(Seq[Double], Seq[Double])].collect()
    rows.foreach { case (nat, hof) => assert(nat == hof) }
  }

  test("null/length semantics match the HOF chain") {
    val df = Seq(
      (1L, Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),   // plain
      (2L, Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f))),          // length mismatch
      (3L, None, Some(Seq(3.0f, 4.0f))),                     // null side
      (4L, Some(Seq.empty[Float]), Some(Seq.empty[Float]))   // empty → 0.0
    ).toDF("id", "a", "b")
    val got = df.select($"id", sketch.vec_dot($"a", $"b").as("d"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(11.0))
    assert(got(2L).isEmpty)
    assert(got(3L).isEmpty)
    assert(got(4L).contains(0.0))
    // the HOF chain agrees on every case
    val hof = df.select($"id", hofDot($"a", $"b").as("d"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got == hof)
  }

  test("interpreted eval matches codegen (vec_dot)") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val expr = VecDot(
      Literal.create(Seq(1.0, 2.0), ArrayType(DoubleType)),
      Literal.create(Seq(3.0, 4.0), ArrayType(DoubleType)))
    val a = ArrayData.toArrayData(Array(1.0, 2.0))
    val b = ArrayData.toArrayData(Array(3.0, 4.0))
    assert(expr.nullSafeEval(a, b) == 11.0)
    val viaPlan = spark.range(1)
      .select(sketch.vec_dot(typedLit(Seq(1.0, 2.0)), typedLit(Seq(3.0, 4.0))))
      .as[Double].head()
    assert(viaPlan == 11.0)
  }
}
