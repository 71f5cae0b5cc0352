package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the sketch hot paths.
  *
  * Both replace k-pass/64-wide higher-order-function formulations with a
  * single pass over the input array inside whole-stage codegen — the
  * preference-(b) extension point (custom Expression) from the design
  * guide, used only where built-ins genuinely can't express the work
  * without repeated passes.
  */

/** k-slot MinHash signature of a long-hash array in ONE pass.
  *
  * Hash family: universal mixing h_j = h * A_j + B_j over the element's
  * 64-bit hash (odd multipliers from splitmix64 of the slot index) — the
  * standard one-strong-hash + k-cheap-mixes construction (Broder 1997
  * minwise family). Input: array<bigint> (pre-hashed shingles). Output:
  * array<bigint> of length k; null input → null, empty array → all
  * Long.MaxValue slots.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0 && k <= 1024, s"minhash k out of range: $k")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature needs array<bigint>, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val mults: Array[Long] = MinHashSignature.multipliers(k)
  @transient private lazy val adds: Array[Long] = MinHashSignature.addends(k)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = h * mults(j) + adds(j)
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val multsRef = ctx.addReferenceObj("mults", mults, "long[]")
    val addsRef = ctx.addReferenceObj("adds", adds, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
        |final int $n = $arr.numElements();
        |final long[] $out = new long[$k];
        |java.util.Arrays.fill($out, Long.MAX_VALUE);
        |for (int $i = 0; $i < $n; $i++) {
        |  final long $h = $arr.getLong($i);
        |  for (int $j = 0; $j < $k; $j++) {
        |    final long $v = $h * $multsRef[$j] + $addsRef[$j];
        |    if ($v < $out[$j]) $out[$j] = $v;
        |  }
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  /** splitmix64 — deterministic per-slot parameters. */
  private def splitmix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  def multipliers(k: Int): Array[Long] =
    Array.tabulate(k)(j => splitmix(j.toLong * 2 + 1) | 1L) // odd
  def addends(k: Int): Array[Long] =
    Array.tabulate(k)(j => splitmix(j.toLong * 2 + 2))
}

/** 64-bit SimHash of a long-hash array in ONE pass (Charikar 2002):
  * per-bit ±1 votes of each element hash, sign-packed into a long.
  * Input: array<bigint>; output: bigint; empty array → 0.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs array<bigint>, got ${other.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val fp = ctx.freshName("fp")
      s"""
        |final int $n = $arr.numElements();
        |final int[] $votes = new int[64];
        |for (int $i = 0; $i < $n; $i++) {
        |  final long $h = $arr.getLong($i);
        |  for (int $b = 0; $b < 64; $b++) {
        |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
        |  }
        |}
        |long $fp = 0L;
        |for (int $b = 0; $b < 64; $b++) {
        |  if ($votes[$b] > 0) $fp |= (1L << $b);
        |}
        |${ev.value} = $fp;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct hashed word n-grams of a string in ONE pass: tokenize on
  * whitespace, hash each word (FNV-1a over its bytes), combine n
  * consecutive word hashes polynomially, dedupe. Replaces the
  * split→transform→concat_ws→array_distinct→xxhash64 chain — no
  * intermediate string arrays are ever materialized.
  * Input: string; output: array<bigint> (order of first occurrence).
  */
case class HashedShingles(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0 && n <= 16, s"shingle n out of range: $n")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hashed_shingles needs string, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"

  /** Single-pass kernel; public so generated code can call it. */
  def compute(input: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val bytes = input.toLowerCase.getBytes
    // 1. hash each whitespace-separated word with FNV-1a
    val wordHashes = new scala.collection.mutable.ArrayBuffer[Long](64)
    var i = 0
    var inWord = false
    var h = HashedShingles.FnvOffset
    while (i < bytes.length) {
      val b = bytes(i)
      val ws = b == ' ' || b == '\t' || b == '\n' || b == '\r'
      if (ws) {
        if (inWord) { wordHashes += h; h = HashedShingles.FnvOffset; inWord = false }
      } else {
        h = (h ^ (b & 0xFF)) * HashedShingles.FnvPrime
        inWord = true
      }
      i += 1
    }
    if (inWord) wordHashes += h
    // 2. polynomial n-gram combine + dedupe (first-occurrence order)
    val nWords = wordHashes.length
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](math.max(nWords - n + 1, 0))
    var j = 0
    while (j + n <= nWords) {
      var acc = 1469598103934665603L
      var t = 0
      while (t < n) {
        acc = acc * 1099511628211L + wordHashes(j + t)
        t += 1
      }
      if (seen.add(acc)) out += acc
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashedShingles", this,
      classOf[HashedShingles].getName)
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedShingles {
  val FnvOffset: Long = 1469598103934665603L
  val FnvPrime: Long = 1099511628211L
}

/** Unicode NFC normalization of a string column — the canonical first
  * step of text curation (decomposed accents, compatibility variants
  * from OCR/web scrapes fold to one canonical byte sequence, so
  * exact-dedup hashes and token counts stop seeing "café" ≠ "café").
  *
  * Built-ins can't express this (no normalize function in Spark SQL),
  * so it is the preference-(b) extension: a native UnaryExpression
  * inside whole-stage codegen. Two fast paths: pure-ASCII input
  * (numBytes == numChars — the bulk of a web corpus) is detected with
  * zero allocation and returned as-is (ASCII is always NFC);
  * non-ASCII input pays one String decode for `isNormalized` but
  * skips the re-encode when already canonical.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize needs string, got ${other.sql}")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  def compute(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    if (s.numBytes == s.numChars) return s // pure ASCII: always NFC
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfc", this, classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String)" +
        s" $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared element-access codegen/eval for the fixed-arity vector
  * kernels below: the ANN hot path evaluates a dot product (or L2
  * distance) PER CANDIDATE PAIR, and the higher-order-function
  * formulation (`aggregate(zip_with(...))`) is CodegenFallback —
  * interpreted lambdas allocating an intermediate array per row. These
  * kernels run the same fold as one fused whole-stage-codegen loop.
  *
  * Null/length semantics replicate the HOF chain exactly so swapping
  * them in cannot move any oracle-checked value:
  * `zip_with` pads the shorter array with nulls and `aggregate`'s
  * `acc + null` poisons the fold — so a length mismatch or any null
  * element yields NULL, and the accumulation order is the same
  * left-to-right (0 + p0) + p1 ... double sequence. */
private[functions] object VecKernels {
  /** java accessor snippet for one element of `arr` at `i`, widened to
    * double exactly like `cast(x as double)`. */
  def access(arr: String, i: String, et: DataType): String = et match {
    case DoubleType => s"$arr.getDouble($i)"
    case FloatType => s"(double) $arr.getFloat($i)"
    case ByteType => s"(double) $arr.getByte($i)"
    case ShortType => s"(double) $arr.getShort($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case other => throw new IllegalArgumentException(s"vec element: $other")
  }

  def get(arr: ArrayData, i: Int, et: DataType): Double = et match {
    case DoubleType => arr.getDouble(i)
    case FloatType => arr.getFloat(i).toDouble
    case ByteType => arr.getByte(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case other => throw new IllegalArgumentException(s"vec element: $other")
  }

  def ok(dt: DataType): Boolean = dt match {
    case ArrayType(et, _) => et match {
      case DoubleType | FloatType | ByteType | ShortType | IntegerType |
           LongType => true
      case _ => false
    }
    case _ => false
  }

  def elem(dt: DataType): DataType =
    dt.asInstanceOf[ArrayType].elementType
}

/** Fused dot product of two numeric-array columns with double
  * accumulation — codegen replacement for
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  *  0.0, _ + _)`. NULL on null input, length mismatch, or null element
  * (see [[VecKernels]]). */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (VecKernels.ok(left.dataType) && VecKernels.ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"vec_dot needs numeric arrays, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  @transient private lazy val leftType = VecKernels.elem(left.dataType)
  @transient private lazy val rightType = VecKernels.elem(right.dataType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += VecKernels.get(a, i, leftType) * VecKernels.get(b, i, rightType)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        |final int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $acc = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    $acc += ${VecKernels.access(a, i, leftType)} * ${VecKernels.access(b, i, rightType)};
        |  }
        |  ${ev.value} = $acc;
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Fused squared L2 distance of two numeric-array columns — codegen
  * replacement for `aggregate(zip_with(a, b, (x, y) => (x.cast(double)
  * - y) * ...), 0.0, _ + _)`. Same null/length semantics as
  * [[VecDot]]. */
case class VecL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (VecKernels.ok(left.dataType) && VecKernels.ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"vec_l2sq needs numeric arrays, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_l2sq"

  @transient private lazy val leftType = VecKernels.elem(left.dataType)
  @transient private lazy val rightType = VecKernels.elem(right.dataType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = VecKernels.get(a, i, leftType) - VecKernels.get(b, i, rightType)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
        |final int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $acc = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    final double $d = ${VecKernels.access(a, i, leftType)} - ${VecKernels.access(b, i, rightType)};
        |    $acc += $d * $d;
        |  }
        |  ${ev.value} = $acc;
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Fused L2 normalization of a numeric-array column to array<double> —
  * codegen replacement for the when/transform/sqrt(dot) chain in
  * Similarity.normalize, which evaluated the interpreted dot TWICE per
  * row (once in the zero-norm guard, once in the divisor).
  *
  * Exact semantics of the replaced chain:
  * - null input → null;
  * - any null element → every output element null (a null poisons the
  *   norm, and x / null is null for every x);
  * - norm == 0.0 (all zeros) → elements cast to double unchanged;
  * - else x_i / sqrt(Σ x_i²), the identical IEEE sequence. */
case class VecNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (VecKernels.ok(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"vec_normalize needs a numeric array, got " +
        s"${child.dataType.sql}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "vec_normalize"

  @transient private lazy val elemType = VecKernels.elem(child.dataType)

  /** Kernel shared by eval and codegen. */
  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    var anyNull = false
    while (i < n && !anyNull) {
      if (a.isNullAt(i)) anyNull = true
      else { val x = VecKernels.get(a, i, elemType); acc += x * x }
      i += 1
    }
    if (anyNull) return new GenericArrayData(new Array[Any](n))
    val norm = math.sqrt(acc)
    val out = new Array[Double](n)
    if (norm == 0.0) {
      i = 0
      while (i < n) { out(i) = VecKernels.get(a, i, elemType); i += 1 }
    } else {
      i = 0
      while (i < n) { out(i) = VecKernels.get(a, i, elemType) / norm; i += 1 }
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecNormalize", this,
      classOf[VecNormalize].getName)
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry points. */
object sketch {
  /** One-pass distinct hashed word n-grams of a text column. */
  def hashed_shingles(text: Column, n: Int): Column =
    ColumnBridge.column(HashedShingles(ColumnBridge.expression(text), n))

  /** One-pass k-slot MinHash signature over a pre-hashed shingle array. */
  def minhash_signature(hashedShingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(hashedShingles), k))

  /** One-pass 64-bit SimHash over a pre-hashed token array. */
  def simhash64(hashedTokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(hashedTokens)))

  /** Unicode NFC canonicalization (no-alloc fast path when already NFC). */
  def nfc_normalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))

  /** Fused double dot product of two numeric-array columns (the ANN
    * per-pair hot path, whole-stage-codegen). */
  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  /** Fused squared L2 distance of two numeric-array columns. */
  def vec_l2sq(a: Column, b: Column): Column =
    ColumnBridge.column(VecL2Sq(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  /** Fused L2 normalization of a numeric-array column (one pass; the
    * HOF chain computed the interpreted norm twice per row). */
  def vec_normalize(v: Column): Column =
    ColumnBridge.column(VecNormalize(ColumnBridge.expression(v)))
}
