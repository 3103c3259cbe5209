package graft.plans

import java.math.BigInteger

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BinaryExpression, Expression, If, ImplicitCastInputTypes, IsNull, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** rw_int256 — the reference's 256-bit signed integer scalar type
  * (reference: src/common/src/types/num256.rs, expr/impl/src/scalar/
  * int256.rs). Spark has no 256-bit integral type, so graft renders it
  * the way the reference's own storage layer does: a FIXED 32-byte
  * order-preserving binary encoding (big-endian two's complement with
  * the sign bit flipped — the reference's memcmp_serialize writes the
  * same (hi, lo as unsigned) shape, num256.rs:210-218). Because Spark
  * compares BinaryType by unsigned lexicographic order, the encoding
  * makes ORDER BY / min / max / GROUP BY / binary comparisons on
  * int256 values NUMERICALLY correct with zero custom operators —
  * only arithmetic needs native expressions, and those are codegen'd
  * static calls that stay inside whole-stage codegen.
  *
  * Semantics pinned to the reference:
  *  - range [-2^255, 2^255), overflow errors ("int256 out of range")
  *    rather than wrapping;
  *  - `/` truncates toward zero, `%` takes the dividend's sign (PG);
  *    division by zero errors;
  *  - hex_to_int256 requires a 0x/0X prefix, parses ≤64 hex digits as
  *    an UNSIGNED magnitude and reinterprets two's-complement, so 64
  *    f's is -1 (num256.rs from_str_hex + as_i256; the reference's own
  *    test vectors are pinned in Int256Spec);
  *  - the varchar cast accepts decimal OR 0x-prefixed hex
  *    (from_str_prefixed).
  */
object Int256Ops {
  val Width = 32
  private val Min = BigInteger.ONE.shiftLeft(255).negate()
  private val Max = BigInteger.ONE.shiftLeft(255).subtract(BigInteger.ONE)
  private val TwoPow256 = BigInteger.ONE.shiftLeft(256)

  def encode(v: BigInteger): Array[Byte] = {
    if (v.compareTo(Min) < 0 || v.compareTo(Max) > 0)
      throw new ArithmeticException(s"int256 out of range: $v")
    val tc = v.toByteArray // minimal big-endian two's complement
    val out = new Array[Byte](Width)
    if (v.signum() < 0) java.util.Arrays.fill(out, -1: Byte)
    System.arraycopy(tc, 0, out, Width - tc.length, tc.length)
    out(0) = (out(0) ^ 0x80).toByte // order-preserving sign flip
    out
  }

  def decode(b: Array[Byte]): BigInteger = {
    if (b.length != Width)
      throw new IllegalArgumentException(
        s"int256 value must be $Width bytes, got ${b.length}")
    val c = b.clone(); c(0) = (c(0) ^ 0x80).toByte
    new BigInteger(c)
  }

  def add(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    encode(decode(a).add(decode(b)))
  def sub(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    encode(decode(a).subtract(decode(b)))
  def mul(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    encode(decode(a).multiply(decode(b)))
  def div(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val d = decode(b)
    if (d.signum() == 0) throw new ArithmeticException("division by zero")
    encode(decode(a).divide(d)) // BigInteger truncates toward zero (PG)
  }
  def mod(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val d = decode(b)
    if (d.signum() == 0) throw new ArithmeticException("division by zero")
    encode(decode(a).remainder(d)) // dividend's sign (PG %)
  }
  def neg(a: Array[Byte]): Array[Byte] = encode(decode(a).negate())
  def abs(a: Array[Byte]): Array[Byte] = encode(decode(a).abs())

  def fromLong(l: Long): Array[Byte] = encode(BigInteger.valueOf(l))

  def fromDec(s: UTF8String): Array[Byte] = {
    val t = s.toString.trim
    if (t.regionMatches(true, 0, "0x", 0, 2)) fromHexStr(t)
    else
      try encode(new BigInteger(t))
      catch {
        case _: NumberFormatException => throw new NumberFormatException(
          s"invalid input syntax for type rw_int256: \"$t\"")
      }
  }

  def fromHex(s: UTF8String): Array[Byte] = {
    val t = s.toString.trim
    if (!t.regionMatches(true, 0, "0x", 0, 2))
      throw new NumberFormatException(
        s"hex_to_int256 requires a 0x prefix: \"$t\"")
    fromHexStr(t)
  }

  private def fromHexStr(t: String): Array[Byte] = {
    val hex = t.substring(2)
    if (hex.isEmpty || hex.length > 64 ||
        !hex.forall(c => Character.digit(c, 16) >= 0))
      throw new NumberFormatException(
        s"invalid hexadecimal rw_int256: \"$t\"")
    val u = new BigInteger(hex, 16) // unsigned magnitude
    // reinterpret as two's complement: only a full-width value can set
    // bit 255 (reference: 64 f's == -1)
    encode(if (u.testBit(255)) u.subtract(TwoPow256) else u)
  }

  def toText(b: Array[Byte]): UTF8String =
    UTF8String.fromString(decode(b).toString)
  def toDouble(b: Array[Byte]): Double = decode(b).doubleValue()
}

/** int256 ⊕ int256 → int256 arithmetic (add/sub/mul/div/mod), each a
  * codegen'd static call. Comparison needs no expression at all: the
  * order-preserving encoding makes Spark's native binary comparison
  * numerically correct.
  */
case class Int256Arith(left: Expression, right: Expression, op: String)
  extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = BinaryType
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    op match {
      case "add" => Int256Ops.add(x, y)
      case "sub" => Int256Ops.sub(x, y)
      case "mul" => Int256Ops.mul(x, y)
      case "div" => Int256Ops.div(x, y)
      case "mod" => Int256Ops.mod(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.Int256Ops.$op($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int256Arith =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = s"int256_$op"
}

/** Unary int256 conversions and ops. `op` selects the static helper and
  * fixes the input/output types: neg/abs (bin→bin), text (bin→string),
  * float8 (bin→double), fromdec/fromhex (string→bin), fromlong
  * (long→bin — ImplicitCastInputTypes coerces narrower integrals).
  */
case class Int256Unary(child: Expression, op: String)
  extends UnaryExpression with ImplicitCastInputTypes {

  private val spec: (DataType, DataType, String) = op match {
    case "neg"      => (BinaryType, BinaryType, "neg")
    case "abs"      => (BinaryType, BinaryType, "abs")
    case "text"     => (BinaryType, StringType, "toText")
    case "float8"   => (BinaryType, DoubleType, "toDouble")
    case "fromdec"  => (StringType, BinaryType, "fromDec")
    case "fromhex"  => (StringType, BinaryType, "fromHex")
    case "fromlong" => (LongType, BinaryType, "fromLong")
  }
  override def inputTypes: Seq[DataType] = Seq(spec._1)
  override def dataType: DataType = spec._2
  private def helper: String = spec._3

  override protected def nullSafeEval(a: Any): Any = op match {
    case "neg"      => Int256Ops.neg(a.asInstanceOf[Array[Byte]])
    case "abs"      => Int256Ops.abs(a.asInstanceOf[Array[Byte]])
    case "text"     => Int256Ops.toText(a.asInstanceOf[Array[Byte]])
    case "float8"   => Int256Ops.toDouble(a.asInstanceOf[Array[Byte]])
    case "fromdec"  => Int256Ops.fromDec(a.asInstanceOf[UTF8String])
    case "fromhex"  => Int256Ops.fromHex(a.asInstanceOf[UTF8String])
    case "fromlong" => Int256Ops.fromLong(a.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.Int256Ops.$helper($a);")

  override protected def withNewChildInternal(newChild: Expression): Int256Unary =
    copy(child = newChild)
  override def prettyName: String = s"int256_$op"
}

/** sum over int256 (reference: the int256 aggregate lane — sum/min/max;
  * min/max need nothing custom thanks to the ordered encoding). A
  * DeclarativeAggregate whose buffer is the encoded value itself, so
  * partial aggregation (map-side combine) works and the merge is just
  * Int256Add. The variable-width buffer keeps this on SortAggregate
  * rather than HashAggregate — acceptable for a 32-byte type whose
  * whole reason to exist is wide-value exactness; the partial/final
  * split still bounds shuffle volume by group count.
  */
case class Int256Sum(child: Expression)
  extends DeclarativeAggregate with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)

  private lazy val sum = AttributeReference("sum", BinaryType)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(sum)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, BinaryType))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), sum,
      If(IsNull(sum), child, Int256Arith(sum, child, "add"))))
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(IsNull(sum.right), sum.left,
      If(IsNull(sum.left), sum.right,
        Int256Arith(sum.left, sum.right, "add"))))
  override lazy val evaluateExpression: Expression = sum

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Int256Sum =
    copy(child = newChildren.head)
  override def prettyName: String = "int256_sum"
}
