package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native HMAC (reference: src/expr/impl/src/scalar/hmac.rs registers
  * `hmac(secret, payload, sha_type)`) — Spark has md5/sha2 but no keyed
  * MAC, and webhook-style sources authenticate payloads with exactly
  * this primitive. Codegen'd call into a static helper, so the
  * expression stays inside whole-stage codegen like the sha2 builtin.
  *
  * Result is the lowercase hex digest (PG `encode(hmac(...), 'hex')`).
  * Unknown algorithm names raise at eval, mirroring the reference's
  * bind-time rejection of anything but sha1/sha256/sha512/md5.
  */
case class Hmac(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with ImplicitCastInputTypes {
  // (payload, secret, algo)
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType, StringType)

  override protected def nullSafeEval(d: Any, k: Any, a: Any): Any =
    UTF8String.fromString(CryptoExpressions.hmacHex(
      d.asInstanceOf[UTF8String].getBytes,
      k.asInstanceOf[UTF8String].getBytes,
      a.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, k, a) =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.plans.CryptoExpressions.hmacHex(
         |    $d.getBytes(), $k.getBytes(), $a.toString()));""".stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Hmac =
    copy(first = newFirst, second = newSecond, third = newThird)
  override def prettyName: String = "graft_hmac"
}

object CryptoExpressions {
  private def jcaName(algo: String): String = algo.toLowerCase match {
    case "sha256" => "HmacSHA256"
    case "sha1" => "HmacSHA1"
    case "sha512" => "HmacSHA512"
    case "md5" => "HmacMD5"
    case other => throw new IllegalArgumentException(
      s"graft_hmac: unsupported algorithm '$other' (sha1|sha256|sha512|md5)")
  }

  /** Public + JVM-static so generated code can call it. */
  def hmacHex(payload: Array[Byte], secret: Array[Byte], algo: String): String = {
    val mac = javax.crypto.Mac.getInstance(jcaName(algo))
    mac.init(new javax.crypto.spec.SecretKeySpec(secret, jcaName(algo)))
    val out = mac.doFinal(payload)
    val sb = new java.lang.StringBuilder(out.length * 2)
    out.foreach(b => sb.append(String.format("%02x", Byte.box(b))))
    sb.toString
  }
}
