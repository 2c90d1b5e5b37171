package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * pgcrypto hmac() (reference: contrib/pgcrypto/pgcrypto--1.2.sql
 * `hmac(text, text, text) returns bytea`, px-hmac.c) as a native
 * Catalyst expression: HMAC(key, data) for md5 / sha1 / sha224 /
 * sha256 / sha384 / sha512.
 *
 * Deterministic (unlike pgcrypto's crypt()/gen_salt(), which consume
 * server randomness and are out of scope for a reproducible engine).
 * javax.crypto.Mac objects are not thread-safe and cost ~µs to
 * initialize, so each executor thread reuses one per (algo, key) via a
 * ThreadLocal — the hot path is one update+doFinal per row, map-only.
 */
case class HmacExpression(data: Expression, key: Expression, algo: String)
    extends BinaryExpression {
  HmacExpression.javaAlgo(algo) // validate eagerly

  override def left: Expression = data
  override def right: Expression = key
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hmac"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (data.dataType == StringType && key.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hmac needs (STRING, STRING), got " +
        s"(${data.dataType.catalogString}, ${key.dataType.catalogString})")
  }

  override def nullSafeEval(d: Any, k: Any): Any =
    HmacExpression.compute(d.asInstanceOf[UTF8String].getBytes,
      k.asInstanceOf[UTF8String].getBytes, algo)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, k) => {
      s"""${ev.value} = graft.functions.HmacExpression.compute(
         |  $d.getBytes(), $k.getBytes(), "$algo");""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(data = newLeft, key = newRight)
}

object HmacExpression {
  def javaAlgo(a: String): String = a.toLowerCase match {
    case "md5"    => "HmacMD5"
    case "sha1"   => "HmacSHA1"
    case "sha224" => "HmacSHA224"
    case "sha256" => "HmacSHA256"
    case "sha384" => "HmacSHA384"
    case "sha512" => "HmacSHA512"
    case other => throw new IllegalArgumentException(
      s"graft: unsupported hmac algorithm '$other'")
  }

  // one Mac per (thread, algo, key-bytes): re-init only on key change
  private val macCache =
    new ThreadLocal[java.util.HashMap[String, (Array[Byte], javax.crypto.Mac)]] {
      override def initialValue() = new java.util.HashMap()
    }

  def compute(data: Array[Byte], key: Array[Byte], algo: String): Array[Byte] = {
    val ja = javaAlgo(algo)
    val cache = macCache.get()
    val cached = cache.get(ja)
    val mac =
      if (cached != null && java.util.Arrays.equals(cached._1, key)) cached._2
      else {
        val m = javax.crypto.Mac.getInstance(ja)
        m.init(new javax.crypto.spec.SecretKeySpec(
          if (key.isEmpty) Array[Byte](0) else key, ja))
        cache.put(ja, (key.clone(), m))
        m
      }
    mac.doFinal(data)
  }

  /** Column API: hmac(data, key, algo) → BINARY digest. */
  def hmac(data: Column, key: Column, algo: String): Column =
    org.apache.spark.sql.graft.Bridge.column(HmacExpression(
      org.apache.spark.sql.graft.Bridge.expression(data),
      org.apache.spark.sql.graft.Bridge.expression(key), algo))
}
