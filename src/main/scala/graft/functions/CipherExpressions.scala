package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * pgcrypto raw encryption (reference: contrib/pgcrypto/pgcrypto--1.0.sql
 * `encrypt(bytea, bytea, text)` / `decrypt(...)` / `encrypt_iv(...)`,
 * cipher plumbing internal.cpp:274-292 rj_init — the key is ZERO-PADDED
 * up to the next AES key size (16/24/32), the default mode is CBC with
 * PKCS padding, and the default IV is all-zero; type strings parse as
 * `algo[-mode][/pad:padding]`, e.g. 'aes', 'aes-ecb/pad:none').
 *
 * Spark shape: a native binary expression — map-only, no shuffle; a
 * 100 TB encrypt/decrypt pass is one codegen'd scan. javax.crypto
 * Cipher objects are not thread-safe and cost ~µs to re-key, so each
 * executor thread caches one per transformation and re-inits only when
 * the (key, iv, direction) changes — the hot path is one doFinal/row.
 *
 * Deterministic by design (fixed IV, like the reference's default):
 * correct for reproducible pipelines and keyed storage, NOT semantic
 * security — callers needing per-row IVs pass one via the iv argument
 * (encrypt_iv), exactly as pgcrypto documents.
 */
case class CipherExpression(data: Expression, key: Expression,
    iv: Expression, spec: String, encrypt: Boolean)
    extends TernaryExpression {
  CipherExpressions.parse(spec) // validate eagerly

  override def first: Expression = data
  override def second: Expression = key
  override def third: Expression = iv
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (encrypt) "encrypt" else "decrypt"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t == StringType || t == BinaryType
    if (Seq(data, key, iv).forall(e => ok(e.dataType))) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs STRING or BINARY inputs")
  }

  override def nullSafeEval(d: Any, k: Any, v: Any): Any = {
    def bytes(x: Any): Array[Byte] = x match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    CipherExpressions.compute(bytes(d), bytes(k), bytes(v), spec, encrypt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, k, v) => {
      def conv(x: String, e: Expression) =
        if (e.dataType == StringType) s"$x.getBytes()" else x
      s"""${ev.value} = graft.functions.CipherExpressions.compute(
         |  ${conv(d, data)}, ${conv(k, key)}, ${conv(v, iv)},
         |  "$spec", $encrypt);""".stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(data = f, key = s, iv = t)
}

object CipherExpressions {
  /** pgcrypto type string → (JCE algo, mode, pkcs padding?). */
  def parse(spec: String): (String, String, Boolean) = {
    val (algoMode, pad) = spec.toLowerCase.split("/", 2) match {
      case Array(am) => (am, "pkcs")
      case Array(am, p) =>
        require(p.startsWith("pad:"), s"graft: bad cipher option '$p'")
        (am, p.stripPrefix("pad:"))
    }
    val (algo, mode) = algoMode.split("-", 2) match {
      case Array(a) => (a, "cbc")
      case Array(a, m) => (a, m)
    }
    val jceAlgo = algo match {
      case "aes" => "AES"
      case "bf"  => "Blowfish"
      case other => throw new IllegalArgumentException(
        s"graft: unsupported cipher '$other'")
    }
    require(mode == "cbc" || mode == "ecb", s"graft: unsupported mode '$mode'")
    require(pad == "pkcs" || pad == "none", s"graft: unsupported padding '$pad'")
    (jceAlgo, mode.toUpperCase, pad == "pkcs")
  }

  /** rj_init's key rule: zero-pad up to the next AES key size. */
  private def padKey(key: Array[Byte], algo: String): Array[Byte] =
    if (algo == "AES") {
      val target =
        if (key.length <= 16) 16
        else if (key.length <= 24) 24
        else if (key.length <= 32) 32
        else throw new IllegalArgumentException("graft: AES key too big")
      java.util.Arrays.copyOf(key, target)
    } else {
      require(key.nonEmpty && key.length <= 56, "graft: bad Blowfish key size")
      key
    }

  private final class Slot {
    var cipher: javax.crypto.Cipher = _
    var key: Array[Byte] = _
    var iv: Array[Byte] = _
  }
  private val cache = new ThreadLocal[java.util.HashMap[String, Slot]] {
    override def initialValue() = new java.util.HashMap()
  }

  def compute(data: Array[Byte], key: Array[Byte], iv: Array[Byte],
      spec: String, encrypt: Boolean): Array[Byte] = {
    val (algo, mode, pkcs) = parse(spec)
    val block = if (algo == "AES") 16 else 8
    val transform =
      s"$algo/$mode/${if (pkcs) "PKCS5Padding" else "NoPadding"}"
    val fullIv =
      if (mode == "ECB") null
      else java.util.Arrays.copyOf(iv, block) // zero-extend, ref default
    val dir = if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE
              else javax.crypto.Cipher.DECRYPT_MODE
    val slotKey = s"$transform/$dir"
    val slots = cache.get()
    var slot = slots.get(slotKey)
    val k = padKey(key, algo)
    if (slot == null) { slot = new Slot; slots.put(slotKey, slot) }
    if (slot.cipher == null || !java.util.Arrays.equals(slot.key, k) ||
        (fullIv != null && !java.util.Arrays.equals(slot.iv, fullIv))) {
      val c = javax.crypto.Cipher.getInstance(transform)
      val ks = new javax.crypto.spec.SecretKeySpec(k, algo)
      if (fullIv == null) c.init(dir, ks)
      else c.init(dir, ks, new javax.crypto.spec.IvParameterSpec(fullIv))
      slot.cipher = c; slot.key = k; slot.iv = fullIv
    }
    // doFinal resets the cipher to its init state — reusable per row
    slot.cipher.doFinal(data)
  }

  import org.apache.spark.sql.graft.Bridge.{column, expression}
  private val zeroIv = org.apache.spark.sql.functions.lit(Array.empty[Byte])

  /** pgcrypto encrypt(data, key, type) — zero IV, like the reference. */
  def encrypt(data: Column, key: Column, spec: String): Column =
    column(CipherExpression(expression(data), expression(key),
      expression(zeroIv), spec, encrypt = true))

  def decrypt(data: Column, key: Column, spec: String): Column =
    column(CipherExpression(expression(data), expression(key),
      expression(zeroIv), spec, encrypt = false))

  /** pgcrypto encrypt_iv / decrypt_iv: caller-supplied IV. */
  def encryptIv(data: Column, key: Column, iv: Column, spec: String): Column =
    column(CipherExpression(expression(data), expression(key),
      expression(iv), spec, encrypt = true))

  def decryptIv(data: Column, key: Column, iv: Column, spec: String): Column =
    column(CipherExpression(expression(data), expression(key),
      expression(iv), spec, encrypt = false))
}
