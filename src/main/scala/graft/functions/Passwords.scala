package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Password account utilities:
 *
 *  - chkpass (contrib/chkpass/chkpass.cpp): a stored-password type over
 *    traditional DES crypt. Input hashes with a random 2-char salt
 *    (seeded here for engine determinism); a ':' prefix means
 *    already-encrypted and stores VERBATIM (truncated to 13 chars, the
 *    DES crypt output length); output re-prefixes the ':'. Equality is
 *    crypt(candidate, stored) == stored, with the reference's 8-char
 *    candidate truncation (chkpass_eq's char[9] buffer — DES crypt
 *    ignores the tail anyway).
 *  - passwordcheck (contrib/passwordcheck/passwordcheck.cpp): the
 *    check_password policy hook as a pure verdict kernel — plaintext
 *    passwords must be >= 8 chars, must not contain the user name, and
 *    must mix letters and non-letters (ASCII isalpha; non-ASCII counts
 *    as non-letter, like the reference's note); md5-encrypted
 *    passwords can only be checked for password == md5(username).
 */
object Passwords {

  private val saltChars =
    "./0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

  /** chkpass_in with explicit salt entropy (2 bytes -> 2 salt chars). */
  def chkpassIn(password: String, entropy: Array[Byte]): String =
    if (password.startsWith(":")) password.substring(1).take(13)
    else {
      require(entropy.length >= 2, "graft: chkpass needs 2 entropy bytes")
      val salt = "" + saltChars(entropy(0) & 0x3f) + saltChars(entropy(1) & 0x3f)
      PxCrypt.desCrypt(password.getBytes("UTF-8"), salt)
    }

  /** Seeded determinism, like gen_salt's seeded variant. */
  def chkpassInSeeded(password: String, seed: Long): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    chkpassIn(password,
      md.digest(java.nio.ByteBuffer.allocate(8).putLong(seed).array()))
  }

  /** chkpass_out: the ':'-prefixed external form. */
  def chkpassOut(stored: String): String = ":" + stored

  /** chkpass_eq: candidate truncated to 8 chars, re-crypted under the
    * stored value as salt. */
  def chkpassEq(stored: String, candidate: String): Boolean =
    PxCrypt.desCrypt(candidate.take(8).getBytes("UTF-8"), stored) == stored

  /** The md5 role-password format PG compares against ("md5" + hex of
    * md5(password || username)). */
  def md5RolePassword(password: String, username: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(password.getBytes("UTF-8"))
    md.update(username.getBytes("UTF-8"))
    "md5" + md.digest().map(b => f"${b & 0xff}%02x").mkString
  }

  /** check_password as a verdict: "ok" or the reference's error text.
    * `password` starting with "md5" + 32 hex chars is treated as
    * PASSWORD_TYPE_MD5, like the hook's caller does. */
  def checkPassword(username: String, password: String): String = {
    val isMd5 = password.length == 35 && password.startsWith("md5") &&
      password.drop(3).forall(c => (c >= '0' && c <= '9') ||
        (c >= 'a' && c <= 'f'))
    if (isMd5) {
      if (password == md5RolePassword(username, username))
        "password must not contain user name"
      else "ok"
    } else {
      def isAsciiAlpha(c: Char) =
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
      if (password.length < 8) "password is too short"
      else if (password.contains(username))
        "password must not contain user name"
      else if (!password.exists(isAsciiAlpha) ||
          password.forall(isAsciiAlpha))
        "password must contain both letters and nonletters"
      else "ok"
    }
  }

  def checkPasswordCol(username: Column, password: Column): Column =
    Bridge.column(CheckPasswordExpr(Bridge.expression(username),
      Bridge.expression(password)))

  def chkpassEqCol(stored: Column, candidate: Column): Column =
    Bridge.column(ChkpassEqExpr(Bridge.expression(stored),
      Bridge.expression(candidate)))
}

case class CheckPasswordExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "check_password"
  override def nullSafeEval(u: Any, p: Any): Any =
    UTF8String.fromString(Passwords.checkPassword(
      u.asInstanceOf[UTF8String].toString, p.asInstanceOf[UTF8String].toString))
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

case class ChkpassEqExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "chkpass_eq"
  override def nullSafeEval(s: Any, c: Any): Any =
    Passwords.chkpassEq(s.asInstanceOf[UTF8String].toString,
      c.asInstanceOf[UTF8String].toString)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}
