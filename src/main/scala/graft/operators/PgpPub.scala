package graft.operators

import java.math.BigInteger
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * PGP public-key encryption (reference: contrib/pgcrypto/pgp-pubenc.cpp,
 * pgp-pubdec.cpp, pgp-pubkey.cpp; `pgp_pub_encrypt/_decrypt`,
 * `pgp_key_id`) — the asymmetric half over [[Pgp]]'s SEIPD machinery.
 *
 *  - Key rings parse like internal_read_key (pgp-pubkey.cpp:330): the
 *    MAIN key (tag 5/6) is skipped; the ENCRYPTION key is the subkey
 *    (tag 7/14) whose algorithm can encrypt — sign-only rings raise
 *    "No encryption key found", two usable subkeys raise the multiple-
 *    subkeys error. v4 key ids are the low 8 fingerprint bytes
 *    (calc_key_id :82 — SHA-1 over 0x99‖len‖public portion).
 *  - Protected secret keys (S2K usage 254/255) decrypt their secret
 *    MPIs with the declared cipher in CFB under the S2K-derived key;
 *    254 appends SHA-1 of the cleartext MPIs ("Corrupt data" on
 *    mismatch — the wrong-passphrase signal), 255/clear a 16-bit sum.
 *  - Session keys travel in a tag-1 packet (v3 + key id + algo +
 *    MPI(s)); RSA is m^e mod n over the EME-PKCS1-v1.5-padded secret
 *    message (02 ‖ nonzero pad ‖ 00 ‖ cipher-algo ‖ key ‖ cksum16,
 *    pgp-pubenc.cpp:41), ElGamal is (g^k, m·y^k) with k of
 *    decide_k_bits(|p|) bits, top bit forced (pgp-mpi-internal.cpp:56).
 *
 * Determinism: the reference draws pad bytes, session keys and k from
 * fortuna; this engine derives them from a caller seed (SHA-1 stream),
 * so the same (data, key, seed) row always produces the same packet —
 * required for reproducible pipelines and the bench gate.
 */
object PgpPub {

  import Pgp.{Reader, readPacket, cipherName, cfb, s2k, writeNewLen}

  // pgp.h public-key algorithm ids
  private final val RSA_ENC_SIGN = 1
  private final val RSA_ENC = 2
  private final val RSA_SIGN = 3
  private final val ELGAMAL = 16
  private final val DSA = 17

  private def rsaAlgo(a: Int) =
    a == RSA_ENC_SIGN || a == RSA_ENC || a == RSA_SIGN

  /** One key packet, public portion + optional secret MPIs. */
  final case class Key(algo: Int, keyId: Array[Byte],
      pub: IndexedSeq[BigInteger], sec: IndexedSeq[BigInteger]) {
    /** can_encrypt (pgp-pubkey.cpp:54): sign-only algos excluded. */
    def canEncrypt: Boolean =
      algo == ELGAMAL || algo == RSA_ENC || algo == RSA_ENC_SIGN
  }

  private def readMpi(r: Reader): BigInteger = {
    val bits = (r.u8() << 8) | r.u8()
    val bytes = (bits + 7) / 8
    new BigInteger(1, r.take(bytes))
  }

  private def mpiBytes(v: BigInteger): Array[Byte] = {
    val raw = v.toByteArray
    if (raw.length > 1 && raw(0) == 0) java.util.Arrays.copyOfRange(raw, 1, raw.length)
    else raw
  }

  private def writeMpi(out: java.io.ByteArrayOutputStream, v: BigInteger): Unit = {
    val data = mpiBytes(v)
    val bits = v.bitLength
    out.write(bits >> 8); out.write(bits & 0xff)
    out.write(data)
  }

  private def pubMpiCount(algo: Int): Int = algo match {
    case ELGAMAL => 3 // p, g, y
    case DSA => 4 // p, q, g, y
    case a if rsaAlgo(a) => 2 // n, e
    case a => throw new IllegalArgumentException(
      s"graft: pgp: unknown public-key algorithm $a")
  }

  /** Parse the public portion of a key packet body; returns the key
    * (key id computed per calc_key_id) and the reader positioned after
    * the public MPIs. */
  private def readPublicPart(body: Array[Byte]): (Key, Reader) = {
    val r = new Reader(body, 0)
    val ver = r.u8()
    require(ver == 4, s"graft: pgp: key packet version $ver not supported")
    r.take(4) // creation time
    val algo = r.u8()
    val n = pubMpiCount(algo)
    val pub = (0 until n).map(_ => readMpi(r))
    // v4 fingerprint: SHA-1(0x99, len16, public portion); id = low 8
    val md = MessageDigest.getInstance("SHA-1")
    val pubLen = r.pos
    md.update(Array[Byte](0x99.toByte, (pubLen >> 8).toByte, pubLen.toByte))
    md.update(body, 0, pubLen)
    val keyId = java.util.Arrays.copyOfRange(md.digest(), 12, 20)
    (Key(algo, keyId, pub, IndexedSeq.empty), r)
  }

  /** process_secret_key (pgp-pubkey.cpp): public part, S2K usage byte,
    * optional CFB-decryption of the secret MPIs, integrity check. */
  private def readSecretKey(body: Array[Byte], psw: Option[Array[Byte]]): Key = {
    val (pubPart, r) = readPublicPart(body)
    val hide = r.u8()
    val secData: Array[Byte] = hide match {
      case 0 => r.take(body.length - r.pos) // clear + 16-bit cksum
      case 254 | 255 =>
        if (psw.isEmpty) throw new IllegalArgumentException(
          "graft: pgp: Need password for secret key")
        val cipherAlgo = r.u8()
        val s2kMode = r.u8()
        val hashAlgo = r.u8()
        val salt =
          if (s2kMode == 1 || s2kMode == 3) r.take(8) else Array.empty[Byte]
        val countByte = if (s2kMode == 3) r.u8() else 0
        val (algoName, keyLen, bs) = cipherName(cipherAlgo)
        val key = s2k(s2kMode, hashAlgo, salt, countByte, psw.get, keyLen)
        val iv = r.take(bs)
        val enc = r.take(body.length - r.pos)
        cfb(algoName, key, iv, javax.crypto.Cipher.DECRYPT_MODE).doFinal(enc)
      case h => throw new IllegalArgumentException(
        s"graft: pgp: unknown secret-key protection $h")
    }
    val sr = new Reader(secData, 0)
    val nSec = pubPart.algo match {
      case ELGAMAL | DSA => 1 // x
      case a if rsaAlgo(a) => 4 // d, p, q, u
      case _ => 0
    }
    val sec =
      try (0 until nSec).map(_ => readMpi(sr))
      catch { case _: Exception =>
        throw new IllegalArgumentException("graft: pgp: Corrupt data")
      }
    // integrity: 254 = SHA-1 of the cleartext MPIs, else 16-bit sum
    if (hide == 254) {
      val md = MessageDigest.getInstance("SHA-1")
      md.update(secData, 0, sr.pos)
      val want = try sr.take(20) catch { case _: Exception =>
        throw new IllegalArgumentException("graft: pgp: Corrupt data")
      }
      if (!java.util.Arrays.equals(md.digest(), want))
        throw new IllegalArgumentException("graft: pgp: Corrupt data")
    } else {
      var sum = 0
      var i = 0
      while (i < sr.pos) { sum = (sum + (secData(i) & 0xff)) & 0xffff; i += 1 }
      val want = try { (sr.u8() << 8) | sr.u8() } catch { case _: Exception =>
        throw new IllegalArgumentException("graft: pgp: Corrupt data")
      }
      if (sum != want)
        throw new IllegalArgumentException("graft: pgp: Corrupt data")
    }
    pubPart.copy(sec = sec)
  }

  /** internal_read_key: skip the main key, return the one usable
    * ENCRYPTION subkey. `secret` selects tag 7 vs tag 14. */
  def readKeyRing(blob: Array[Byte], psw: Option[Array[Byte]],
      secret: Boolean): Key = {
    val r = new Reader(blob, 0)
    var gotMain = false
    var encKey: Option[Key] = None
    while (r.hasMore) {
      val (tag, body) = readPacket(r)
      tag match {
        case 5 | 6 =>
          require(!gotMain, "graft: pgp: multiple main keys")
          gotMain = true
        case 7 =>
          require(secret, "graft: pgp: expected public key, got secret subkey")
          val k = readSecretKey(body, psw)
          if (k.canEncrypt) {
            require(encKey.isEmpty, "graft: pgp: multiple encryption subkeys")
            encKey = Some(k)
          }
        case 14 =>
          require(!secret, "graft: pgp: expected secret key, got public subkey")
          val (k, _) = readPublicPart(body)
          if (k.canEncrypt) {
            require(encKey.isEmpty, "graft: pgp: multiple encryption subkeys")
            encKey = Some(k)
          }
        case 2 | 10 | 12 | 13 | 17 | 61 => () // sig/marker/trust/uid/attr
        case t => throw new IllegalArgumentException(
          s"graft: pgp: unexpected packet $t in key ring")
      }
    }
    encKey.getOrElse(throw new IllegalArgumentException(
      "graft: pgp: No encryption key found"))
  }

  /** pgp_key_id (pgp-info.cpp:106): the encryption subkey's id for a
    * key ring (public or secret — only the public portion is read, so
    * no passphrase is needed), the tag-1 key id for a public-key
    * encrypted message ("ANYKEY" when zeroed), or "SYMKEY" for a
    * symmetric message. */
  def keyId(blob: Array[Byte]): String = {
    val r = new Reader(blob, 0)
    var gotMain = false
    var gotPub = 0
    var gotPubenc = 0
    var gotSym = 0
    var gotData = false
    var id: Array[Byte] = null
    while (r.hasMore && !gotData) {
      val (tag, body) = readPacket(r)
      tag match {
        case 5 | 6 =>
          require(!gotMain, "graft: pgp: multiple main keys")
          gotMain = true // main key is for signing — ignored
        case 7 | 14 =>
          val (pk, _) = readPublicPart(body)
          if (pk.canEncrypt) { gotPub += 1; id = pk.keyId }
        case 1 =>
          val br = new Reader(body, 0)
          require(br.u8() == 3, "graft: pgp: pubenc sesskey version != 3")
          gotPubenc += 1
          id = br.take(8)
        case 9 | 18 => gotData = true // stop at the encrypted data
        case 3 => gotSym += 1
        case 2 | 10 | 12 | 13 | 17 | 61 => () // sig/marker/trust/uid/attr
        case t => throw new IllegalArgumentException(
          s"graft: pgp: unexpected packet $t")
      }
    }
    require(!(gotPub > 0 && gotPubenc > 0), "graft: pgp: corrupt data")
    require(gotPub <= 1 && gotPubenc <= 1, "graft: pgp: multiple keys")
    if (gotPub > 0 || gotPubenc > 0) {
      if (id.forall(_ == 0)) "ANYKEY"
      else id.map(b => f"${b & 0xff}%02X").mkString
    } else if (gotSym > 0) "SYMKEY"
    else throw new IllegalArgumentException(
      "graft: pgp: No encryption key found")
  }

  // ------------------------------------------------------------ decrypt

  /** check_eme_pkcs1_v15 + control_cksum (pgp-pubdec.cpp:43-90). */
  private def unpadSecmsg(m: BigInteger): (Int, Array[Byte]) = {
    val data = mpiBytes(m)
    def wrongKey(): Nothing =
      throw new IllegalArgumentException("graft: pgp: Wrong key")
    if (data.length < 10 || data(0) != 2) wrongKey()
    var p = 1
    while (p < data.length && data(p) != 0) p += 1
    if (p == data.length || p - 1 < 8) wrongKey()
    val msg = java.util.Arrays.copyOfRange(data, p + 1, data.length)
    if (msg.length < 3) wrongKey()
    var sum = 0
    var i = 1
    while (i < msg.length - 2) { sum = (sum + (msg(i) & 0xff)) & 0xffff; i += 1 }
    val got = ((msg(msg.length - 2) & 0xff) << 8) | (msg(msg.length - 1) & 0xff)
    if (sum != got) wrongKey()
    (msg(0) & 0xff,
      java.util.Arrays.copyOfRange(msg, 1, msg.length - 2))
  }

  /** pgp_pub_decrypt(_bytea): tag-1 session key + SEIPD data. */
  def decrypt(msg: Array[Byte], seckey: Array[Byte],
      psw: Option[Array[Byte]] = None,
      convertCrlf: Boolean = false): Array[Byte] = {
    val pk = readKeyRing(seckey, psw, secret = true)
    val r = new Reader(msg, 0)
    val (tag1, body) = readPacket(r)
    require(tag1 == 1, s"graft: pgp: expected pubenc session key, got $tag1")
    val br = new Reader(body, 0)
    require(br.u8() == 3, "graft: pgp: pubenc sesskey version != 3")
    val msgKeyId = br.take(8)
    if (!msgKeyId.forall(_ == 0) &&
        !java.util.Arrays.equals(msgKeyId, pk.keyId))
      throw new IllegalArgumentException("graft: pgp: Wrong key")
    val algo = br.u8()
    val m: BigInteger = algo match {
      case ELGAMAL =>
        require(pk.algo == ELGAMAL, "graft: pgp: Wrong key")
        val c1 = readMpi(br); val c2 = readMpi(br)
        val p = pk.pub(0); val x = pk.sec(0)
        c2.multiply(c1.modPow(x, p).modInverse(p)).mod(p)
      case a if rsaAlgo(a) =>
        require(rsaAlgo(pk.algo), "graft: pgp: Wrong key")
        val c = readMpi(br)
        c.modPow(pk.sec(0), pk.pub(0)) // m = c^d mod n
      case a => throw new IllegalArgumentException(
        s"graft: pgp: unknown public-key algorithm $a")
    }
    val (cipherAlgo, sessKey) = unpadSecmsg(m)
    Pgp.decryptDataPackets(r, cipherAlgo, sessKey, convertCrlf)
  }

  // ------------------------------------------------------------ encrypt

  /** decide_k_bits (pgp-mpi-internal.cpp:144). */
  private def decideKBits(pBits: Int): Int =
    if (pBits <= 5120) pBits / 10 + 160 else (pBits / 8 + 200) * 3 / 2

  /** pgp_pub_encrypt with seed-derived determinism (see object doc). */
  def encrypt(data: Array[Byte], pubkey: Array[Byte], seed: Long,
      cipherAlgo: Int = 7): Array[Byte] = {
    val pk = readKeyRing(pubkey, None, secret = false)
    val (_, keyLen, bs) = cipherName(cipherAlgo)

    // deterministic "entropy": sha1(seed || ctr) stream
    def noise(ctr: Int, n: Int): Array[Byte] = {
      val out = new Array[Byte](n)
      var off = 0
      var blk = 0
      while (off < n) {
        val md = MessageDigest.getInstance("SHA-1")
        md.update(java.nio.ByteBuffer.allocate(16)
          .putLong(seed).putInt(ctr).putInt(blk).array())
        val d = md.digest()
        val take = math.min(20, n - off)
        System.arraycopy(d, 0, out, off, take)
        off += take; blk += 1
      }
      out
    }
    val sessKey = noise(0, keyLen)

    // secret message: algo ‖ key ‖ cksum16, EME-PKCS1-padded to
    // (modulus bytes - 1) with NONZERO pad bytes (pgp-pubenc.cpp:41)
    def paddedSecmsg(fullBytes: Int): BigInteger = {
      var sum = 0
      sessKey.foreach(b => sum = (sum + (b & 0xff)) & 0xffff)
      val secmsg = new Array[Byte](keyLen + 3)
      secmsg(0) = cipherAlgo.toByte
      System.arraycopy(sessKey, 0, secmsg, 1, keyLen)
      secmsg(keyLen + 1) = (sum >> 8).toByte
      secmsg(keyLen + 2) = sum.toByte
      val padLen = fullBytes - 2 - secmsg.length
      require(padLen >= 8, "graft: pgp: public key too small")
      val buf = new Array[Byte](fullBytes)
      buf(0) = 0x02
      val rnd = noise(1, padLen * 2) // spare bytes to replace zeros
      var src = 0
      var i = 1
      while (i <= padLen) {
        while (rnd(src) == 0) src += 1 // pad must not contain zeros
        buf(i) = rnd(src); src += 1; i += 1
      }
      buf(padLen + 1) = 0
      System.arraycopy(secmsg, 0, buf, padLen + 2, secmsg.length)
      new BigInteger(1, buf)
    }

    val pkt = new java.io.ByteArrayOutputStream()
    pkt.write(3) // version
    pkt.write(pk.keyId)
    pkt.write(pk.algo)
    pk.algo match {
      case ELGAMAL =>
        val p = pk.pub(0); val g = pk.pub(1); val y = pk.pub(2)
        val m = paddedSecmsg(mpiBytes(p).length - 1)
        // k: decide_k_bits random with the top bit forced (mp_px_rand)
        val kBits = decideKBits(p.bitLength)
        val kraw = noise(2, (kBits + 7) / 8)
        var k = new BigInteger(1, kraw).mod(BigInteger.ONE.shiftLeft(kBits))
        k = k.setBit(kBits - 1)
        val c1 = g.modPow(k, p)
        val c2 = m.multiply(y.modPow(k, p)).mod(p)
        writeMpi(pkt, c1); writeMpi(pkt, c2)
      case a if a == RSA_ENC || a == RSA_ENC_SIGN =>
        val n = pk.pub(0); val e = pk.pub(1)
        val m = paddedSecmsg(mpiBytes(n).length - 1)
        writeMpi(pkt, m.modPow(e, n))
      case a => throw new IllegalArgumentException(
        s"graft: pgp: cannot encrypt to algorithm $a")
    }

    val out = new java.io.ByteArrayOutputStream()
    out.write(0xc1) // new-format tag 1
    writeNewLen(out, pkt.size())
    pkt.writeTo(out)
    out.write(Pgp.seipdPacket(data, cipherAlgo, sessKey, noise(3, bs)))
    out.toByteArray
  }

  // --------------------------------------------------------- Column API

  def pgpPubEncrypt(data: Column, pubkey: Column, seed: Column): Column =
    column(PgpPubEncryptExpr(expression(data), expression(pubkey),
      expression(seed)))

  def pgpPubDecrypt(data: Column, seckey: Column): Column =
    column(PgpPubDecryptExpr(expression(data), expression(seckey)))

  def keyIdCol(key: Column): Column =
    column(PgpKeyIdExpr(expression(key)))
}

case class PgpPubEncryptExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pgp_pub_encrypt"
  private def bytes(x: Any): Array[Byte] = x match {
    case b: Array[Byte] => b
    case s: UTF8String => s.getBytes
  }
  override def nullSafeEval(d: Any, k: Any, s: Any): Any =
    PgpPub.encrypt(bytes(d), bytes(k), s.asInstanceOf[Long])
  override protected def withNewChildrenInternal(a: Expression,
      b: Expression, c: Expression): Expression =
    copy(first = a, second = b, third = c)
}

case class PgpPubDecryptExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pgp_pub_decrypt"
  private def bytes(x: Any): Array[Byte] = x match {
    case b: Array[Byte] => b
    case s: UTF8String => s.getBytes
  }
  override def nullSafeEval(d: Any, k: Any): Any =
    PgpPub.decrypt(bytes(d), bytes(k))
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

case class PgpKeyIdExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pgp_key_id"
  private def bytes(x: Any): Array[Byte] = x match {
    case b: Array[Byte] => b
    case s: UTF8String => s.getBytes
  }
  override def nullSafeEval(k: Any): Any =
    UTF8String.fromString(PgpPub.keyId(bytes(k)))
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
