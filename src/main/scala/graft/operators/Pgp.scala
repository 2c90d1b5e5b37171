package graft.operators

import java.security.MessageDigest

import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/**
 * pgcrypto's PGP symmetric surface (reference: contrib/pgcrypto
 * pgp-encrypt.cpp / pgp-decrypt.cpp / pgp-s2k.cpp / pgp-armor.cpp),
 * re-expressed from the PUBLIC OpenPGP message format (RFC 4880):
 *
 *  - `armor`/`dearmor`: base64 armor with the radix-64 CRC24
 *    (RFC 4880 §6).
 *  - S2K string-to-key (§3.7): simple (0), salted (1), and
 *    iterated+salted (3) modes over MD5/SHA-1/SHA-256, with the
 *    multi-instance expansion for keys longer than the digest.
 *  - Symmetric-Key Encrypted Session Key packet (tag 3, the s2k spec
 *    carrier) + Sym. Encrypted Integrity Protected Data (tag 18,
 *    OpenPGP CFB without resync + SHA-1 MDC, §5.13) and the legacy
 *    tag 9 form (CFB WITH the §13.9 resync quirk, no MDC).
 *  - Literal packets (tag 11) and compressed packets (tag 8; ZIP =
 *    raw deflate, ZLIB) on the read path.
 *  - Ciphers: Blowfish (algo 4), AES-128/192/256 (7/8/9) — the
 *    kernels already gated by C79's raw pgcrypto surface.
 *
 * Every decrypt behavior is pinned against the reference's OWN
 * armored fixtures (contrib/pgcrypto/expected/pgp-decrypt.out — 45
 * messages across cipher × s2k-mode × hash × mdc; PgpSpec).
 *
 * DETERMINISM: the reference draws salt + CFB prefix from fortuna
 * (nondeterministic by design). `encrypt` takes a caller seed and
 * derives both from SHA-1(seed‖counter) — the deterministic analogue
 * the gates need; pass a SecureRandom-drawn seed to recover the
 * reference's entropy contract.
 */
object Pgp {

  // ------------------------------------------------------------- armor

  private val B64E = java.util.Base64.getEncoder
  private val B64D = java.util.Base64.getMimeDecoder

  /** radix-64 CRC24 (RFC 4880 §6.1 — the spec's own reference code). */
  def crc24(data: Array[Byte]): Int = {
    var crc = 0xb704ce
    var i = 0
    while (i < data.length) {
      crc ^= (data(i) & 0xff) << 16
      var j = 0
      while (j < 8) {
        crc <<= 1
        if ((crc & 0x1000000) != 0) crc ^= 0x1864cfb
        j += 1
      }
      i += 1
    }
    crc & 0xffffff
  }

  def armor(data: Array[Byte]): String = {
    val b64 = B64E.encodeToString(data).grouped(76).mkString("\n")
    val crc = crc24(data)
    val crcB64 = B64E.encodeToString(
      Array(((crc >> 16) & 0xff).toByte, ((crc >> 8) & 0xff).toByte,
        (crc & 0xff).toByte))
    // empty payload renders no body line at all (pgp-armor.out:6-13)
    val body = if (b64.isEmpty) "" else b64 + "\n"
    s"-----BEGIN PGP MESSAGE-----\n\n$body=$crcB64\n-----END PGP MESSAGE-----\n"
  }

  def dearmor(text: String): Array[Byte] = {
    val lines = text.split("\n", -1).map(_.stripSuffix("\r"))
    val begin = lines.indexWhere(_.startsWith("-----BEGIN PGP"))
    require(begin >= 0, "graft: pgp armor: no BEGIN marker")
    // headers run until the first blank line
    var i = begin + 1
    while (i < lines.length && lines(i).trim.nonEmpty) i += 1
    val body = new StringBuilder
    var crcLine: String = null
    i += 1
    while (i < lines.length && !lines(i).startsWith("-----END")) {
      val l = lines(i).trim
      if (l.startsWith("=")) crcLine = l.substring(1)
      else body.append(l)
      i += 1
    }
    val data = B64D.decode(body.toString)
    if (crcLine != null) {
      val c = B64D.decode(crcLine)
      val want = ((c(0) & 0xff) << 16) | ((c(1) & 0xff) << 8) | (c(2) & 0xff)
      require(crc24(data) == want, "graft: pgp armor: CRC24 mismatch")
    }
    data
  }

  // --------------------------------------------------------------- s2k

  private def digestOf(algo: Int): MessageDigest = algo match {
    case 1 => MessageDigest.getInstance("MD5")
    case 2 => MessageDigest.getInstance("SHA-1")
    case 8 => MessageDigest.getInstance("SHA-256")
    case a => throw new IllegalArgumentException(
      s"graft: pgp s2k hash algorithm $a not supported")
  }

  /** §3.7.1 string-to-key. mode 0 = simple, 1 = salted, 3 = iterated
    * +salted with the coded `countByte`. */
  def s2k(mode: Int, hashAlgo: Int, salt: Array[Byte], countByte: Int,
      pass: Array[Byte], keyLen: Int): Array[Byte] = {
    val out = new Array[Byte](keyLen)
    var got = 0
    var instance = 0
    while (got < keyLen) {
      val md = digestOf(hashAlgo)
      var z = 0
      while (z < instance) { md.update(0.toByte); z += 1 } // §3.7.1.1
      mode match {
        case 0 => md.update(pass)
        case 1 => md.update(salt); md.update(pass)
        case 3 =>
          val count = (16 + (countByte & 15)).toLong << ((countByte >> 4) + 6)
          val block = salt ++ pass
          var fed = 0L
          // always hash at least one full salt+pass (§3.7.1.3)
          while (fed < math.max(count, block.length.toLong)) {
            val n = math.min(block.length.toLong,
              math.max(count, block.length.toLong) - fed).toInt
            md.update(block, 0, n)
            fed += n
          }
        case m => throw new IllegalArgumentException(
          s"graft: pgp s2k mode $m not supported")
      }
      val d = md.digest()
      val n = math.min(d.length, keyLen - got)
      System.arraycopy(d, 0, out, got, n)
      got += n
      instance += 1
    }
    out
  }

  // ------------------------------------------------------------ ciphers

  private[operators] def cipherName(algo: Int): (String, Int, Int) = algo match {
    case 4 => ("Blowfish", 16, 8) // (jce name, key bytes, block bytes)
    case 7 => ("AES", 16, 16)
    case 8 => ("AES", 24, 16)
    case 9 => ("AES", 32, 16)
    case a => throw new IllegalArgumentException(
      s"graft: pgp cipher algorithm $a not supported")
  }

  private[operators] def cfb(algoName: String, key: Array[Byte], iv: Array[Byte],
      mode: Int): Cipher = {
    val c = Cipher.getInstance(s"$algoName/CFB/NoPadding")
    c.init(mode, new SecretKeySpec(key, algoName), new IvParameterSpec(iv))
    c
  }

  // ------------------------------------------------------ packet reader

  private[operators] final class Reader(val buf: Array[Byte], var pos: Int) {
    def u8(): Int = {
      require(pos < buf.length, "graft: pgp message truncated")
      val v = buf(pos) & 0xff; pos += 1; v
    }
    def take(n: Int): Array[Byte] = {
      require(pos + n <= buf.length, "graft: pgp message truncated")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
    }
    def hasMore: Boolean = pos < buf.length
  }

  /** One packet: (tag, body). Handles old + new format headers and
    * new-format partial body lengths (§4.2). */
  private[operators] def readPacket(r: Reader): (Int, Array[Byte]) = {
    val hdr = r.u8()
    require((hdr & 0x80) != 0, "graft: pgp: bad packet header")
    if ((hdr & 0x40) == 0) { // old format
      val tag = (hdr >> 2) & 0xf
      val body = (hdr & 3) match {
        case 0 => r.take(r.u8())
        case 1 => val n = (r.u8() << 8) | r.u8(); r.take(n)
        case 2 =>
          val n = (r.u8() << 24) | (r.u8() << 16) | (r.u8() << 8) | r.u8()
          r.take(n)
        case 3 => r.take(r.buf.length - r.pos) // indeterminate: to end
      }
      (tag, body)
    } else { // new format
      val tag = hdr & 0x3f
      val out = new java.io.ByteArrayOutputStream()
      var partial = true
      while (partial) {
        val o = r.u8()
        if (o < 192) { out.write(r.take(o)); partial = false }
        else if (o <= 223) {
          val n = ((o - 192) << 8) + r.u8() + 192
          out.write(r.take(n)); partial = false
        } else if (o == 255) {
          val n = (r.u8() << 24) | (r.u8() << 16) | (r.u8() << 8) | r.u8()
          out.write(r.take(n)); partial = false
        } else { // 224..254: partial chunk, more headers follow
          out.write(r.take(1 << (o & 0x1f)))
        }
      }
      (tag, out.toByteArray)
    }
  }

  // ------------------------------------------------------------ decrypt

  /** pgp_sym_decrypt(_bytea): returns the literal packet's bytes.
    * `convertCrlf` applies the reference's convert-crlf=1 option. */
  def decrypt(msg: Array[Byte], pass: Array[Byte],
      convertCrlf: Boolean = false): Array[Byte] = {
    val r = new Reader(msg, 0)
    // ---- tag 3: Symmetric-Key Encrypted Session Key
    val (tag3, skesk) = readPacket(r)
    require(tag3 == 3, s"graft: pgp: expected SKESK packet, got tag $tag3")
    val sr = new Reader(skesk, 0)
    require(sr.u8() == 4, "graft: pgp: SKESK version != 4")
    val cipherAlgo = sr.u8()
    val s2kMode = sr.u8()
    val hashAlgo = sr.u8()
    val salt = if (s2kMode == 1 || s2kMode == 3) sr.take(8) else Array.empty[Byte]
    val countByte = if (s2kMode == 3) sr.u8() else 0
    require(!sr.hasMore,
      "graft: pgp: encrypted session keys not supported (s2k key only)")
    val (algoName, keyLen, bs) = cipherName(cipherAlgo)
    val key = s2k(s2kMode, hashAlgo, salt, countByte, pass, keyLen)

    decryptDataPackets(r, cipherAlgo, key, convertCrlf)
  }

  /** The encrypted-data half shared by the symmetric and public-key
    * paths: tag 18 (SEIPD v1 + MDC) or tag 9 (legacy resync CFB), then
    * the inner compressed/literal packets. `key` is the resolved
    * session key, however it was obtained (S2K or pubenc). */
  private[operators] def decryptDataPackets(r: Reader, cipherAlgo: Int,
      key: Array[Byte], convertCrlf: Boolean): Array[Byte] = {
    val (algoName, _, bs) = cipherName(cipherAlgo)
    // ---- tag 18 (MDC) or tag 9 (legacy resync CFB)
    val (tagD, encBody) = readPacket(r)
    val plain: Array[Byte] = tagD match {
      case 18 =>
        val er = new Reader(encBody, 0)
        require(er.u8() == 1, "graft: pgp: SEIPD version != 1")
        val enc = er.take(encBody.length - 1)
        val dec = cfb(algoName, key, new Array[Byte](bs),
          Cipher.DECRYPT_MODE).doFinal(enc)
        require(dec(bs) == dec(bs - 2) && dec(bs + 1) == dec(bs - 1),
          "graft: pgp: wrong key or corrupt data (prefix check)")
        // MDC: trailing D3 14 + SHA1(prefix..data incl. the D3 14)
        val n = dec.length
        require(n >= bs + 2 + 22 && (dec(n - 22) & 0xff) == 0xd3 &&
          (dec(n - 21) & 0xff) == 0x14, "graft: pgp: MDC packet missing")
        val md = MessageDigest.getInstance("SHA-1")
        md.update(dec, 0, n - 20)
        require(java.util.Arrays.equals(md.digest(),
          java.util.Arrays.copyOfRange(dec, n - 20, n)),
          "graft: pgp: MDC integrity check failed")
        java.util.Arrays.copyOfRange(dec, bs + 2, n - 22)
      case 9 =>
        // §13.9 resync: decrypt bs+2 prefix with zero IV, then restart
        // the CFB stream with IV = ciphertext[2 .. bs+2)
        require(encBody.length >= bs + 2, "graft: pgp message truncated")
        val pre = cfb(algoName, key, new Array[Byte](bs), Cipher.DECRYPT_MODE)
          .doFinal(java.util.Arrays.copyOfRange(encBody, 0, bs + 2))
        require(pre(bs) == pre(bs - 2) && pre(bs + 1) == pre(bs - 1),
          "graft: pgp: wrong key or corrupt data (prefix check)")
        cfb(algoName, key, java.util.Arrays.copyOfRange(encBody, 2, bs + 2),
          Cipher.DECRYPT_MODE)
          .doFinal(java.util.Arrays.copyOfRange(encBody, bs + 2, encBody.length))
      case t => throw new IllegalArgumentException(
        s"graft: pgp: expected encrypted-data packet, got tag $t")
    }

    // ---- inner packets: optional compressed wrapper, then literal
    var inner = plain
    var guard = 0
    while (guard < 4) {
      guard += 1
      val ir = new Reader(inner, 0)
      val (tag, body) = readPacket(ir)
      tag match {
        case 8 =>
          val algo = body(0) & 0xff
          val comp = java.util.Arrays.copyOfRange(body, 1, body.length)
          inner = algo match {
            case 0 => comp
            case 1 => inflate(comp, raw = true) // ZIP: raw deflate
            case 2 => inflate(comp, raw = false) // ZLIB
            case a => throw new IllegalArgumentException(
              s"graft: pgp: compression algorithm $a not supported")
          }
        case 11 =>
          val lr = new Reader(body, 0)
          lr.u8() // format 'b'/'t'/'u'
          val fnameLen = lr.u8()
          lr.take(fnameLen) // filename
          lr.take(4) // mtime
          val data = lr.take(body.length - lr.pos)
          return if (convertCrlf)
            new String(data, java.nio.charset.StandardCharsets.ISO_8859_1)
              .replace("\r\n", "\n")
              .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          else data
        case t => throw new IllegalArgumentException(
          s"graft: pgp: unexpected inner packet tag $t")
      }
    }
    throw new IllegalArgumentException("graft: pgp: nested packets too deep")
  }

  private[operators] def inflate(data: Array[Byte], raw: Boolean): Array[Byte] = {
    val inf = new java.util.zip.Inflater(raw)
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput()) {
      val n = inf.inflate(buf)
      if (n > 0) out.write(buf, 0, n)
      else if (n == 0 && inf.needsDictionary())
        throw new IllegalArgumentException("graft: pgp: zlib dictionary")
    }
    inf.end()
    out.toByteArray
  }

  // ------------------------------------------------------------ encrypt

  /** pgp_sym_encrypt: S2K iterated+salted SHA-1 (mode 3, count byte
    * 0x60 = 65536 — the reference's defaults), cipher per `cipherAlgo`
    * (7 = AES-128 default), SEIPD v1 + MDC framing. Salt and CFB
    * prefix derive from SHA-1(seed‖counter) — see object doc. */
  def encrypt(data: Array[Byte], pass: Array[Byte], seed: Long,
      cipherAlgo: Int = 7): Array[Byte] = {
    val (algoName, keyLen, bs) = cipherName(cipherAlgo)
    // deterministic "entropy": sha1(seed || ctr)
    def noise(ctr: Int, n: Int): Array[Byte] = {
      val md = MessageDigest.getInstance("SHA-1")
      md.update(java.nio.ByteBuffer.allocate(12).putLong(seed).putInt(ctr).array())
      java.util.Arrays.copyOf(md.digest(), n)
    }
    val salt = noise(0, 8)
    val countByte = 0x60
    val key = s2k(3, 2, salt, countByte, pass, keyLen)

    val out = new java.io.ByteArrayOutputStream()
    // SKESK, old format tag 3 (the reference emits 0x8c): v4, algo,
    // s2k mode 3, sha1, salt, count
    out.write(0x8c); out.write(13)
    out.write(4); out.write(cipherAlgo); out.write(3); out.write(2)
    out.write(salt); out.write(countByte)
    out.write(seipdPacket(data, cipherAlgo, key, noise(1, bs)))
    out.toByteArray
  }

  /** The SEIPD (tag 18, v1 + MDC) packet shared by the symmetric and
    * public-key paths: literal wrapper + prefix/repeat + MDC, CFB-
    * encrypted under the resolved session `key`. */
  private[operators] def seipdPacket(data: Array[Byte], cipherAlgo: Int,
      key: Array[Byte], prefix: Array[Byte]): Array[Byte] = {
    val (algoName, _, bs) = cipherName(cipherAlgo)
    require(prefix.length == bs, "graft: pgp: prefix length != block size")
    // literal packet (new format tag 11): binary, no name, mtime 0
    val lit = new java.io.ByteArrayOutputStream()
    lit.write(0xcb)
    writeNewLen(lit, data.length + 6)
    lit.write('b'); lit.write(0); lit.write(Array[Byte](0, 0, 0, 0))
    lit.write(data)

    // SEIPD v1 payload: prefix + repeat + literal + MDC
    val body = new java.io.ByteArrayOutputStream()
    body.write(prefix)
    body.write(prefix(bs - 2)); body.write(prefix(bs - 1))
    body.write(lit.toByteArray)
    body.write(0xd3); body.write(0x14)
    val md = MessageDigest.getInstance("SHA-1")
    md.update(body.toByteArray)
    body.write(md.digest())
    val enc = cfb(algoName, key, new Array[Byte](bs), Cipher.ENCRYPT_MODE)
      .doFinal(body.toByteArray)

    val out = new java.io.ByteArrayOutputStream()
    // SEIPD, new format tag 18: version byte + ciphertext
    out.write(0xd2)
    writeNewLen(out, enc.length + 1)
    out.write(1)
    out.write(enc)
    out.toByteArray
  }

  private[operators] def writeNewLen(out: java.io.ByteArrayOutputStream, n: Int): Unit = {
    if (n < 192) out.write(n)
    else if (n < 8384) {
      out.write(((n - 192) >> 8) + 192); out.write((n - 192) & 0xff)
    } else {
      out.write(255)
      out.write(n >> 24); out.write((n >> 16) & 0xff)
      out.write((n >> 8) & 0xff); out.write(n & 0xff)
    }
  }

  // --------------------------------------------------------- Column API

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.Bridge.{column, expression}

  /** pgp_sym_encrypt(data, psw) with an explicit determinism seed
    * (derives salt + CFB prefix — see object doc). */
  def pgpSymEncrypt(data: Column, pass: Column, seed: Column,
      cipherAlgo: Int = 7): Column =
    column(PgpEncryptExpr(expression(data), expression(pass),
      expression(seed), cipherAlgo))

  /** pgp_sym_decrypt_bytea(msg, psw). */
  def pgpSymDecryptBytea(data: Column, pass: Column,
      convertCrlf: Boolean = false): Column =
    column(PgpDecryptExpr(expression(data), expression(pass), convertCrlf))

  /** pgp_sym_decrypt(msg, psw) — text form. */
  def pgpSymDecrypt(data: Column, pass: Column,
      convertCrlf: Boolean = false): Column =
    pgpSymDecryptBytea(data, pass, convertCrlf).cast("string")

  def armorCol(data: Column): Column = column(ArmorExpr(expression(data)))
  def dearmorCol(text: Column): Column = column(DearmorExpr(expression(text)))
}

// ------------------------------------------------------ expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** pgp_sym_encrypt — one compiled call per row (codegen'd). */
case class PgpEncryptExpr(data: Expression, pass: Expression,
    seed: Expression, cipherAlgo: Int) extends TernaryExpression {
  override def first: Expression = data
  override def second: Expression = pass
  override def third: Expression = seed
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pgp_sym_encrypt"
  private def bytes(x: Any): Array[Byte] = x match {
    case s: UTF8String => s.getBytes
    case b: Array[Byte] => b
  }
  def enc(d: Any, p: Any, s: Any): Array[Byte] =
    Pgp.encrypt(bytes(d), bytes(p), s.asInstanceOf[Long], cipherAlgo)
  override def nullSafeEval(d: Any, p: Any, s: Any): Any = enc(d, p, s)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pgpEnc", this, classOf[PgpEncryptExpr].getName)
    nullSafeCodeGen(ctx, ev, (d, p, s) =>
      s"${ev.value} = $ref.enc($d, $p, (Object) $s);")
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): Expression = copy(data = a, pass = b, seed = c)
}

/** pgp_sym_decrypt_bytea. */
case class PgpDecryptExpr(data: Expression, pass: Expression,
    convertCrlf: Boolean) extends BinaryExpression {
  override def left: Expression = data
  override def right: Expression = pass
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pgp_sym_decrypt"
  private def bytes(x: Any): Array[Byte] = x match {
    case s: UTF8String => s.getBytes
    case b: Array[Byte] => b
  }
  def dec(d: Any, p: Any): Array[Byte] =
    Pgp.decrypt(bytes(d), bytes(p), convertCrlf)
  override def nullSafeEval(d: Any, p: Any): Any = dec(d, p)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pgpDec", this, classOf[PgpDecryptExpr].getName)
    nullSafeCodeGen(ctx, ev, (d, p) => s"${ev.value} = $ref.dec($d, $p);")
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(data = l, pass = r)
}

/** armor(bytea) → text. */
case class ArmorExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "armor"
  def run(b: Any): UTF8String =
    UTF8String.fromString(Pgp.armor(b.asInstanceOf[Array[Byte]]))
  override def nullSafeEval(b: Any): Any = run(b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("armor", this, classOf[ArmorExpr].getName)
    nullSafeCodeGen(ctx, ev, b => s"${ev.value} = $ref.run($b);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** dearmor(text) → bytea. */
case class DearmorExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dearmor"
  def run(t: Any): Array[Byte] = Pgp.dearmor(t.asInstanceOf[UTF8String].toString)
  override def nullSafeEval(t: Any): Any = run(t)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dearmor", this, classOf[DearmorExpr].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.run($t);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
