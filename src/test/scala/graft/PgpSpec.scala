package graft

import graft.operators.Pgp
import org.scalatest.funsuite.AnyFunSuite

/**
 * PGP symmetric encryption against the reference's OWN armored
 * fixtures (contrib/pgcrypto/expected/pgp-decrypt.out,
 * pgp-compression.out): cipher × s2k-mode × hash × mdc coverage, the
 * data batteries with pinned SHA-1s, the CRLF option pair, plus
 * round-trip/tamper laws on the deterministic encryptor.
 */
class PgpSpec extends AnyFunSuite {

  private def sha1hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-1").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  private def dec(armored: String, pass: String, crlf: Boolean = false): String =
    new String(Pgp.decrypt(Pgp.dearmor(armored), pass.getBytes("UTF-8"), crlf),
      "UTF-8")

  // (comment, armored body, passphrase) — dat1 fixtures, all decrypt
  // to 'Secret message.' (pgp-decrypt.out)
  private val dat1 = Seq(
    ("blowfish.sha1.mdc.s2k3",
      """jA0EBAMCfFNwxnvodX9g0jwB4n4s26/g5VmKzVab1bX1SmwY7gvgvlWdF3jKisvS
        |yA6Ce1QTMK3KdL2MPfamsTUSAML8huCJMwYQFfE=
        |=JcP+""".stripMargin, "foobar"),
    ("aes.sha1.mdc.s2k3",
      """jA0EBwMCci97v0Q6Z0Zg0kQBsVf5Oe3iC+FBzUmuMV9KxmAyOMyjCc/5i8f1Eest
        |UTAsG35A1vYs02VARKzGz6xI2UHwFUirP+brPBg3Ee7muOx8pA==
        |=XtrP""".stripMargin, "foobar"),
    ("aes192.sha1.mdc.s2k3",
      """jA0ECAMCI7YQpWqp3D1g0kQBCjB7GlX7+SQeXNleXeXQ78ZAPNliquGDq9u378zI
        |5FPTqAhIB2/2fjY8QEIs1ai00qphjX2NitxV/3Wn+6dufB4Q4g==
        |=rCZt""".stripMargin, "foobar"),
    ("aes256.sha1.mdc.s2k3",
      """jA0ECQMC4f/5djqCC1Rg0kQBTHEPsD+Sw7biBsM2er3vKyGPAQkuTBGKC5ie7hT/
        |lceMfQdbAg6oTFyJpk/wH18GzRDphCofg0X8uLgkAKMrpcmgog==
        |=fB6S""".stripMargin, "foobar"),
    ("aes.sha1.NOMDC.s2k3 (tag 9 resync CFB)",
      """jA0EBwMCnv07rlXqWctgyS2Dm2JfOKCRL4sLSLJUC8RS2cH7cIhKSuLitOtyquB+
        |u9YkgfJfsuRJmgQ9tmo=
        |=60ui""".stripMargin, "foobar"),
    ("aes.MD5.mdc.s2k3",
      """jA0EBwMClrXXtOXetohg0kQBn0Kl1ymevQZRHkdoYRHgzCwSQEiss7zYff2UNzgO
        |KyRrHf7zEBuZiZ2AG34jNVMOLToj1jJUg5zTSdecUzQVCykWTA==
        |=NyLk""".stripMargin, "foobar"),
    ("aes.sha1.mdc.S2K0",
      """jAQEBwAC0kQBKTaLAKE3xzps+QIZowqRNb2eAdzBw2LxEW2YD5PgNlbhJdGg+dvw
        |Ah9GXjGS1TVALzTImJbz1uHUZRfhJlFbc5yGQw==
        |=YvkV""".stripMargin, "foobar"),
    ("aes.sha1.mdc.S2K1",
      """jAwEBwEC/QTByBLI3b/SRAHPxKzI6SZBo5lAEOD+EsvKQWO4adL9tDY+++Iqy1xK
        |4IaWXVKEj9R2Lr2xntWWMGZtcKtjD2lFFRXXd9dZp1ZThNDz
        |=dbXm""".stripMargin, "foobar"),
    ("aes256.sha1.mdc.S2K0",
      """jAQECQAC0kQB4L1eMbani07XF2ZYiXNK9LW3v8w41oUPl7dStmrJPQFwsdxmrDHu
        |rQr3WbdKdY9ufjOE5+mXI+EFkSPrF9rL9NCq6w==
        |=RGts""".stripMargin, "foobar"),
    ("long password",
      """jA0EBwMCx6dBiuqrYNRg0kQBEo63AvA1SCslxP7ayanLf1H0/hlk2nONVhTwVEWi
        |tTGup1mMz6Cfh1uDRErUuXpx9A0gdMu7zX0o5XjrL7WGDAZdSw==
        |=XKKG""".stripMargin, "0123456789abcdefghij"),
    ("very long password",
      """jA0EBwMCBDvYuS990iFg0kQBW31UK5OiCjWf5x6KJ8qNNT2HZWQCjCBZMU0XsOC6
        |CMxFKadf144H/vpoV9GA0f22keQgCl0EsTE4V4lweVOPTKCMJg==
        |=gWDh""".stripMargin,
      "0123456789abcdefghij2jk4h5g2j54khg23h54g2kh54g2khj54g23hj54"),
    ("one-char password",
      """jA0EBwMCqXbFafC+ofVg0kQBejyiPqH0QMERVGfmPOjtAxvyG5KDIJPYojTgVSDt
        |FwsDabdQUz5O7bgNSnxfmyw1OifGF+W2bIn/8W+0rDf8u3+O+Q==
        |=OxOF""".stripMargin, "x"))

  private def wrap(body: String): String =
    s"-----BEGIN PGP MESSAGE-----\n\n$body\n-----END PGP MESSAGE-----\n"

  test("the reference's dat1 battery decrypts to 'Secret message.'") {
    for ((name, body, pass) <- dat1)
      assert(dec(wrap(body), pass) == "Secret message.", s"vector: $name")
  }

  test("dat2 (empty) and dat3 batteries match their pinned SHA-1s") {
    val dat2 =
      """jA0EBwMCvdpDvidNzMxg0jUBvj8eS2+1t/9/zgemxvhtc0fvdKGGbjH7dleaTJRB
        |SaV9L04ky1qECNDx3XjnoKLC+H7IOQ==
        |=Fxen""".stripMargin
    assert(sha1hex(Pgp.decrypt(Pgp.dearmor(wrap(dat2)),
      "0123456789abcdefghij".getBytes)) ==
      "da39a3ee5e6b4b0d3255bfef95601890afd80709")
    val dat3 =
      """jA0EBwMCxQvxJZ3G/HRg0lgBeYmTa7/uDAjPyFwSX4CYBgpZWVn/JS8JzILrcWF8
        |gFnkUKIE0PSaYFp+Yi1VlRfUtRQ/X/LYNGa7tWZS+4VQajz2Xtz4vUeAEiYFYPXk
        |73Hb8m1yRhQK
        |=ivrD""".stripMargin
    assert(sha1hex(Pgp.decrypt(Pgp.dearmor(wrap(dat3)),
      "0123456789abcdefghij".getBytes)) ==
      "5e5c135efc0dd00633efc6dfd6e731ea408a5b4c")
  }

  test("convert-crlf pair matches the reference's two pinned SHA-1s") {
    val msg =
      """ww0ECQMCt7VAtby6l4Bi0lgB5KMIZiiF/b3CfMfUyY0eDncsGXtkbu1X+l9brjpMP8eJnY79Amms
        |a3nsOzKTXUfS9VyaXo8IrncM6n7fdaXpwba/3tNsAhJG4lDv1k4g9v8Ix2dfv6Rs
        |=mBP9""".stripMargin
    assert(sha1hex(Pgp.decrypt(Pgp.dearmor(wrap(msg)), "key".getBytes,
      convertCrlf = false)) == "9353062be7720f1446d30b9e75573a4833886784")
    assert(sha1hex(Pgp.decrypt(Pgp.dearmor(wrap(msg)), "key".getBytes,
      convertCrlf = true)) == "7efefcab38467f7484d6fa43dc86cf5281bd78e2")
  }

  test("compressed message (ZIP algo 1) decrypts (pgp-compression.out)") {
    val msg =
      """ww0ECQMCsci6AdHnELlh0kQB4jFcVwHMJg0Bulop7m3Mi36s15TAhBo0AnzIrRFrdLVCkKohsS6+
        |DMcmR53SXfLoDJOv/M8uKj3QSq7oWNIp95pxfA==
        |=tbSn""".stripMargin
    assert(dec(wrap(msg), "key") == "Secret message")
  }

  test("armor round-trips with a valid CRC24, and CRC tampering is caught") {
    val data = (0 until 300).map(_.toByte).toArray
    assert(Pgp.dearmor(Pgp.armor(data)).toSeq == data.toSeq)
    // RFC 4880's radix-64 CRC24 of the empty string is 0xB704CE
    assert(Pgp.crc24(Array.empty) == 0xb704ce)
    // corrupt one body character (not the CRC line): CRC24 must catch it
    val armored = Pgp.armor(data)
    val lines = armored.split("\n")
    val bodyIdx = lines.indexWhere(l =>
      l.nonEmpty && !l.startsWith("-") && !l.startsWith("="))
    val l = lines(bodyIdx)
    val swapped = (if (l.head == 'Q') 'R' else 'Q') + l.tail
    val tampered = lines.updated(bodyIdx, swapped).mkString("\n")
    val e = intercept[Exception](Pgp.dearmor(tampered))
    assert(e.getMessage.contains("CRC24"))
  }

  test("armor text form and dearmor tolerance match pgp-armor.out") {
    // exact rendered strings (pgp-armor.out:6-24)
    assert(Pgp.armor(Array.empty) ==
      "-----BEGIN PGP MESSAGE-----\n\n=twTO\n-----END PGP MESSAGE-----\n")
    assert(Pgp.armor("test".getBytes) ==
      "-----BEGIN PGP MESSAGE-----\n\ndGVzdA==\n=+G7Q\n-----END PGP MESSAGE-----\n")
    // junk before the armor, Comment headers, indented CRC line
    val messy = """ a pgp msg:
                  |
                  |-----BEGIN PGP MESSAGE-----
                  |Comment: Some junk
                  |
                  |em9va2E=
                  |
                  |  =D5cR
                  |
                  |-----END PGP MESSAGE-----""".stripMargin
    assert(new String(Pgp.dearmor(messy)) == "zooka")
    // several messages: only the FIRST unindented armor block is read
    // (the reference skips the indented 'wrong packet' marker too)
    val multi = """
                  |wrong packet:
                  |  -----BEGIN PGP MESSAGE-----
                  |
                  |  d3Jvbmc=
                  |  =vCYP
                  |  -----END PGP MESSAGE-----
                  |
                  |right packet:
                  |-----BEGIN PGP MESSAGE-----
                  |
                  |cmlnaHQ=
                  |=nbpj
                  |-----END PGP MESSAGE-----
                  |
                  |use only first packet
                  |-----BEGIN PGP MESSAGE-----
                  |
                  |d3Jvbmc=
                  |=vCYP
                  |-----END PGP MESSAGE-----
                  |""".stripMargin
    assert(new String(Pgp.dearmor(multi)) == "right")
    // bad CRC rejects ('Corrupt ascii-armor')
    val bad = "-----BEGIN PGP MESSAGE-----\n\nem9va2E=\n=ZZZZ\n-----END PGP MESSAGE-----\n"
    intercept[Exception](Pgp.dearmor(bad))
  }

  test("encrypt/decrypt round-trip across ciphers, deterministic per seed") {
    val text = "Det pågår något konstigt här — unicode ÅÄÖ and bytes."
    for (algo <- Seq(4, 7, 8, 9)) {
      val ct = Pgp.encrypt(text.getBytes("UTF-8"), "pass".getBytes, 42L, algo)
      assert(new String(Pgp.decrypt(ct, "pass".getBytes), "UTF-8") == text)
      // deterministic for a fixed seed; different for a different seed
      assert(Pgp.encrypt(text.getBytes("UTF-8"), "pass".getBytes, 42L, algo)
        .toSeq == ct.toSeq)
      assert(Pgp.encrypt(text.getBytes("UTF-8"), "pass".getBytes, 43L, algo)
        .toSeq != ct.toSeq)
    }
  }

  test("GnuPG interop, both directions (runs when gpg is installed)") {
    assume(new java.io.File("/usr/bin/gpg").exists, "gpg not installed")
    import scala.sys.process._
    val quiet = ProcessLogger(_ => (), _ => ())
    val dir = java.nio.file.Files.createTempDirectory("graft-pgp").toFile
    def path(n: String) = new java.io.File(dir, n).getPath
    // our encryptor -> GnuPG decrypts (binary and armored forms).
    // ASCII payload: Process.!! decodes gpg's raw stdout with the
    // platform charset, which sbt pins to ASCII
    val msg = "interop payload 123"
    val ct = Pgp.encrypt(msg.getBytes("UTF-8"), "s3cret".getBytes, 99L, 9)
    java.nio.file.Files.write(java.nio.file.Paths.get(path("m.pgp")), ct)
    java.nio.file.Files.write(java.nio.file.Paths.get(path("m.asc")),
      Pgp.armor(ct).getBytes("UTF-8"))
    for (f <- Seq("m.pgp", "m.asc")) {
      val got = Process(Seq("gpg", "--batch", "--yes", "--passphrase",
        "s3cret", "--decrypt", path(f))).!!(quiet)
      assert(got.trim == msg, s"gpg could not read our $f")
    }
    // GnuPG's encryptor (default framing: compressed packet inside an
    // MDC-protected SEIPD) -> our decryptor
    java.nio.file.Files.write(java.nio.file.Paths.get(path("p.txt")),
      "gnupg made this".getBytes("UTF-8"))
    for ((algo, out) <- Seq(("AES256", "g1.pgp"), ("BLOWFISH", "g2.pgp"))) {
      Process(Seq("gpg", "--batch", "--yes", "--passphrase", "s3cret",
        "--symmetric", "--cipher-algo", algo, "--output", path(out),
        path("p.txt"))).!!(quiet)
      val raw = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path(out)))
      assert(new String(Pgp.decrypt(raw, "s3cret".getBytes), "UTF-8") ==
        "gnupg made this", s"our decryptor could not read gpg's $algo")
    }
  }

  test("wrong key and MDC tampering are rejected loudly") {
    val ct = Pgp.encrypt("payload".getBytes, "right".getBytes, 7L)
    val e1 = intercept[Exception](Pgp.decrypt(ct, "wrong".getBytes))
    assert(e1.getMessage.contains("graft: pgp"))
    // flip a ciphertext byte inside the data region
    val bad = ct.clone(); bad(ct.length - 5) = (bad(ct.length - 5) ^ 1).toByte
    val e2 = intercept[Exception](Pgp.decrypt(bad, "right".getBytes))
    assert(e2.getMessage.contains("graft: pgp"))
  }
}
