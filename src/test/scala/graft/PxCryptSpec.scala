package graft

import graft.functions.PxCrypt
import org.scalatest.funsuite.AnyFunSuite

/**
 * pgcrypto crypt()/gen_salt() — the reference's own regress vectors
 * (contrib/pgcrypto/expected/crypt-{blowfish,md5,des,xdes}.out) pinned
 * verbatim, plus the self-consistency property its regress scripts
 * check (crypt(pw, crypt(pw, gen_salt(t))) round-trips) and the salt
 * validation errors.
 */
class PxCryptSpec extends AnyFunSuite {

  test("bcrypt: reference crypt-blowfish.out vectors") {
    assert(PxCrypt.crypt("", "$2a$06$RQiOJ.3ELirrXwxIZY8q0O") ==
      "$2a$06$RQiOJ.3ELirrXwxIZY8q0OlGbBEpDmx7IRZlNYvGJ1SHXwNi2cEKK")
    assert(PxCrypt.crypt("foox", "$2a$06$RQiOJ.3ELirrXwxIZY8q0O") ==
      "$2a$06$RQiOJ.3ELirrXwxIZY8q0OR3CVJrAfda1z26CCHPnB6mmVZD8p0/C")
  }

  test("bcrypt: invalid salts error like the reference") {
    // salt too short; bad first count digit; count too small
    for (s <- Seq("$2a$", "$2a$40$RQiOJ.3ELirrXwxIZY8q0O",
        "$2a$00$RQiOJ.3ELirrXwxIZY8q0O"))
      assertThrows[IllegalArgumentException](PxCrypt.crypt("foox", s))
    // $2$ is N/A in px_crypt_list -> crypt(3) returned NULL
    assertThrows[IllegalArgumentException](
      PxCrypt.crypt("x", "$2$06$RQiOJ.3ELirrXwxIZY8q0O"))
  }

  test("bcrypt: $2x$ sign-extension mode diverges only on 8-bit keys") {
    val salt = "$2a$06$RQiOJ.3ELirrXwxIZY8q0O"
    val saltX = "$2x$06$RQiOJ.3ELirrXwxIZY8q0O"
    // pure-ASCII key: same digest, different tag
    assert(PxCrypt.crypt("abc", salt).substring(7) ==
      PxCrypt.crypt("abc", saltX).substring(7))
    // a key with high-bit bytes (UTF-8 of £) diverges
    assert(PxCrypt.crypt("ab£", salt).substring(7) !=
      PxCrypt.crypt("ab£", saltX).substring(7))
  }

  test("md5-crypt: reference crypt-md5.out vectors") {
    assert(PxCrypt.crypt("", "$1$Szzz0yzz") ==
      "$1$Szzz0yzz$To38XrR3BsbXQW2ZpfKjF1")
    assert(PxCrypt.crypt("foox", "$1$Szzz0yzz") ==
      "$1$Szzz0yzz$IYL49cd3t9bllsA7Jmz1M1")
  }

  test("traditional DES: reference crypt-des.out vectors") {
    assert(PxCrypt.crypt("", "NB") == "NBPx/38Y48kHg")
    assert(PxCrypt.crypt("foox", "NB") == "NB53EGGqrrb5E")
    assertThrows[IllegalArgumentException](PxCrypt.crypt("password", "a"))
  }

  test("extended DES: reference crypt-xdes.out vectors") {
    assert(PxCrypt.crypt("", "_J9..j2zz") == "_J9..j2zzR/nIRDK3pPc")
    assert(PxCrypt.crypt("foox", "_J9..j2zz") == "_J9..j2zzAYKMvO2BYRY")
    // keys longer than 8 chars fold through encrypt-and-XOR
    assert(PxCrypt.crypt("longlongpassword", "_J9..j2zz") ==
      "_J9..j2zz4BeseiQNwUg")
    // salt too short
    assertThrows[IllegalArgumentException](PxCrypt.crypt("foox", "_J9..BWH"))
    // count decodes to 0 -> crypt(3) returned NULL
    assertThrows[IllegalArgumentException](
      PxCrypt.crypt("password", "_........"))
    assertThrows[IllegalArgumentException](
      PxCrypt.crypt("password", "_..!!!!!!"))
    // '!' decodes to 0 but '/' gives count 1 -> works
    assert(PxCrypt.crypt("password", "_/!!!!!!!") == "_/!!!!!!!zqM49hRzxko")
  }

  test("crypt(pw, crypt(pw, gen_salt(t))) round-trips for all types") {
    for ((t, r) <- Seq(("des", 0), ("md5", 0), ("xdes", 1001), ("bf", 8))) {
      val salt = PxCrypt.genSaltSeeded(t, r, seed = 42L)
      val res = PxCrypt.crypt("password", salt)
      assert(PxCrypt.crypt("password", res) == res, s"type $t")
      assert(PxCrypt.crypt("passwore", res) != res, s"type $t wrong pw")
    }
  }

  test("gen_salt formats and rounds validation") {
    assert(PxCrypt.genSaltSeeded("des", 0, 1L).length == 2)
    val m = PxCrypt.genSaltSeeded("md5", 0, 1L)
    assert(m.startsWith("$1$") && m.length == 11)
    val x = PxCrypt.genSaltSeeded("xdes", 0, 1L)
    assert(x.length == 9 && x.charAt(0) == '_')
    // default xdes rounds = 725, stored little-endian base64
    val n = (0 until 4).map(i =>
      "./0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
        .indexOf(x.charAt(1 + i)) << (6 * i)).sum
    assert(n == 725)
    val b = PxCrypt.genSaltSeeded("bf", 0, 1L)
    assert(b.startsWith("$2a$06$") && b.length == 29)
    assertThrows[IllegalArgumentException](PxCrypt.genSaltSeeded("bf", 3, 1L))
    assertThrows[IllegalArgumentException](PxCrypt.genSaltSeeded("bf", 32, 1L))
    assertThrows[IllegalArgumentException](PxCrypt.genSaltSeeded("xdes", 724, 1L))
    assertThrows[IllegalArgumentException](PxCrypt.genSaltSeeded("foo", 0, 1L))
  }
}
