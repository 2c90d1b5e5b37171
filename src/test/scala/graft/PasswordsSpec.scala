package graft

import graft.functions.{Passwords, PxCrypt}
import org.scalatest.funsuite.AnyFunSuite

/**
 * chkpass (contrib/chkpass) + passwordcheck (contrib/passwordcheck):
 * the stored-password type over DES crypt and the account-password
 * policy hook's verdicts, branch by branch.
 */
class PasswordsSpec extends AnyFunSuite {

  test("chkpass: hash, external form, equality, 8-char truncation") {
    val h = Passwords.chkpassInSeeded("hello1!x", seed = 3L)
    assert(h.length == 13) // DES crypt output
    assert(Passwords.chkpassOut(h) == ":" + h)
    assert(Passwords.chkpassEq(h, "hello1!x"))
    assert(!Passwords.chkpassEq(h, "hello1!y"))
    // candidates truncate to 8 chars (chkpass_eq's char[9] buffer;
    // DES crypt ignores the tail anyway)
    val h2 = Passwords.chkpassInSeeded("longpassword", seed = 4L)
    assert(Passwords.chkpassEq(h2, "longpassXYZ"))
    // deterministic per seed
    assert(Passwords.chkpassInSeeded("x1!aaaaa", 5L) ==
      Passwords.chkpassInSeeded("x1!aaaaa", 5L))
  }

  test("chkpass: ':' prefix stores pre-encrypted values verbatim") {
    val h = PxCrypt.desCrypt("secret1!".getBytes, "AB")
    assert(Passwords.chkpassIn(":" + h, Array[Byte](0, 0)) == h)
    assert(Passwords.chkpassEq(h, "secret1!"))
    // truncation to 13 chars, like strlcpy(…, 13 + 1)
    assert(Passwords.chkpassIn(":" + h + "EXTRA", Array[Byte](0, 0)) == h)
  }

  test("passwordcheck: every plaintext branch") {
    assert(Passwords.checkPassword("bob", "ab1") == "password is too short")
    assert(Passwords.checkPassword("bob", "xxbobyy1!") ==
      "password must not contain user name")
    assert(Passwords.checkPassword("bob", "onlyletters") ==
      "password must contain both letters and nonletters")
    assert(Passwords.checkPassword("bob", "12345678") ==
      "password must contain both letters and nonletters")
    assert(Passwords.checkPassword("bob", "g00d!pass") == "ok")
    // non-ASCII counts as a non-letter (the reference's isalpha note)
    assert(Passwords.checkPassword("bob", "pässwords") == "ok")
    assert(Passwords.checkPassword("bob", "ääääääää") ==
      "password must contain both letters and nonletters")
  }

  test("passwordcheck: md5-encrypted branch") {
    val bad = Passwords.md5RolePassword("alice", "alice")
    assert(bad.startsWith("md5") && bad.length == 35)
    assert(Passwords.checkPassword("alice", bad) ==
      "password must not contain user name")
    val fine = Passwords.md5RolePassword("otherpw", "alice")
    assert(Passwords.checkPassword("alice", fine) == "ok")
  }
}
