package graft

import graft.functions.HmacExpression
import org.apache.spark.sql.functions._

/**
 * Pins hmac() to the published RFC 4231 (SHA-2 family) and RFC 2202
 * (md5/sha1) test vectors — the same vectors pgcrypto's px-hmac is
 * validated against.
 */
class CryptoSpec extends SparkSpec {
  import spark.implicits._

  private def mac(algo: String, key: String, data: String): String =
    Seq(data).toDF("d")
      .select(lower(hex(HmacExpression.hmac(col("d"), lit(key), algo))))
      .collect()(0).getString(0)

  private val Key = "Jefe"
  private val Data = "what do ya want for nothing?"

  test("RFC 4231 test case 2 (sha224/256/384/512)") {
    assert(mac("sha256", Key, Data) ===
      "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843")
    assert(mac("sha224", Key, Data) ===
      "a30e01098bc6dbbf45690f3a7e9e6d0f8bbea2a39e6148008fd05e44")
    assert(mac("sha384", Key, Data) ===
      "af45d2e376484031617f78d2b58a6b1b9c7ef464f5a01b47e42ec3736322445e" +
        "8e2240ca5e69e2c78b3239ecfab21649")
    assert(mac("sha512", Key, Data) ===
      "164b7a7bfcf819e2e395fbe73b56e0a387bd64222e831fd610270cd7ea250554" +
        "9758bf75c05a994a6d034f65f8f0e6fdcaeab1a34d4a6b4b636e070a38bce737")
  }

  test("RFC 2202 test case 2 (md5/sha1)") {
    assert(mac("md5", Key, Data) === "750c783e6ab0b503eaa86e310a5db738")
    assert(mac("sha1", Key, Data) === "effcdf6ae5eb2fa2d27416d5f184df9c259a7c79")
  }

  test("per-row keys and null propagation; unknown algo throws") {
    val df = Seq(("m1", "k1"), ("m2", "k2"), ("m1", "k1")).toDF("m", "k")
      .select(hex(HmacExpression.hmac(col("m"), col("k"), "sha256")).as("h"))
      .collect().map(_.getString(0))
    assert(df(0) === df(2))
    assert(df(0) !== df(1))
    val n = Seq((Some("m"), None: Option[String])).toDF("m", "k")
      .select(HmacExpression.hmac(col("m"), col("k"), "sha256"))
      .collect()(0)
    assert(n.isNullAt(0))
    intercept[IllegalArgumentException] {
      HmacExpression.hmac(lit("x"), lit("k"), "sha3-999")
    }
  }
}
