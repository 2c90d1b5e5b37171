package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Deterministic namespace UUIDs — the uuid-ossp v3 surface (ref:
 * contrib/uuid-ossp: uuid_generate_v3(namespace, name) = md5 of the
 * namespace and name with RFC 4122 version/variant bits). The md5
 * runs over `nsHex || name` where nsHex is the namespace UUID's hex
 * WITHOUT dashes — a documented simplification of the RFC's raw-byte
 * concatenation (cross-engine SQL cannot md5 raw bytes portably);
 * determinism and namespace scoping are preserved, byte-for-byte RFC
 * output is not claimed. Version nibble forced to '3'; variant nibble
 * mapped n → 8 + (n mod 4) via one translate() — exactly the
 * (b & 0x3F) | 0x80 rule on the leading nibble.
 *
 * Use case: stable, collision-resistant document/chunk identifiers in
 * data pipelines — the same (namespace, name) always mints the same
 * id on any engine.
 */
object Uuids {
  /** DNS namespace UUID (RFC 4122 appendix C), hex without dashes. */
  val NS_DNS = "6ba7b8109dad11d180b400c04fd430c8"
  /** URL namespace UUID. */
  val NS_URL = "6ba7b8119dad11d180b400c04fd430c8"

  def uuidV3(nsHex: String, name: Column): Column = {
    val h = md5(concat(lit(nsHex), name))
    concat(
      substring(h, 1, 8), lit("-"),
      substring(h, 9, 4), lit("-"),
      lit("3"), substring(h, 14, 3), lit("-"),
      translate(substring(h, 17, 1),
        "0123456789abcdef", "89ab89ab89ab89ab"),
      substring(h, 18, 3), lit("-"),
      substring(h, 21, 12))
  }

  /** Extract the version digit of a formatted UUID. */
  def uuidVersion(u: Column): Column =
    substring(u, 15, 1).cast("int")
}
