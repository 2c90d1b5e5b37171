package graft.functions

import java.util.Locale

import org.apache.spark.sql.catalyst.expressions.{CreateArray, Expression, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * SQL-name registration, wave 2 — the contrib families whose user
 * surface is SQL in the reference: jsonb (jsonb_ops.sql names),
 * hstore (hstore--1.x.sql), intarray (_int.sql), earthdistance.
 * Same rules as [[SqlTextSearch]]: existing kernels only, raw
 * Catalyst trees (native expressions pass through; Column helpers
 * convert eagerly via Bridge.toCatalyst), literal arguments where PG's
 * type system would demand a constant (paths, key lists).
 *
 * hstore here is Spark's native MapType (the gate/operator mapping
 * C59 established); akeys/avals return PG's canonical hstore order —
 * key length first, then bytewise — which is how hstore physically
 * stores pairs.
 */
object SqlContrib {

  private def litString(e: Expression, fn: String, what: String): String =
    e match {
      case Literal(s: UTF8String, StringType) if s != null => s.toString
      case other => throw new IllegalArgumentException(
        s"graft: $fn $what must be a string literal, got $other")
    }

  private def litInt(e: Expression, fn: String, what: String): Int = e match {
    case Literal(v: Number, _) => v.intValue
    case other => throw new IllegalArgumentException(
      s"graft: $fn $what must be an integer literal, got $other")
  }

  private def litLong(e: Expression, fn: String, what: String): Long =
    e match {
      case Literal(v: Number, _) => v.longValue
      case other => throw new IllegalArgumentException(
        s"graft: $fn $what must be an integer literal, got $other")
    }

  private def litBool(e: Expression, fn: String, what: String): Boolean =
    e match {
      case Literal(b: Boolean, _) => b
      case other => throw new IllegalArgumentException(
        s"graft: $fn $what must be a boolean literal, got $other")
    }

  /** A constant text[] argument: array('a','b') or a folded literal. */
  private def litStringArray(e: Expression, fn: String,
      what: String): Seq[String] = e match {
    case CreateArray(children, _) =>
      children.map(litString(_, fn, what))
    case Literal(a: ArrayData, ArrayType(StringType, _)) =>
      a.toArray[UTF8String](StringType).toSeq.map(_.toString)
    case other => throw new IllegalArgumentException(
      s"graft: $fn $what must be a constant string array, got $other")
  }

  /** PG's text[] path literal: '{a,b}' (or a plain 'a,b'). */
  private def pgPath(e: Expression, fn: String): Seq[String] = {
    val raw = litString(e, fn, "path")
    val body = if (raw.startsWith("{") && raw.endsWith("}"))
      raw.substring(1, raw.length - 1) else raw
    val parts = body.split(",", -1).map(_.trim).toSeq
    require(parts.nonEmpty && parts.forall(_.nonEmpty),
      s"graft: $fn: empty path element in '$raw'")
    parts
  }

  /** Shared with [[PgOps]] (the `#>`/`#>>` operator targets): the
    * same '{a,2}' literal shape, but the EMPTY path '{}' is legal
    * there (PG returns the input document). */
  def pathOf(e: Expression, fn: String): Seq[String] = {
    val raw = litString(e, fn, "path")
    val body = if (raw.startsWith("{") && raw.endsWith("}"))
      raw.substring(1, raw.length - 1) else raw
    if (body.trim.isEmpty) Seq.empty
    else body.split(",", -1).map(_.trim).toSeq
  }

  /** Shared with [[PgOps]]: a constant string argument. */
  def litStringOf(e: Expression, fn: String): String =
    litString(e, fn, "argument")

  private def C(e: Expression) = Bridge.column(e)
  private def X(c: org.apache.spark.sql.Column) = Bridge.toCatalyst(c)

  /** The jsonb comparison family over jsonb_cmp's btree order. */
  private def cmp0(args: Seq[Expression], op: String): Expression = {
    import org.apache.spark.sql.functions.lit
    val c = C(JsonbCmp(args(0), args(1)))
    X(op match {
      case "==" => c === lit(0)
      case "!=" => c =!= lit(0)
      case "<" => c < lit(0)
      case "<=" => c <= lit(0)
      case ">" => c > lit(0)
      case _ => c >= lit(0)
    })
  }

  /** pgcrypto options text: only cipher-algo is meaningful here. */
  private def pgpCipher(options: String): Int = {
    val opts = options.split(",").iterator.map(_.trim).filter(_.nonEmpty)
      .map { p =>
        val eq = p.indexOf('=')
        require(eq > 0, s"graft: pgp option '$p' is not k=v")
        p.substring(0, eq).trim.toLowerCase(Locale.ROOT) ->
          p.substring(eq + 1).trim.toLowerCase(Locale.ROOT)
      }.toMap
    opts.keys.find(_ != "cipher-algo").foreach { k =>
      throw new IllegalArgumentException(
        s"graft: pgp_sym_encrypt: unsupported option '$k'")
    }
    opts.getOrElse("cipher-algo", "aes128") match {
      case "bf" => 4
      case "aes" | "aes128" => 7
      case "aes192" => 8
      case "aes256" => 9
      case other => throw new IllegalArgumentException(
        s"graft: pgp_sym_encrypt: unsupported cipher-algo '$other'")
    }
  }

  /** RFC 4122 name-based UUID: hash(namespace BYTES ++ name bytes),
    * version nibble forced, variant bits 10xx. */
  private def uuidName(nsDashed: String, name: Expression,
      v5: Boolean): Expression = {
    import org.apache.spark.sql.functions._
    val ns = nsDashed.replace("-", "").toLowerCase(Locale.ROOT)
    require(ns.matches("[0-9a-f]{32}"),
      s"graft: '$nsDashed' is not a UUID namespace")
    val payload = concat(unhex(lit(ns)), encode(C(name), "UTF-8"))
    val h0 = if (v5) sha1(payload) else md5(payload)
    val h = substring(h0, 1, 32)
    val ver = if (v5) "5" else "3"
    X(concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4),
      concat(lit(ver), substring(h, 14, 3)),
      concat(translate(substring(h, 17, 1),
        "0123456789abcdef", "89ab89ab89ab89ab"), substring(h, 18, 3)),
      substring(h, 21, 12)))
  }

  /** PG hstore storage order: key length first, then bytewise. */
  private def hstoreKeys(h: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    array_sort(map_keys(h), (l, r) =>
      when(length(l) < length(r), -1).when(length(l) > length(r), 1)
        .when(l < r, -1).when(l > r, 1).otherwise(0))
  }

  val all: Map[String, Seq[Expression] => Expression] = Map(
    // ---- jsonb (jsonb_op.cpp / jsonfuncs.cpp SQL names) ----
    "jsonb_contains" -> (args => JsonbContains(args(0), args(1))),
    "jsonb_contained" -> (args => JsonbContains(args(1), args(0))),
    "jsonb_exists" -> (args => JsonbExists(args(0),
      Seq(litString(args(1), "jsonb_exists", "key")), all = false)),
    "jsonb_exists_any" -> (args => JsonbExists(args(0),
      litStringArray(args(1), "jsonb_exists_any", "keys"), all = false)),
    "jsonb_exists_all" -> (args => JsonbExists(args(0),
      litStringArray(args(1), "jsonb_exists_all", "keys"), all = true)),
    "jsonb_concat" -> (args => JsonbConcat(args(0), args(1))),
    // the rest of the reference's jsonb surface (builtin_funcs.ini):
    // field/element getters under their PG names, typeof/length,
    // the set-returning trio as ARRAYS (explode() is Spark's lateral
    // spelling), the btree comparison family, build_object/array
    "jsonb_object_field" -> (args => JsonbGet(args(0), args(1), text = false)),
    "jsonb_object_field_text" -> (args => JsonbGet(args(0), args(1), text = true)),
    "jsonb_array_element" -> (args => JsonbGet(args(0), args(1), text = false)),
    "jsonb_array_element_text" -> (args => JsonbGet(args(0), args(1), text = true)),
    "jsonb_typeof" -> (args => JsonbInspect(args.head, 0)),
    "jsonb_array_length" -> (args => JsonbInspect(args.head, 1)),
    "jsonb_object_keys" -> (args => JsonbInspect(args.head, 2)),
    "jsonb_array_elements" -> (args => JsonbInspect(args.head, 3)),
    "jsonb_array_elements_text" -> (args => JsonbInspect(args.head, 4)),
    "jsonb_each" -> (args => JsonbInspect(args.head, 5)),
    "jsonb_each_text" -> (args => JsonbInspect(args.head, 6)),
    "jsonb_cmp" -> (args => JsonbCmp(args(0), args(1))),
    "jsonb_eq" -> (args => cmp0(args, "==")),
    "jsonb_ne" -> (args => cmp0(args, "!=")),
    "jsonb_lt" -> (args => cmp0(args, "<")),
    "jsonb_le" -> (args => cmp0(args, "<=")),
    "jsonb_gt" -> (args => cmp0(args, ">")),
    "jsonb_ge" -> (args => cmp0(args, ">=")),
    "jsonb_build_object" -> (args => JsonbBuild(args, obj = true)),
    "jsonb_build_array" -> (args => JsonbBuild(args, obj = false)),
    "jsonb_delete_array" -> (args =>
      litStringArray(args(1), "jsonb_delete_array", "keys")
        .foldLeft(args(0))((e, k) => JsonbDelete(e, JsonbDelete.DelKey(k)))),
    // jsonb_delete dispatches on the LITERAL's type, like PG's
    // `- text` vs `- int` operator pair
    "jsonb_delete" -> (args => args(1) match {
      case Literal(s: UTF8String, StringType) =>
        JsonbDelete(args(0), JsonbDelete.DelKey(s.toString))
      case Literal(i: Integer, IntegerType) =>
        JsonbDelete(args(0), JsonbDelete.DelIdx(i))
      case other => throw new IllegalArgumentException(
        s"graft: jsonb_delete needs a string or int literal, got $other")
    }),
    "jsonb_delete_path" -> (args => JsonbDelete(args(0),
      JsonbDelete.DelPath(pgPath(args(1), "jsonb_delete_path")))),
    "jsonb_set" -> (args => {
      require(args.length == 3 || args.length == 4,
        "graft: jsonb_set expects (target, path, value[, create_missing])")
      val create = args.length < 4 ||
        litBool(args(3), "jsonb_set", "create_missing")
      JsonbSetInsert(args(0), args(2), pgPath(args(1), "jsonb_set"),
        insert = false, flag = create)
    }),
    "jsonb_insert" -> (args => {
      require(args.length == 3 || args.length == 4,
        "graft: jsonb_insert expects (target, path, value[, insert_after])")
      val after = args.length == 4 &&
        litBool(args(3), "jsonb_insert", "insert_after")
      JsonbSetInsert(args(0), args(2), pgPath(args(1), "jsonb_insert"),
        insert = true, flag = after)
    }),
    "jsonb_path_exists" -> (args => JsonbPathOp(args(0),
      litString(args(1), "jsonb_path_exists", "jsonpath"), first = false)),
    "jsonb_path_query_first" -> (args => JsonbPathOp(args(0),
      litString(args(1), "jsonb_path_query_first", "jsonpath"),
      first = true)),

    // ---- hstore (hstore_op.cpp SQL names over MapType) ----
    "hstore" -> (args => {
      import org.apache.spark.sql.functions.{map, map_from_arrays}
      args.length match {
        case 2 if args(0).dataType.isInstanceOf[ArrayType] =>
          X(map_from_arrays(C(args(0)), C(args(1))))
        case 2 => X(map(C(args(0)), C(args(1))))
        case other => throw new IllegalArgumentException(
          "graft: hstore expects (key, value) or (keys[], values[])")
      }
    }),
    "akeys" -> (args => X(hstoreKeys(C(args.head)))),
    "avals" -> (args => {
      import org.apache.spark.sql.functions.{element_at, transform}
      val h = C(args.head)
      X(transform(hstoreKeys(h), k => element_at(h, k)))
    }),
    "exist" -> (args => {
      import org.apache.spark.sql.functions.map_contains_key
      X(map_contains_key(C(args(0)), C(args(1))))
    }),
    "defined" -> (args => {
      import org.apache.spark.sql.functions.element_at
      X(element_at(C(args(0)), C(args(1))).isNotNull)
    }),
    "delete" -> (args => {
      import org.apache.spark.sql.functions.map_filter
      val k = C(args(1))
      X(map_filter(C(args(0)), (kk, _) => !(kk <=> k)))
    }),
    "hs_concat" -> (args => {
      import org.apache.spark.sql.functions.{coalesce, map_zip_with}
      X(map_zip_with(C(args(0)), C(args(1)), (_, v1, v2) => coalesce(v2, v1)))
    }),
    // PG's name is slice(hstore, text[]); Spark's array slice builtin
    // owns that name, so the hstore form registers prefixed
    "hstore_slice" -> (args => {
      import org.apache.spark.sql.functions.{array_contains, lit, map_filter}
      val keys = litStringArray(args(1), "hstore_slice", "keys")
      X(map_filter(C(args(0)),
        (k, _) => array_contains(lit(keys.toArray), k)))
    }),
    "hstore_to_json" -> (args => {
      import org.apache.spark.sql.functions.to_json
      X(to_json(C(args.head)))
    }),

    // ---- intarray (_int.sql SQL names; arrays of any element type
    // are accepted where the kernel is generic) ----
    "icount" -> (args => {
      import org.apache.spark.sql.functions.size
      X(size(C(args.head)))
    }),
    "sort" -> (args => {
      import org.apache.spark.sql.functions.{array_sort, reverse}
      if (args.length == 2 &&
          litString(args(1), "sort", "dir").equalsIgnoreCase("desc"))
        X(reverse(array_sort(C(args(0)))))
      else X(array_sort(C(args(0))))
    }),
    "sort_asc" -> (args => {
      import org.apache.spark.sql.functions.array_sort
      X(array_sort(C(args.head)))
    }),
    "sort_desc" -> (args => {
      import org.apache.spark.sql.functions.{array_sort, reverse}
      X(reverse(array_sort(C(args.head))))
    }),
    // uniq collapses ADJACENT duplicates only (PG semantics —
    // uniq(sort(a)) is the distinct form)
    "uniq" -> (args => {
      import org.apache.spark.sql.functions._
      val a = C(args.head)
      X(filter(a, (x, i) =>
        i === 0 || !(x <=> element_at(a, i))))
    }),
    "idx" -> (args => {
      import org.apache.spark.sql.functions.{array_position, coalesce, lit}
      X(coalesce(array_position(C(args(0)), C(args(1))), lit(0L))
        .cast("int"))
    }),
    "subarray" -> (args => {
      import org.apache.spark.sql.functions.{greatest, lit, size, slice}
      val a = C(args(0))
      val start = litInt(args(1), "subarray", "start")
      if (args.length == 3)
        X(slice(a, lit(start + 1), lit(litInt(args(2), "subarray", "len"))))
      else X(slice(a, lit(start + 1), greatest(size(a) - start, lit(0))))
    }),
    "intset" -> (args => CreateArray(Seq(args.head))),

    // ---- pgcrypto PGP names (pgp-pgsql.cpp; the kernels are the
    // C86/C88-gated ones). Determinism rule as crypt/gen_salt: the
    // session-key/salt entropy derives from an explicit seed literal
    // (arg 3) — Spark re-evaluates expressions on retry ----
    "pgp_sym_encrypt" -> (args => {
      require(args.length >= 2 && args.length <= 4,
        "graft: pgp_sym_encrypt expects (data, psw[, seed[, options]])")
      val seed = if (args.length >= 3)
        Literal(litLong(args(2), "pgp_sym_encrypt", "seed")) else Literal(0L)
      val algo = if (args.length == 4)
        pgpCipher(litString(args(3), "pgp_sym_encrypt", "options")) else 7
      graft.operators.PgpEncryptExpr(args(0), args(1), seed, algo)
    }),
    "pgp_sym_decrypt" -> (args =>
      org.apache.spark.sql.catalyst.expressions.Cast(
        graft.operators.PgpDecryptExpr(args(0), args(1),
          convertCrlf = false), StringType)),
    "pgp_sym_decrypt_bytea" -> (args =>
      graft.operators.PgpDecryptExpr(args(0), args(1),
        convertCrlf = false)),
    "armor" -> (args => graft.operators.ArmorExpr(args.head)),
    "dearmor" -> (args => graft.operators.DearmorExpr(args.head)),

    // ---- uuid-ossp (RFC 4122 name-based UUIDs, hashing the NAMESPACE
    // BYTES + name bytes exactly like PG; spec-pinned against
    // independently computed RFC vectors) ----
    "uuid_generate_v3" -> (args => uuidName(
      litString(args(0), "uuid_generate_v3", "namespace"), args(1),
      v5 = false)),
    "uuid_generate_v5" -> (args => uuidName(
      litString(args(0), "uuid_generate_v5", "namespace"), args(1),
      v5 = true)),
    "uuid_ns_dns" -> (_ =>
      Literal(org.apache.spark.unsafe.types.UTF8String.fromString(
        "6ba7b810-9dad-11d1-80b4-00c04fd430c8"), StringType)),
    "uuid_ns_url" -> (_ =>
      Literal(org.apache.spark.unsafe.types.UTF8String.fromString(
        "6ba7b811-9dad-11d1-80b4-00c04fd430c8"), StringType)),

    // ---- earthdistance (earthdistance--1.x.sql: earth() = 6378168 m;
    // ll_to_earth -> a point on the sphere, earth_distance ->
    // great-circle metres) ----
    "ll_to_earth" -> (args => {
      import org.apache.spark.sql.functions._
      val lat = radians(C(args(0)).cast("double"))
      val lon = radians(C(args(1)).cast("double"))
      val r = lit(6378168.0)
      X(array(r * cos(lat) * cos(lon), r * cos(lat) * sin(lon),
        r * sin(lat)))
    }),
    "earth_distance" -> (args => {
      import org.apache.spark.sql.functions._
      val a = C(args(0)); val b = C(args(1))
      def d(i: Int) = element_at(a, i) - element_at(b, i)
      val chord = sqrt(d(1) * d(1) + d(2) * d(2) + d(3) * d(3))
      val r = lit(6378168.0)
      X(r * lit(2.0) * asin(least(chord / (lit(2.0) * r), lit(1.0))))
    })
  )
}
