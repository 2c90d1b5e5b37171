package graft.functions

import scala.util.control.NonFatal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, EqualNullSafe, Expression, Literal, Subtract, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Dispatch targets for the PG OPERATOR spellings (`<->`, `<=>`,
 * `@>`, `<@`, `->`, `->>`, `#>`, `#>>`, `?`, `?|`, `?&`, `&&`) that
 * [[graft.plans.PgSqlRewrite]] rewrites into function calls. PG
 * resolves each operator by the STATIC types of its operands
 * (pg_operator.h); here the registry builder sees the resolved
 * Catalyst children (analysis resolves arguments before functions),
 * so the same static dispatch happens at plan time — zero runtime
 * cost, and each branch reuses the existing kernel (with its own
 * codegen) unchanged.
 *
 * Literal-shape tie-break: jsonb and ltree are both string-typed
 * here, so `@>` between strings dispatches by the literal operand —
 * a value that parses as JSON is jsonb containment; a dotted
 * label path is ltree ancestry (PG separates them via the column's
 * declared type, which parquet does not carry).
 */
object PgOps {

  private def C(e: Expression): Column = Bridge.column(e)
  private def X(c: Column): Expression = Bridge.toCatalyst(c)

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** sparsevec shape: struct(indices, values, dim) — parse_sparsevec's
    * output (sparsevec_in, datavec sql 0.7.2:763). */
  private def isSparseStruct(t: DataType): Boolean = t match {
    case s: StructType =>
      s.fieldNames.count(n => n == "indices" || n == "values") == 2
    case _ => false
  }

  @scala.annotation.tailrec
  private def litStr(e: Expression): Option[String] = e match {
    case Literal(s: UTF8String, StringType) if s != null => Some(s.toString)
    // `'Top'::ltree` arrives as Cast(literal) — text2ltree is a cast
    case c: Cast if c.dataType == StringType => litStr(c.child)
    case _ => None
  }

  private def isJsonLit(s: String): Boolean =
    try { Jsonb.parse(UTF8String.fromString(s)); true }
    catch { case NonFatal(_) => false }

  private def looksLtree(s: String): Boolean =
    s.nonEmpty && s.split("\\.", -1).forall(_.matches("[A-Za-z0-9_]+"))

  private def argTypes(args: Seq[Expression]): String =
    args.map(_.dataType.sql).mkString("(", ", ", ")")

  val all: Map[String, Seq[Expression] => Expression] = Map(

    // ---- a <-> b : l2 distance (vector/sparsevec) / trgm (text) ----
    "pg_dist_arrow" -> (args => (args(0).dataType, args(1).dataType) match {
      case (l, r) if isFloatArray(l) || isFloatArray(r) =>
        SqlFunctions.all("l2_distance")(args)
      case (l, r) if isSparseStruct(l) && isSparseStruct(r) =>
        SqlFunctions.all("l2_distance")(args) // sparse-aware dispatch
      case (StringType, StringType) =>
        Subtract(Literal(1.0d),
          Cast(SqlFunctions.all("similarity")(args), DoubleType))
      case _ => throw new IllegalArgumentException(
        s"graft: <-> needs vector, sparsevec or text operands, got ${argTypes(args)}")
    }),

    // ---- a <=> b : cosine distance on vectors/sparsevecs, else
    //      Spark's own null-safe equality (a spelling collision PG
    //      never has) ----
    "pg_cosine_or_eq" -> (args =>
      if (isFloatArray(args(0).dataType) || isFloatArray(args(1).dataType) ||
          (isSparseStruct(args(0).dataType) && isSparseStruct(args(1).dataType)))
        SqlFunctions.all("cosine_distance")(args)
      else EqualNullSafe(args(0), args(1))),

    // ---- a @> b / b <@ a : containment ----
    "pg_contains" -> (args => (args(0).dataType, args(1).dataType) match {
      case (StringType, StringType) =>
        val lit = litStr(args(1)).orElse(litStr(args(0)))
        lit match {
          case Some(s) if !isJsonLit(s) && looksLtree(s) =>
            SqlTextSearch.all("ltree_isparent")(args)
          case _ => JsonbContains(args(0), args(1))
        }
      case (ArrayType(_, _), ArrayType(_, _)) =>
        import org.apache.spark.sql.functions.{array_contains, forall}
        X(forall(C(args(1)), x => array_contains(C(args(0)), x)))
      case (MapType(_, _, _), MapType(_, _, _)) =>
        import org.apache.spark.sql.functions.{element_at, forall, map_contains_key, map_keys}
        val l = C(args(0)); val r = C(args(1))
        X(forall(map_keys(r), k =>
          map_contains_key(l, k) && (element_at(l, k) <=> element_at(r, k))))
      case _ => throw new IllegalArgumentException(
        s"graft: @> needs jsonb/ltree/array/hstore operands, got ${argTypes(args)}")
    }),

    // ---- j -> k / j ->> k : field, element, hstore fetch ----
    "pg_arrow_get" -> (args => args(0).dataType match {
      case MapType(_, _, _) =>
        X(org.apache.spark.sql.functions.element_at(C(args(0)), C(args(1))))
      case StringType => JsonbGet(args(0), args(1), text = false)
      case other => throw new IllegalArgumentException(
        s"graft: -> needs a jsonb or hstore left operand, got ${other.sql}")
    }),
    "pg_arrow_get_text" -> (args => args(0).dataType match {
      case MapType(_, _, _) =>
        X(org.apache.spark.sql.functions.element_at(C(args(0)), C(args(1))))
      case StringType => JsonbGet(args(0), args(1), text = true)
      case other => throw new IllegalArgumentException(
        s"graft: ->> needs a jsonb or hstore left operand, got ${other.sql}")
    }),

    // ---- j #> '{a,2}' / j #>> '{a,2}' ----
    "pg_path_get" -> (args =>
      JsonbGetPath(args(0), SqlContrib.pathOf(args(1), "#>"), text = false)),
    "pg_path_get_text" -> (args =>
      JsonbGetPath(args(0), SqlContrib.pathOf(args(1), "#>>"), text = true)),
    // the PG named forms: jsonb_extract_path(j, 'a', '2'[, ...])
    "jsonb_extract_path" -> (args =>
      JsonbGetPath(args.head,
        args.tail.map(SqlContrib.litStringOf(_, "jsonb_extract_path")),
        text = false)),
    "jsonb_extract_path_text" -> (args =>
      JsonbGetPath(args.head,
        args.tail.map(SqlContrib.litStringOf(_, "jsonb_extract_path_text")),
        text = true)),

    // ---- ? / ?| / ?& : key existence ----
    "pg_key_exists" -> (args => args(0).dataType match {
      case MapType(_, _, _) =>
        X(org.apache.spark.sql.functions.map_contains_key(C(args(0)), C(args(1))))
      case StringType =>
        JsonbExists(args(0),
          Seq(SqlContrib.litStringOf(args(1), "?")), all = false)
      case other => throw new IllegalArgumentException(
        s"graft: ? needs a jsonb or hstore left operand, got ${other.sql}")
    }),
    "pg_key_exists_any" -> (args => keyExists(args, all = false)),
    "pg_key_exists_all" -> (args => keyExists(args, all = true)),

    // ---- a && b : overlap (intarray/arrays) ----
    "pg_overlap" -> (args => (args(0).dataType, args(1).dataType) match {
      case (ArrayType(_, _), ArrayType(_, _)) =>
        X(org.apache.spark.sql.functions.arrays_overlap(C(args(0)), C(args(1))))
      case _ => throw new IllegalArgumentException(
        s"graft: && needs array operands, got ${argTypes(args)}")
    }),

    // ---- a @@ q : text-search match, or intarray query_int ----
    "pg_ts_match" -> (args => (args(0).dataType, args(1).dataType) match {
      case (ArrayType(IntegerType, _), _) =>
        X(graft.operators.IntArrays.queryIntMatch(C(args(0)),
          SqlContrib.litStringOf(args(1), "@@ query_int")))
      case (_, ArrayType(IntegerType, _)) =>
        X(graft.operators.IntArrays.queryIntMatch(C(args(1)),
          SqlContrib.litStringOf(args(0), "@@ query_int")))
      case _ => SqlTextSearch.all("ts_match")(args)
    }),

    // ---- a - b : jsonb / hstore key delete, intarray difference ----
    // intarray semantics (_int_op.cpp): `-` removes ALL occurrences
    // of the right side's elements but keeps the left's duplicates,
    // so these are filters, not array_except (which dedups)
    "pg_minus" -> (args => (args(0).dataType, args(1).dataType) match {
      case (MapType(_, _, _), _) => SqlContrib.all("delete")(args)
      case (ArrayType(_, _), ArrayType(_, _)) =>
        import org.apache.spark.sql.functions.{array_contains, filter}
        X(filter(C(args(0)), x => !array_contains(C(args(1)), x)))
      case (ArrayType(_, _), _) =>
        import org.apache.spark.sql.functions.filter
        X(filter(C(args(0)), x => !(x <=> C(args(1)))))
      case (StringType, _) => SqlContrib.all("jsonb_delete")(args)
      case (other, _) => throw new IllegalArgumentException(
        s"graft: - needs a jsonb, hstore or int[] left operand, got ${other.sql}")
    }),

    // ---- intarray + | & (contrib/intarray _int.sql operator table):
    // + concatenates / appends (keeps duplicates), | is the sorted
    // distinct union, & the sorted distinct intersection ----
    "pg_plus" -> (args => (args(0).dataType, args(1).dataType) match {
      case (ArrayType(_, _), ArrayType(_, _)) =>
        import org.apache.spark.sql.functions.concat
        X(concat(C(args(0)), C(args(1))))
      case (ArrayType(_, _), _) =>
        import org.apache.spark.sql.functions.array_append
        X(array_append(C(args(0)), C(args(1))))
      case _ => throw new IllegalArgumentException(
        s"graft: + needs an int[] left operand, got ${argTypes(args)}")
    }),
    "_int_union" -> (args => {
      import org.apache.spark.sql.functions.{array_distinct, array_sort, concat}
      X(array_sort(array_distinct(concat(C(args(0)), C(args(1))))))
    }),
    "_int_inter" -> (args => {
      import org.apache.spark.sql.functions.{array_intersect, array_sort}
      X(array_sort(array_intersect(C(args(0)), C(args(1)))))
    }),

    // ---- ltree || ltree : path concatenation ----
    "ltree_concat" -> (args => {
      import org.apache.spark.sql.functions.{concat, length, lit, when}
      val l = C(args(0)); val r = C(args(1))
      X(when(length(l) === 0, r).when(length(r) === 0, l)
        .otherwise(concat(l, lit("."), r)))
    }),

    // ---- a ~ b : POSIX regex (regexp.c), falling back to the ltree
    //      lquery match when the literal is not a valid regex — PG
    //      separates `text ~ text` from `ltree ~ lquery` by static
    //      type; here both are strings, and real lqueries
    //      ('*.Science.*') are invalid Java regexes (dangling
    //      quantifiers), so the compile test recovers the dispatch ----
    "pg_tilde" -> (args => {
      val fallback = litStr(args(1)).flatMap { s =>
        val regexOk =
          try { java.util.regex.Pattern.compile(s); true }
          catch { case _: java.util.regex.PatternSyntaxException => false }
        if (regexOk) None
        else Some(SqlTextSearch.all("lquery_match")(args))
      }
      fallback.getOrElse(
        org.apache.spark.sql.catalyst.expressions.RLike(args(0), args(1)))
    }),

    // ---- the `::jsonb` cast canonicalizes, like jsonb_in ----
    "jsonb_norm" -> (args => JsonbNorm(args.head)),

    // ---- the `::tsvector` cast: tsvector_in literal syntax ----
    "parse_tsvector" -> (args => ParseTsVector(args.head)),

    // ---- PG literal input parsers (the `::hstore` / `::int[]` casts) ----
    "parse_hstore" -> (args => ParseHstore(args.head)),
    "parse_int_array" -> (args => {
      import org.apache.spark.sql.functions._
      val inner = trim(regexp_replace(C(args.head), "^\\{|\\}$", ""))
      X(when(length(inner) === 0,
          array().cast(ArrayType(IntegerType)))
        .otherwise(transform(split(inner, ","),
          x => trim(x).cast(IntegerType))))
    })
  )

  private def keyExists(args: Seq[Expression], all: Boolean): Expression =
    args(0).dataType match {
      case MapType(_, _, _) =>
        import org.apache.spark.sql.functions.{exists, forall, map_contains_key}
        val l = C(args(0))
        val test = (k: Column) => map_contains_key(l, k)
        X(if (all) forall(C(args(1)), test) else exists(C(args(1)), test))
      case StringType =>
        val name = if (all) "jsonb_exists_all" else "jsonb_exists_any"
        SqlContrib.all(name)(args)
      case other => throw new IllegalArgumentException(
        s"graft: ?|/?& need a jsonb or hstore left operand, got ${other.sql}")
    }
}

/**
 * hstore text input — PG's `'a=>1, "k w"=>NULL'::hstore` literal
 * syntax (contrib/hstore hstore_io.c hstore_in): comma-separated
 * `key => value` pairs; either side may be double-quoted (backslash
 * escapes inside); unquoted tokens are whitespace-trimmed; an
 * UNQUOTED case-insensitive NULL is the SQL null value (quoted
 * "NULL" is the string). Duplicate keys keep one entry (PG leaves
 * which unspecified; this keeps the last).
 */
case class ParseHstore(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = true)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"parse_hstore needs a string operand, got ${child.dataType.sql}")
  override def prettyName: String = "parse_hstore"

  def eval1(in: UTF8String): ArrayBasedMapData = {
    val s = in.toString
    val entries = new java.util.LinkedHashMap[String, String]()
    var i = 0
    def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def token(stopAtArrow: Boolean): (String, Boolean) = {
      skipWs()
      if (i < s.length && s.charAt(i) == '"') {
        i += 1
        val sb = new StringBuilder
        while (i < s.length && s.charAt(i) != '"') {
          if (s.charAt(i) == '\\' && i + 1 < s.length) i += 1
          sb.append(s.charAt(i)); i += 1
        }
        if (i >= s.length) throw new IllegalArgumentException(
          s"graft: parse_hstore: unterminated quoted token in '$s'")
        i += 1
        (sb.toString, true)
      } else {
        val start = i
        while (i < s.length && s.charAt(i) != ',' &&
               !(stopAtArrow && s.charAt(i) == '=' &&
                 i + 1 < s.length && s.charAt(i + 1) == '>')) i += 1
        (s.substring(start, i).trim, false)
      }
    }
    while ({ skipWs(); i < s.length }) {
      val (k, _) = token(stopAtArrow = true)
      skipWs()
      if (i + 1 >= s.length || s.charAt(i) != '=' || s.charAt(i + 1) != '>')
        throw new IllegalArgumentException(
          s"graft: parse_hstore: expected => after key '$k' in '$s'")
      i += 2
      val (v, quoted) = token(stopAtArrow = false)
      entries.put(k,
        if (!quoted && v.equalsIgnoreCase("null")) null else v)
      skipWs()
      if (i < s.length) {
        if (s.charAt(i) != ',') throw new IllegalArgumentException(
          s"graft: parse_hstore: expected , at position $i in '$s'")
        i += 1
      }
    }
    val ks = new Array[Any](entries.size)
    val vs = new Array[Any](entries.size)
    val it = entries.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      ks(j) = UTF8String.fromString(e.getKey)
      vs(j) = if (e.getValue == null) null else UTF8String.fromString(e.getValue)
      j += 1
    }
    ArrayBasedMapData(ks, vs)
  }

  override def nullSafeEval(a: Any): Any = eval1(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("parseHstore", this, classOf[ParseHstore].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.eval1($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
