package graft

import graft.functions.Jsonb
import org.apache.spark.sql.functions._

/**
 * jsonb containment/existence semantics — the examples are PG's own
 * documented behaviors for `@>`/`<@`/`?`/`?|`/`?&` (jsonb_op.cpp /
 * the json-functions documentation), pinned against the generic
 * recursive walk.
 */
class JsonbSpec extends SparkSpec {
  import spark.implicits._

  private def c(target: String, query: String): Boolean =
    Seq(target).toDF("t")
      .select(Jsonb.contains(col("t"), query).as("r"))
      .as[Boolean].head()

  test("object containment is recursive on keys and values") {
    assert(c("""{"a":1,"b":2}""", """{"b":2}"""))
    assert(!c("""{"a":1,"b":2}""", """{"b":3}"""))
    assert(!c("""{"a":1}""", """{"a":1,"b":2}"""))
    assert(c("""{"a":{"b":2,"c":3}}""", """{"a":{"c":3}}"""))
    // an empty object is contained in any object
    assert(c("""{"a":{"b":2}}""", """{"a":{}}"""))
    assert(c("""{"a":1}""", "{}"))
  }

  test("array containment is order-insensitive set-style") {
    assert(c("[1,2,3]", "[3,1]"))
    assert(c("[1,2,3]", "[1,1,1]"))
    assert(c("[1,2]", "[]"))
    assert(!c("[1,2]", "[4]"))
    // nested arrays: element-wise containment, no flattening
    assert(c("[[1,2,3]]", "[[1,2]]"))
    assert(!c("[[1,2]]", "[[1,2,3]]"))
    assert(!c("[1,2]", "[[1]]"))
  }

  test("array-of-objects: every query element matches SOME target element") {
    val doc = """{"items":[{"q":5,"r":"A"},{"q":7,"r":"R"}]}"""
    assert(c(doc, """{"items":[{"q":5}]}"""))
    assert(c(doc, """{"items":[{"q":7,"r":"R"}]}"""))
    // both fields must sit on the SAME element
    assert(!c(doc, """{"items":[{"q":5,"r":"R"}]}"""))
    assert(c(doc, """{"items":[{"q":5},{"r":"R"}]}"""))
  }

  test("top-level array-contains-scalar exception, and only top-level") {
    assert(c("""["a","b"]""", "\"a\""))
    assert(c("[1,2]", "2"))
    assert(!c("""{"a":["x"]}""", """{"a":"x"}"""))
    // scalar-to-scalar containment is equality
    assert(c("\"a\"", "\"a\"") && c("1", "1") && !c("1", "2"))
  }

  test("numbers compare numerically, null is a value") {
    assert(c("""{"a":1}""", """{"a":1.0}"""))
    assert(c("""{"a":1.50}""", """{"a":1.5}"""))
    assert(!c("""{"a":1}""", """{"a":"1"}"""))
    assert(c("""{"a":null}""", """{"a":null}"""))
    assert(!c("""{"a":null}""", """{"a":1}"""))
  }

  test("containedBy is the swapped operand order") {
    val r = Seq(("""{"b":2}""", """{"a":1,"b":2}"""))
      .toDF("q", "t")
      .select(Jsonb.containedBy(col("q"), col("t")).as("r"))
      .as[Boolean].head()
    assert(r)
  }

  test("existence: object key, array string element, string scalar") {
    def e(t: String, k: String): Boolean =
      Seq(t).toDF("t").select(Jsonb.existsKey(col("t"), k).as("r"))
        .as[Boolean].head()
    assert(e("""{"a":1}""", "a") && !e("""{"a":1}""", "b"))
    assert(e("""["a","b"]""", "a") && !e("""["a"]""", "x"))
    // a non-string array element never matches
    assert(!e("[1]", "1"))
    assert(e("\"a\"", "a") && !e("\"ab\"", "a"))
    // existence is NOT containment: nested keys don't count
    assert(!e("""{"a":{"b":1}}""", "b"))
  }

  test("?| any / ?& all") {
    def any(t: String, ks: Seq[String]): Boolean =
      Seq(t).toDF("t").select(Jsonb.existsAny(col("t"), ks).as("r"))
        .as[Boolean].head()
    def all(t: String, ks: Seq[String]): Boolean =
      Seq(t).toDF("t").select(Jsonb.existsAll(col("t"), ks).as("r"))
        .as[Boolean].head()
    val d = """{"a":1,"b":2}"""
    assert(any(d, Seq("b", "z")) && !any(d, Seq("x", "z")))
    assert(all(d, Seq("a", "b")) && !all(d, Seq("a", "z")))
  }

  private def cc(a: String, b: String): String =
    Seq(a).toDF("t").select(Jsonb.concatJson(col("t"), b).as("r"))
      .as[String].head()

  test("|| concat: PG's documented shapes, canonical rendering") {
    assert(cc("""["a","b"]""", """["a","d"]""") == """["a", "b", "a", "d"]""")
    assert(cc("""{"a":"b"}""", """{"c":"d"}""") == """{"a": "b", "c": "d"}""")
    // right wins on duplicate keys
    assert(cc("""{"a":1}""", """{"a":2}""") == """{"a": 2}""")
    // non-array operands become single-element arrays
    assert(cc("""{"a":1}""", "[1]") == """[{"a": 1}, 1]""")
    assert(cc("[1,2]", "3") == "[1, 2, 3]")
    assert(cc("\"x\"", "[1]") == """["x", 1]""")
    // canonical key order: length first, then bytewise
    assert(cc("""{"b":1,"aa":2}""", "{}") == """{"b": 1, "aa": 2}""")
    assert(cc("""{"bb":1,"a":2}""", "{}") == """{"a": 2, "bb": 1}""")
  }

  test("- text deletes object keys / string array elements") {
    def dk(t: String, k: String): String =
      Seq(t).toDF("t").select(Jsonb.deleteKey(col("t"), k).as("r"))
        .as[String].head()
    assert(dk("""{"a":"b","c":"d"}""", "a") == """{"c": "d"}""")
    assert(dk("""["a","b","c","b"]""", "b") == """["a", "c"]""")
    assert(dk("""{"a":1}""", "z") == """{"a": 1}""")
    intercept[Exception](Seq("1").toDF("t")
      .select(Jsonb.deleteKey(col("t"), "a").as("r")).collect())
  }

  test("- int deletes by index, negative from the end, oob unchanged") {
    def di(t: String, i: Int): String =
      Seq(t).toDF("t").select(Jsonb.deleteIdx(col("t"), i).as("r"))
        .as[String].head()
    assert(di("""["a","b"]""", 1) == """["a"]""")
    assert(di("""["a","b"]""", -1) == """["a"]""")
    assert(di("""["a","b"]""", 5) == """["a", "b"]""")
    intercept[Exception](Seq("""{"a":1}""").toDF("t")
      .select(Jsonb.deleteIdx(col("t"), 0).as("r")).collect())
  }

  test("#- deletes at a path; missing intermediate steps are a no-op") {
    def dp(t: String, p: Seq[String]): String =
      Seq(t).toDF("t").select(Jsonb.deletePath(col("t"), p).as("r"))
        .as[String].head()
    assert(dp("""["a",{"b":1}]""", Seq("1", "b")) == """["a", {}]""")
    assert(dp("""{"a":{"b":1,"c":2}}""", Seq("a", "b")) == """{"a": {"c": 2}}""")
    assert(dp("""{"a":1}""", Seq("z", "b")) == """{"a": 1}""")
    assert(dp("""["a","b"]""", Seq("-1")) == """["a"]""")
  }

  test("jsonb_set: replace, create last step only, array out-of-range") {
    def st(t: String, p: Seq[String], v: String, cm: Boolean = true): String =
      Seq(t).toDF("t")
        .select(Jsonb.setJson(col("t"), p, lit(v), cm).as("r"))
        .as[String].head()
    assert(st("""{"a":{"b":1}}""", Seq("a", "b"), "2") == """{"a": {"b": 2}}""")
    assert(st("""{"a":{}}""", Seq("a", "n"), "5") == """{"a": {"n": 5}}""")
    // missing INTERMEDIATE step: unchanged
    assert(st("""{"a":1}""", Seq("z", "k"), "2") == """{"a": 1}""")
    // create_missing=false on an absent last step: unchanged
    assert(st("""{"a":1}""", Seq("b"), "2", cm = false) == """{"a": 1}""")
    // arrays: replace in range; out-of-range appends/prepends (PG)
    assert(st("""[1,2,3]""", Seq("1"), "9") == "[1, 9, 3]")
    assert(st("""[1,2]""", Seq("-1"), "9") == "[1, 9]")
    assert(st("""[1,2]""", Seq("9"), "7") == "[1, 2, 7]")
    assert(st("""[1,2]""", Seq("-9"), "7") == "[7, 1, 2]")
    intercept[Exception](Seq("1").toDF("t")
      .select(Jsonb.setJson(col("t"), Seq("a"), lit("2")).as("r")).collect())
  }

  test("jsonb_insert: array before/after, new object keys only") {
    def ins(t: String, p: Seq[String], v: String, after: Boolean = false): String =
      Seq(t).toDF("t")
        .select(Jsonb.insertJson(col("t"), p, lit(v), after).as("r"))
        .as[String].head()
    // PG's documented examples
    assert(ins("""{"a":[0,1,2]}""", Seq("a", "1"), "\"new_value\"") ==
      """{"a": [0, "new_value", 1, 2]}""")
    assert(ins("""{"a":[0,1,2]}""", Seq("a", "1"), "\"new_value\"", after = true) ==
      """{"a": [0, 1, "new_value", 2]}""")
    assert(ins("""{"b":1}""", Seq("c"), "2") == """{"b": 1, "c": 2}""")
    intercept[Exception](Seq("""{"b":1}""").toDF("t")
      .select(Jsonb.insertJson(col("t"), Seq("b"), lit("2")).as("r")).collect())
    // negative index, end-insert
    assert(ins("[1,2]", Seq("-1"), "9") == "[1, 9, 2]")
    assert(ins("[1,2]", Seq("-1"), "9", after = true) == "[1, 2, 9]")
  }

  test("jsonpath: lax filters, wildcards, indexes, exists, first") {
    import graft.functions.JsonPath
    def pe(t: String, p: String): Boolean =
      Seq(t).toDF("t").select(JsonPath.pathExists(col("t"), p).as("r"))
        .as[Boolean].head()
    val d = """{"a":[{"b":1},{"b":2}],"s":"x","n":5}"""
    assert(pe(d, "$.a[*] ? (@.b > 1)"))
    assert(!pe(d, "$.a[*] ? (@.b > 2)"))
    // lax mode: member access auto-unwraps the array
    assert(pe(d, "$.a ? (@.b == 2)"))
    assert(pe(d, "$.a[1].b") && !pe(d, "$.a[2]"))
    assert(pe(d, "$.a[-1] ? (@.b == 2)"))
    assert(pe(d, "$ ? (exists (@.s))") && !pe(d, "$ ? (exists (@.zz))"))
    assert(pe(d, "$.s ? (@ == \"x\")") && !pe(d, "$.s ? (@ != \"x\")"))
    // numbers compare numerically
    assert(pe(d, "$.n ? (@ == 5.0)") && pe(d, "$.n ? (@ <= 5)"))
    def first(t: String, p: String): Option[String] =
      Seq(t).toDF("t").select(JsonPath.pathQueryFirst(col("t"), p).as("r"))
        .as[Option[String]].head()
    assert(first(d, "$.a[*].b").contains("1"))
    assert(first(d, "$.a[1]").contains("""{"b": 2}"""))
    assert(first(d, "$.zz").isEmpty)
    intercept[IllegalArgumentException](JsonPath.parse("$.a ? (@.b >< 1)"))
    intercept[IllegalArgumentException](JsonPath.parse("a.b"))
  }

  test("invalid json raises") {
    val ex = intercept[Exception] {
      Seq("{nope").toDF("t")
        .select(Jsonb.contains(col("t"), "{}").as("r")).collect()
    }
    assert(ex.toString.toLowerCase.contains("json") ||
      Option(ex.getCause).exists(_.toString.toLowerCase.contains("json")))
  }
}
