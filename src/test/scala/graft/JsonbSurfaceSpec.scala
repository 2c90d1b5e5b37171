package graft

/**
 * The rest of the reference's jsonb SQL names (builtin_funcs.ini),
 * pinned through spark.sql text against PG's own documented examples
 * and the btree ordering rules of jsonb_util.cpp
 * compareJsonbSuperHeaderValue.
 */
class JsonbSurfaceSpec extends SparkSpec {

  private def one(sql: String): Any = spark.sql(sql).collect()(0).get(0)

  test("typeof and array_length") {
    assert(one("SELECT jsonb_typeof('-123.4')") == "number")
    assert(one("SELECT jsonb_typeof('null')") == "null")
    assert(one("""SELECT jsonb_typeof('{"a":1}')""") == "object")
    assert(one("SELECT jsonb_typeof('[1]')") == "array")
    assert(one("SELECT jsonb_typeof('true')") == "boolean")
    assert(one("SELECT jsonb_array_length('[1,2,3]')") == 3)
    intercept[Exception](one("""SELECT jsonb_array_length('{"a":1}')"""))
    intercept[Exception](one("SELECT jsonb_array_length('4')"))
  }

  test("PG-named getters match the operator kernels") {
    assert(one("""SELECT jsonb_object_field('{"a": {"b":"foo"}}', 'a')""") ==
      """{"b": "foo"}""")
    assert(one("""SELECT jsonb_object_field_text('{"a":"xy"}', 'a')""") == "xy")
    assert(one("SELECT jsonb_array_element('[1,2,3]', 2)") == "3")
    assert(one("SELECT jsonb_array_element_text('[1,\"b\"]', 1)") == "b")
  }

  test("set-returning trio as arrays, storage order") {
    assert(one("""SELECT array_join(jsonb_object_keys('{"f1":"abc","f2":{"f3":"a"}}'), ',')""") ==
      "f1,f2")
    assert(one("""SELECT array_join(jsonb_array_elements('[1,true,[2]]'), '|')""") ==
      "1|true|[2]")
    assert(one("""SELECT array_join(jsonb_array_elements_text('["foo","bar"]'), '|')""") ==
      "foo|bar")
    assert(one("""SELECT array_join(transform(jsonb_each('{"a":"foo","b":"bar"}'),
                 |  e -> concat(e.key, '=', e.value)), ',')""".stripMargin) ==
      """a="foo",b="bar"""")
    assert(one("""SELECT array_join(transform(jsonb_each_text('{"a":"foo","b":"bar"}'),
                 |  e -> concat(e.key, '=', e.value)), ',')""".stripMargin) ==
      "a=foo,b=bar")
    // explode() is the lateral spelling
    assert(spark.sql(
      """SELECT explode(jsonb_object_keys('{"x":1,"y":2}'))""").count() == 2)
  }

  test("btree comparison family: type ranks, counts, raw scalars") {
    assert(one("""SELECT jsonb_cmp('"a"', '1')""") == -1) // string < number
    assert(one("SELECT jsonb_cmp('1', 'true')") == -1)    // number < bool
    assert(one("""SELECT jsonb_cmp('{"a":1}', '[100]')""") == 1) // object > array
    assert(one("SELECT jsonb_cmp('[1,2]', '[3]')") == 1)  // count first
    assert(one("SELECT jsonb_cmp('1', '[1]')") == -1)     // raw scalar < array
    assert(one("SELECT jsonb_cmp('2', '10')") == -1)      // numeric, not text
    assert(one("SELECT jsonb_cmp('2.0', '2')") == 0)
    assert(one("""SELECT jsonb_eq('{"b":1,"a":2}', '{"a":2, "b":1}')""") == true)
    assert(one("""SELECT jsonb_lt('[1,2]', '[1,3]')""") == true)
    assert(one("""SELECT jsonb_ge('true', 'false')""") == true)
  }

  test("build_object / build_array render canonical jsonb") {
    assert(one("SELECT jsonb_build_object('foo', 1, 'bar', 'baz')") ==
      """{"bar": "baz", "foo": 1}""")
    assert(one("SELECT jsonb_build_array(1, 'x', true, null)") ==
      """[1, "x", true, null]""")
    intercept[Exception](one("SELECT jsonb_build_object('odd')"))
  }

  test("delete_array drops multiple keys") {
    assert(one("""SELECT jsonb_delete_array('{"a":1,"b":2,"c":3}', array('a','c'))""") ==
      """{"b": 2}""")
  }
}
