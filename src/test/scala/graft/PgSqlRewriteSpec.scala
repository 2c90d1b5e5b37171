package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.PgSqlRewrite.rewrite

/**
 * The PG operator-spelling rewriter, pinned as pure string→string
 * transforms: cast targets, operand-primary scanning, left
 * associativity, the lambda/parameter-marker/string-literal guards,
 * and the never-break-standard-SQL fallback.
 */
class PgSqlRewriteSpec extends AnyFunSuite {

  // ---- casts ----

  test("graft type casts rewrite to their input parsers") {
    assert(rewrite("SELECT '[1,2]'::vector") ==
      "SELECT parse_vector('[1,2]')")
    assert(rewrite("SELECT x::halfvec") == "SELECT halfvec(parse_vector(x))")
    assert(rewrite("SELECT s::sparsevec") == "SELECT parse_sparsevec(s)")
    assert(rewrite("SELECT 'a & b'::tsquery") == "SELECT to_tsquery('a & b')")
    assert(rewrite("SELECT 'Top.Sci'::ltree") == "SELECT text2ltree('Top.Sci')")
    assert(rewrite("SELECT 'a=>1'::hstore") == "SELECT parse_hstore('a=>1')")
    assert(rewrite("SELECT '{1,2}'::int[]") == "SELECT parse_int_array('{1,2}')")
    assert(rewrite("SELECT '{1,2}'::integer[]") == "SELECT parse_int_array('{1,2}')")
  }

  test("identity casts strip; PG scalar names map onto CAST") {
    assert(rewrite("SELECT j::jsonb") == "SELECT jsonb_norm(j)")
    assert(rewrite("SELECT j::json") == "SELECT j")
    assert(rewrite("SELECT q::query_int") == "SELECT q")
    assert(rewrite("SELECT '{a,b}'::text[]") == "SELECT '{a,b}'")
    assert(rewrite("SELECT c::regconfig") == "SELECT c")
    assert(rewrite("SELECT x::text") == "SELECT cast(x as string)")
    assert(rewrite("SELECT 1::int8") == "SELECT cast(1 as bigint)")
    assert(rewrite("SELECT 1::float8") == "SELECT cast(1 as double)")
    assert(rewrite("SELECT x::double precision") == "SELECT cast(x as double)")
    assert(rewrite("SELECT 't'::bool") == "SELECT cast('t' as boolean)")
  }

  test("bytea: the PG hex literal goes through unhex") {
    assert(rewrite("SELECT '\\xDEAD'::bytea") == "SELECT unhex('DEAD')")
    assert(rewrite("SELECT col::bytea") == "SELECT cast(col as binary)")
  }

  test("Spark-native casts are left for Spark") {
    assert(rewrite("SELECT x::int") == "SELECT x::int")
    assert(rewrite("SELECT x::decimal(5,2)") == "SELECT x::decimal(5,2)")
    assert(rewrite("SELECT x::timestamp") == "SELECT x::timestamp")
  }

  test("casts chain and bind tighter than operators") {
    assert(rewrite("SELECT x::text::jsonb") ==
      "SELECT jsonb_norm(cast(x as string))")
    assert(rewrite("SELECT a::int <-> b") ==
      "SELECT pg_dist_arrow(a::int, b)")
    assert(rewrite("SELECT emb <-> '[1,2]'::vector") ==
      "SELECT pg_dist_arrow(emb, parse_vector('[1,2]'))")
  }

  // ---- operators ----

  test("vector / trgm distance operators") {
    assert(rewrite("SELECT a <-> b") == "SELECT pg_dist_arrow(a, b)")
    assert(rewrite("SELECT a <#> b") == "SELECT negative_inner_product(a, b)")
    assert(rewrite("SELECT a <=> b") == "SELECT pg_cosine_or_eq(a, b)")
    assert(rewrite("SELECT a <-> b <-> c") ==
      "SELECT pg_dist_arrow(pg_dist_arrow(a, b), c)")
  }

  test("text-search match") {
    assert(rewrite("SELECT t @@ 'cat & dog'::tsquery FROM d") ==
      "SELECT pg_ts_match(t, to_tsquery('cat & dog')) FROM d")
    assert(rewrite("WHERE to_tsvector(body) @@ to_tsquery('x')") ==
      "WHERE pg_ts_match(to_tsvector(body), to_tsquery('x'))")
  }

  test("jsonb getters chain left-associative") {
    assert(rewrite("SELECT j -> 'a'") == "SELECT pg_arrow_get(j, 'a')")
    assert(rewrite("SELECT j -> 'a' ->> 'b'") ==
      "SELECT pg_arrow_get_text(pg_arrow_get(j, 'a'), 'b')")
    assert(rewrite("SELECT j -> 2") == "SELECT pg_arrow_get(j, 2)")
    assert(rewrite("SELECT j -> -1") == "SELECT pg_arrow_get(j, -1)")
    assert(rewrite("SELECT t.j -> 'a' FROM x t") ==
      "SELECT pg_arrow_get(t.j, 'a') FROM x t")
    assert(rewrite("SELECT j #> '{a,b}'") == "SELECT pg_path_get(j, '{a,b}')")
    assert(rewrite("SELECT j #>> '{a,1}'") ==
      "SELECT pg_path_get_text(j, '{a,1}')")
  }

  test("existence and containment") {
    assert(rewrite("WHERE j ? 'k'") == "WHERE pg_key_exists(j, 'k')")
    // PG's bracketed ARRAY constructor becomes Spark's array(...)
    assert(rewrite("WHERE j ?| array['a','b']") ==
      "WHERE pg_key_exists_any(j, array('a','b'))")
    assert(rewrite("WHERE j ?& ARRAY['a','b']") ==
      "WHERE pg_key_exists_all(j, ARRAY('a','b'))")
    assert(rewrite("WHERE a @> b") == "WHERE pg_contains(a, b)")
    assert(rewrite("WHERE a <@ b AND x = 1") ==
      "WHERE pg_contains(b, a) AND x = 1")
    assert(rewrite("WHERE xs && ys") == "WHERE pg_overlap(xs, ys)")
  }

  test("delete and concat operators") {
    assert(rewrite("SELECT j - 'a'") == "SELECT pg_minus(j, 'a')")
    assert(rewrite("SELECT j #- '{a,b}'") ==
      "SELECT jsonb_delete_path(j, '{a,b}')")
    // arithmetic and date-shaped strings stay subtraction
    assert(rewrite("SELECT a - b") == "SELECT a - b")
    assert(rewrite("SELECT a - 3") == "SELECT a - 3")
    assert(rewrite("SELECT a - '2020-01-01'") == "SELECT a - '2020-01-01'")
    // || dispatches only on a cast-marked operand
    assert(rewrite("SELECT d::jsonb || e") ==
      "SELECT jsonb_concat(jsonb_norm(d), e)")
    assert(rewrite("SELECT h::hstore || e") ==
      "SELECT hs_concat(parse_hstore(h), e)")
    assert(rewrite("SELECT a || b") == "SELECT a || b")
  }

  test("intarray arithmetic and ltree concat, marker-guarded") {
    assert(rewrite("SELECT a::int[] + b::int[]") ==
      "SELECT pg_plus(parse_int_array(a), parse_int_array(b))")
    assert(rewrite("SELECT a::int[] - '{3}'::int[]") ==
      "SELECT pg_minus(parse_int_array(a), parse_int_array('{3}'))")
    assert(rewrite("SELECT a::int[] | b::int[]") ==
      "SELECT _int_union(parse_int_array(a), parse_int_array(b))")
    assert(rewrite("SELECT a::int[] & b::int[]") ==
      "SELECT _int_inter(parse_int_array(a), parse_int_array(b))")
    assert(rewrite("SELECT 'a.b'::ltree || 'c'") ==
      "SELECT ltree_concat(text2ltree('a.b'), 'c')")
    // unmarked arithmetic is untouched
    for (q <- Seq("SELECT a + b", "SELECT a - b", "SELECT a | b",
        "SELECT a & b")) assert(rewrite(q) == q)
  }

  test("tsquery algebra and tsvector concat operators") {
    assert(rewrite("SELECT 'a'::tsquery || 'b'::tsquery") ==
      "SELECT tsquery_or(to_tsquery('a'), to_tsquery('b'))")
    assert(rewrite("SELECT 'a'::tsquery && 'b & c'::tsquery") ==
      "SELECT tsquery_and(to_tsquery('a'), to_tsquery('b & c'))")
    assert(rewrite("SELECT !! 'a'::tsquery") ==
      "SELECT tsquery_not(to_tsquery('a'))")
    assert(rewrite("SELECT t @@@ 'q'::tsquery FROM d") ==
      "SELECT pg_ts_match(t, to_tsquery('q')) FROM d")
    assert(rewrite("SELECT 'a:1'::tsvector || 'b:1'::tsvector") ==
      "SELECT tsvector_concat(parse_tsvector('a:1'), parse_tsvector('b:1'))")
    // unmarked || and binary ! stay untouched
    assert(rewrite("SELECT a || b") == "SELECT a || b")
  }

  test("trgm % threshold and jsonpath @? operators") {
    assert(rewrite("WHERE name % 'smith'") ==
      "WHERE (similarity(name, 'smith') >= 0.3)")
    assert(rewrite("WHERE 'smith' % name") ==
      "WHERE (similarity('smith', name) >= 0.3)")
    // numeric operands keep Spark's modulo
    assert(rewrite("SELECT k % 5") == "SELECT k % 5")
    assert(rewrite("SELECT k % '5'") == "SELECT k % '5'")
    assert(rewrite("WHERE j @? '$.a'") == "WHERE jsonb_path_exists(j, '$.a')")
  }

  test("@@ doubles as the intarray query_int match") {
    assert(rewrite("SELECT ia @@ '7&(2|3)'::query_int") ==
      "SELECT pg_ts_match(ia, '7&(2|3)')")
  }

  test("regex operators") {
    assert(rewrite("WHERE t ~ 'mas'") == "WHERE pg_tilde(t, 'mas')")
    assert(rewrite("WHERE t ~* 'mas'") ==
      "WHERE regexp_like(t, concat('(?i)', 'mas'))")
    assert(rewrite("WHERE t !~ 'mas'") == "WHERE (not regexp_like(t, 'mas'))")
    assert(rewrite("WHERE t !~* p") ==
      "WHERE (not regexp_like(t, concat('(?i)', p)))")
  }

  test("operand shapes: calls, parens, subscripts, signed numbers") {
    assert(rewrite("SELECT f(x) <-> g(y, 1)") ==
      "SELECT pg_dist_arrow(f(x), g(y, 1))")
    assert(rewrite("SELECT (a + b) <-> c") == "SELECT pg_dist_arrow((a + b), c)")
    assert(rewrite("SELECT m['k'] -> 'a'") == "SELECT pg_arrow_get(m['k'], 'a')")
    assert(rewrite("SELECT j -> +2") == "SELECT pg_arrow_get(j, +2)")
  }

  // ---- guards ----

  test("higher-order lambdas keep their arrows") {
    val l1 = "SELECT transform(xs, x -> x + 1)"
    assert(rewrite(l1) == l1)
    val l2 = "SELECT aggregate(xs, 0, (acc, x) -> acc + x)"
    assert(rewrite(l2) == l2)
    val l3 = "SELECT filter(xs, e -> e > 2)"
    assert(rewrite(l3) == l3)
    // ...but a jsonb arrow INSIDE a lambda body still rewrites
    assert(rewrite("SELECT transform(xs, x -> x -> 'k')") ==
      "SELECT transform(xs, x -> pg_arrow_get(x, 'k'))")
  }

  test("parameter markers and bare ? stay untouched") {
    assert(rewrite("SELECT * FROM t WHERE x = ?") ==
      "SELECT * FROM t WHERE x = ?")
    assert(rewrite("SELECT ?") == "SELECT ?")
  }

  test("strings, comments, and standard operators are inert") {
    assert(rewrite("SELECT 'a <-> b'") == "SELECT 'a <-> b'")
    assert(rewrite("SELECT x -- j -> 'a'\nFROM t") ==
      "SELECT x -- j -> 'a'\nFROM t")
    assert(rewrite("SELECT /* a @> b */ x") == "SELECT /* a @> b */ x")
    for (q <- Seq("SELECT a <= b", "SELECT a >= b", "SELECT a <> b",
        "SELECT a != b", "SELECT a || b", "SELECT 1 << 2",
        "SELECT * FROM a JOIN b ON a.k = b.k WHERE a.x > 0"))
      assert(rewrite(q) == q)
  }

  test("dollar-quoted strings become standard literals") {
    assert(rewrite("SELECT $$it's$$") == "SELECT 'it\\'s'")
    assert(rewrite("SELECT $tag$a$b$tag$") == "SELECT 'a$b'")
  }

  test("broken SQL falls back to the original text") {
    val bad = "SELECT 'unterminated"
    assert(rewrite(bad) == bad)
  }

  test("whitespace outside rewritten spans is preserved") {
    assert(rewrite("SELECT  a,\n  b\nFROM t") == "SELECT  a,\n  b\nFROM t")
    assert(rewrite("SELECT j  ->  'a'  FROM t") ==
      "SELECT pg_arrow_get(j, 'a')  FROM t")
  }
}
