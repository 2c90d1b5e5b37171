package graft

import graft.functions.HalfFloat
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-based checks of the numeric kernels — pure JVM logic, no
 * Spark session needed, so these run wide (hundreds of generated
 * cases per property) and fast. Raw ScalaCheck API (scalatestplus is
 * not in the offline dependency set).
 */
class KernelPropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val finiteFloat: Gen[Float] =
    Gen.chooseNum(-3.4e38f, 3.4e38f).suchThat(java.lang.Float.isFinite(_))

  test("fp16 round-trip is idempotent (grid values are fixed points)") {
    check("fp16-idempotent", Prop.forAll(finiteFloat) { f =>
      val once = HalfFloat.toFloat(HalfFloat.fromFloat(f))
      val twice = HalfFloat.toFloat(HalfFloat.fromFloat(once))
      java.lang.Float.floatToIntBits(once) == java.lang.Float.floatToIntBits(twice)
    })
  }

  test("fp16 rounding error is within half the local grid spacing") {
    check("fp16-halfulp", Prop.forAll(Gen.chooseNum(-60000f, 60000f)) { f =>
      val q = HalfFloat.toFloat(HalfFloat.fromFloat(f)).toDouble
      val ulp = math.max(math.abs(f.toDouble) / 1024.0, math.pow(2, -24))
      math.abs(q - f.toDouble) <= ulp * 0.5 + 1e-12
    })
  }

  test("fp16 quantization is monotone") {
    check("fp16-monotone", Prop.forAll(
      Gen.chooseNum(-60000f, 60000f), Gen.chooseNum(-60000f, 60000f)) { (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      HalfFloat.toFloat(HalfFloat.fromFloat(lo)) <=
        HalfFloat.toFloat(HalfFloat.fromFloat(hi))
    })
  }

  test("float text round trip: parseFloat(toString(f)) == f") {
    // the property VectorToString/ParseVector rely on for the vec_io law
    check("float-roundtrip", Prop.forAll(finiteFloat) { f =>
      java.lang.Float.parseFloat(f.toString) == f
    })
  }

  test("rolling hash is a proper residue and deterministic") {
    def h(s: String): Long = {
      var acc = 0L
      s.codePoints().forEach(cp => acc = (acc * 31 + cp) % 1000000007L)
      acc
    }
    check("rolling-hash", Prop.forAll(Gen.asciiPrintableStr) { s =>
      val v = h(s)
      v >= 0 && v < 1000000007L && v == h(s)
    })
  }

  // ---- PQ kernel (pure JVM: encode/table math, no Spark) ----

  test("pq encode picks the argmin centroid; adc of own centroid is exact") {
    val gen = for {
      seed <- Gen.chooseNum(0L, 1000L)
    } yield {
      val rnd = new scala.util.Random(seed)
      val m = 4; val k = 8; val subDim = 4
      val books = Array.fill(m, k, subDim)(rnd.nextFloat() * 2 - 1)
      val v = Array.fill(m * subDim)(rnd.nextFloat() * 2 - 1)
      (graft.operators.Pq.Model(books), v)
    }
    check("pq-argmin", Prop.forAll(gen) { case (model, v) =>
      val code = model.encodeOne(v)
      val table = model.adcTable(v)
      // the chosen centroid's table entry is the minimum of its row
      // (ties excluded by construction of random floats)
      code.indices.forall { s =>
        val row = table(s)
        row(code(s) & 0xff) == row.min
      }
    })
  }

  private val ident: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (h :: t).mkString

  // SQL-ish fragments: code tokens, literals with doubled quotes,
  // line/block comments, parens
  private val sqlFragment: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> ident,
    3 -> Gen.oneOf(" ", "\n", "(", ")", ",", "=", "<", "."),
    2 -> ident.map(w => s"'$w''x'"),
    1 -> ident.map(w => s"-- $w ) union (\n"),
    1 -> ident.map(w => s"/* $w ) union */"),
    1 -> ident.map(w => s""""$w""""),
    1 -> ident.map(w => s"`$w`"))).map(_.mkString(" "))

  test("replaceIdent is identity when the target is absent or equal") {
    import graft.operators.RecursiveSql.{countRefs, replaceIdent}
    check("replace-identity", Prop.forAll(sqlFragment, ident) { (s, name) =>
      replaceIdent(s, name, name) == s &&
        (countRefs(s, name) > 0 || replaceIdent(s, name, name + "_z") == s)
    })
  }

  test("replaceIdent eliminates every code-region reference") {
    import graft.operators.RecursiveSql.{countRefs, replaceIdent}
    check("replace-complete", Prop.forAll(sqlFragment, ident) { (s, name) =>
      // a fresh target that cannot collide with generated idents
      // (length 6 + suffix) nor swallow neighbours
      val to = name + "_graft9"
      countRefs(replaceIdent(s, name, to), name) == 0
    })
  }

  test("countRefs never counts occurrences inside literals or comments") {
    import graft.operators.RecursiveSql.countRefs
    check("refs-noncode", Prop.forAll(ident) { name =>
      val s = s"'$name' \"$name\" `$name` -- $name\n /* $name */ '$name''$name'"
      countRefs(s, name) == 0
    })
  }
}
