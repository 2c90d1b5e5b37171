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
}
