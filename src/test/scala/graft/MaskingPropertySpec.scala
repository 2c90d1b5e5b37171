package graft

import graft.functions.Unaccent
import graft.operators.Masking
import org.apache.spark.sql.functions._

/**
 * Property contracts for the masking/unaccent pack — invariants that
 * must hold for ANY input, not just the gate's constructed strings.
 * Deterministic generated corpora (seeded Random), each property
 * evaluated in ONE Spark batch (a job per sample would take minutes).
 */
class MaskingPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples(n: Int, alphabet: String, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val len = rnd.nextInt(40)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
  }

  private val Ascii = "abcXYZ0123456789@.-+ #_!"

  private def batch(in: Seq[String], c: org.apache.spark.sql.Column)
      : Seq[(String, String)] =
    in.toDF("s").select(col("s"), c.as("r"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  test("creditcardmasking: length preserved, last 4 untouched, digits before them gone") {
    batch(samples(400, Ascii, 1L), Masking.creditcardmasking(col("s")))
      .foreach { case (s, r) =>
        assert(r.length === s.length, s"length changed for '$s'")
        if (s.length >= 4) {
          assert(r.takeRight(4) === s.takeRight(4), s"tail changed for '$s'")
          assert(!r.dropRight(4).exists(ch => ch.isDigit || ch == '+'),
            s"unmasked digit in '$r'")
        } else assert(r === s)
      }
  }

  test("alldigitsmasking: idempotent, non-digits untouched, length preserved") {
    val in = samples(400, Ascii, 2L)
    val once = batch(in, Masking.alldigitsmasking(col("s"))).map(_._2)
    val twice = batch(once, Masking.alldigitsmasking(col("s"))).map(_._2)
    assert(once === twice, "must be idempotent")
    in.zip(once).foreach { case (s, r) =>
      assert(r.length === s.length)
      s.zip(r).foreach { case (a, b) =>
        if (a.isDigit || a == '+') assert(b === '0') else assert(b === a)
      }
    }
  }

  test("basicemailmasking: the domain part always survives verbatim") {
    batch(samples(400, Ascii, 3L), Masking.basicemailmasking(col("s")))
      .foreach { case (s, r) =>
        val pos = s.indexOf('@')
        if (pos > 0) {
          assert(r.substring(pos) === s.substring(pos), s"domain changed for '$s'")
          assert(r.take(pos).forall(_ == 'x'))
        } else assert(r === s)
      }
  }

  test("maskall: output is x^len for any input") {
    batch(samples(300, Ascii, 4L), Masking.maskall(col("s")))
      .foreach { case (s, r) => assert(r === "x" * s.length) }
  }

  test("regexpmasking: characters outside the window always survive") {
    val in = samples(400, Ascii, 5L)
    batch(in, Masking.regexpmasking(col("s"), "[a-z0-9]", "*", 3, 7))
      .foreach { case (s, r) =>
        val size = s.length
        val start = math.min(3, size)
        val end = if (size == 0) -1 else math.min(start + 7 - 1, size - 1)
        assert(r.take(start) === s.take(start), s"prefix changed for '$s'")
        assert(r.drop(r.length - (size - end - 1)) === s.drop(end + 1),
          s"suffix changed for '$s'")
      }
  }

  test("unaccent: idempotent, ASCII output, never shrinks") {
    val in = samples(300, "àéîõüñçßæœłøđýžš abcXYZ123.", 6L)
    val once = batch(in, Unaccent.unaccent(col("s"))).map(_._2)
    val twice = batch(once, Unaccent.unaccent(col("s"))).map(_._2)
    assert(once === twice, "unaccent must be idempotent")
    in.zip(once).foreach { case (s, r) =>
      assert(r.length >= s.length, s"'$s' shrank to '$r'")
      assert(r.forall(_ < 128), s"residual non-ASCII in '$r'")
    }
  }

  test("hilbert index is a bijection at several bit widths") {
    import graft.operators.Layout
    for (bits <- Seq(3, 5, 7)) {
      val n = 1 << bits
      val d = (0 until n * n).map(i => (i % n, i / n)).toDF("x", "y")
        .select(Layout.hilbertValue(col("x"), col("y"), bits).as("d"))
        .as[Long].collect()
      assert(d.toSet === (0L until (n.toLong * n)).toSet,
        s"not a bijection at bits=$bits")
    }
  }
}
