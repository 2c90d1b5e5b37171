package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass hash expressions for the dedup family. The higher-order-
 * function formulations (transform/aggregate lambdas) are interpreted
 * per element by Spark; at 64 hashes × hundreds of shingles per doc that
 * dominated the benchmark, so these run the loops in compiled code
 * (reference semantics: MinHash/SimHash as in the standard near-dup
 * literature; hashing reuses Spark's XXH64 with the builtin seed).
 */

/** xxhash64 of each string element (same values as the builtin xxhash64). */
case class HashShingles(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hash_shingles"
  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
         |    $a.getUTF8String($i), org.apache.spark.sql.types.DataTypes.StringType, 42L);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Fused shingle pipeline: text → lower-case → split on single spaces →
 * distinct w-gram strings → xxhash64 of each, in one compiled pass.
 * Same values as HashShingles(Dedup.shingles(text)) — lowercasing uses
 * UTF8String.toLowerCase (the builtin `lower`), split keeps empty
 * tokens (Java split limit -1, like the builtin `split`), distinct
 * preserves first-occurrence order (like array_distinct; dedup runs on
 * the hash, which differs from string-distinct only on a 64-bit
 * collision inside one doc — probability ~n²/2^64, negligible).
 *
 * The HOF formulation (transform(sequence(...), concat_ws∘element_at))
 * evaluates an interpreted lambda per shingle; measured ~10s for a
 * 5000-doc corpus vs <0.3s compiled.
 */
case class WordShingleHashes(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(w >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingle_hashes"
  override def nullSafeEval(a: Any): Any = {
    val toks = a.asInstanceOf[UTF8String].toLowerCase.toString.split(" ", -1)
    val n = toks.length - w + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long](n * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * MinHash signature over pre-hashed shingles: min_j of (a_j*h + b_j) mod
 * 2^31-1 per hash function. Params derive from `seed` exactly like
 * graft.operators.Dedup.minhashSignature.
 */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  @transient private lazy val params: Array[(Long, Long)] = {
    val p = 2147483647L
    val rnd = new scala.util.Random(seed)
    Array.fill(numHashes)((math.abs(rnd.nextLong()) % (p - 1) + 1,
      math.abs(rnd.nextLong()) % p))
  }

  override def nullSafeEval(a: Any): Any = {
    val p = 2147483647L
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h0 = arr.getLong(i)
      // same value as SQL pmod(h, p): sign-safe modulo
      val h = ((h0 % p) + p) % p
      var j = 0
      while (j < numHashes) {
        val v = (params(j)._1 * h + params(j)._2) % p
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    if (n == 0) new GenericArrayData(Array.fill(numHashes)(0L))
    else new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash over string tokens, packed into one long. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) >= 0) out |= (1L << j)
      j += 1
    }
    out
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Polynomial rolling-hash fingerprint: h = (h*31 + codepoint) mod 1e9+7
 * over the string's characters — single compiled pass, same values as
 * the SQL list_reduce/ord oracle (TextSuite.text_fingerprint).
 */
case class RollingHash(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"
  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Pack an fp32 vector into fp16 bytes (2 per element, little-endian) —
 * the storage layout of the reference's halfvec type
 * (contrib/datavec/src/halfvec.cpp): half the bytes of fp32 on disk.
 */
case class PackHalf(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pack_half"
  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val h = HalfFloat.fromFloat(arr.getFloat(i))
      out(2 * i) = (h & 0xff).toByte
      out(2 * i + 1) = ((h >> 8) & 0xff).toByte
      i += 1
    }
    out
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Decode a packed-fp16 binary column back to array<float> (exact:
 * every binary16 value is representable in fp32) — the read side of
 * the halfvec column codec. unpack_half(pack_half(v)) equals the
 * fp16 round-trip of v.
 */
case class UnpackHalf(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unpack_half"
  override def nullSafeEval(a: Any): Any = {
    val bytes = a.asInstanceOf[Array[Byte]]
    val n = bytes.length / 2
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val h = ((bytes(2 * i) & 0xff) | ((bytes(2 * i + 1) & 0xff) << 8)).toShort
      out(i) = HalfFloat.toFloat(h)
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Distance between two packed-fp16 vectors, decoded on the fly with
 * double accumulation (same values as round-tripping through
 * HalfVecRoundTrip then VectorDistance). metric: l2|l2sq|ip|negip|cosine|l1.
 */
case class PackedHalfDistance(left: Expression, right: Expression, metric: String)
    extends BinaryExpression with CodegenFallback {
  require(Seq("l2", "l2sq", "ip", "negip", "cosine", "l1").contains(metric))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"half_packed_${metric}_distance"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"graft: halfvec byte lengths differ: ${x.length} vs ${y.length}")
    val n = x.length / 2
    var dot = 0.0; var na = 0.0; var nb = 0.0; var l2 = 0.0; var l1 = 0.0
    var i = 0
    while (i < n) {
      val ha = ((x(2 * i) & 0xff) | ((x(2 * i + 1) & 0xff) << 8)).toShort
      val hb = ((y(2 * i) & 0xff) | ((y(2 * i + 1) & 0xff) << 8)).toShort
      val va = HalfFloat.toFloat(ha).toDouble
      val vb = HalfFloat.toFloat(hb).toDouble
      dot += va * vb; na += va * va; nb += vb * vb
      val d = va - vb; l2 += d * d; l1 += math.abs(d)
      i += 1
    }
    metric match {
      case "l2" => math.sqrt(l2)
      case "l2sq" => l2
      case "ip" => dot
      case "negip" => -dot
      case "cosine" =>
        val sim = dot / math.sqrt(na * nb)
        1.0 - math.max(-1.0, math.min(1.0, sim))
      case "l1" => l1
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
