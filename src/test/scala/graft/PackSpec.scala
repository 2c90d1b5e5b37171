package graft

import graft.operators.Pack
import org.apache.spark.sql.functions._

/**
 * Sequence-packing contracts: the distributed greedy pack equals a
 * serial reference walk, respects the budget (single oversized docs
 * excepted), and is a pure function of the input SET — repartitioning
 * must not change one assignment.
 */
class PackSpec extends SparkSpec {
  import spark.implicits._

  private val budget = 100L
  private val nGroups = 4

  private def serialPack(rows: Seq[(Long, Long)]): Map[Long, Long] =
    rows.groupBy(r => r._1 % nGroups).flatMap { case (g, docs) =>
      var fill = 0L; var seq = 0L; var first = true
      docs.sortBy(_._1).map { case (id, tok) =>
        if (first) { fill = tok; first = false }
        else if (fill + tok > budget) { seq += 1; fill = tok }
        else fill += tok
        id -> (g * 1000000000L + seq)
      }
    }

  private val docs: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(11)
    (0L until 500L).map(i => (i, 1L + rnd.nextInt(60).toLong)) ++
      Seq((500L, 130L), (501L, 7L)) // one doc larger than the budget
  }

  test("distributed pack equals the serial greedy walk") {
    val got = Pack.packGreedy(docs.toDF("doc_id", "tok"), "doc_id", "tok",
        budget, nGroups)
      .as[(Long, Long, Long)].collect()
    assert(got.map(r => r._1 -> r._2).toMap == serialPack(docs))
    assert(got.map(_._1).sorted.toSeq == docs.map(_._1).sorted)
  }

  test("every sequence fits the budget unless it is a single oversized doc") {
    val got = Pack.packGreedy(docs.toDF("doc_id", "tok"), "doc_id", "tok",
        budget, nGroups)
    val perSeq = got.groupBy("seq_id")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
    perSeq.foreach { case (seqId, fill, n) =>
      assert(fill <= budget || n == 1, s"seq $seqId overfilled: $fill with $n docs")
    }
  }

  test("chunking is a partition of the document: concat round-trips, sizes fit") {
    val texts = Seq(
      (0L, "a b c d e f g"), (1L, "x"), (2L, ""),
      (3L, (1 to 23).map(i => s"t$i").mkString(" ")))
    val got = Pack.chunkByTokens(texts.toDF("doc_id", "text"), "doc_id", "text", 4)
      .as[(Long, Int, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    texts.foreach { case (id, t) =>
      val chunks = got(id)
      assert(chunks.map(_._4).mkString(" ") == t.toLowerCase)
      assert(chunks.forall(_._3 <= 4))
      assert(chunks.init.forall(_._3 == 4), s"only the last chunk may be short: $id")
      assert(chunks.map(_._2).toSeq == chunks.indices.toSeq)
    }
  }

  test("a single stream of 200k docs packs exactly (O(1) task state)") {
    // nGroups=1 routes the whole corpus through ONE stream — the shape
    // that under the pre-r8 whole-group materialization held every row
    // in a single task's heap and sorted it there. The streaming walk
    // carries only (g, fill, seq). Constant tok=7 against budget=100
    // gives the closed form seq_id = doc_id / 14 (14·7 = 98 ≤ 100 < 105).
    val n = 200000L
    val df = spark.range(n).select(col("id").as("doc_id"), lit(7L).as("tok"))
    val got = Pack.packGreedy(df, "doc_id", "tok", 100L, 1)
    assert(got.filter(col("seq_id") =!= floor(col("doc_id") / 14)).count() == 0)
    assert(got.count() == n)
  }

  test("packing is invariant to input partitioning and order") {
    val base = docs.toDF("doc_id", "tok")
    val a = Pack.packGreedy(base, "doc_id", "tok", budget, nGroups)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = Pack.packGreedy(base.repartition(13).orderBy(col("tok").desc),
        "doc_id", "tok", budget, nGroups)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }
}
