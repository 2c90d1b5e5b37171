package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/**
 * BPE contracts: the codegen'd merge fold implements greedy
 * left-to-right non-overlap (including the a=b chain case), and k
 * rounds of train() equal a reference Scala implementation — same
 * merge table, same final corpus.
 */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // reference single merge: greedy left-to-right
  private def refMerge(toks: List[String], a: String, b: String): List[String] =
    toks match {
      case x :: y :: rest if x == a && y == b => (a + "+" + b) :: refMerge(rest, a, b)
      case x :: rest => x :: refMerge(rest, a, b)
      case Nil => Nil
    }

  private def refTrain(corpus: Seq[List[String]], rounds: Int)
      : (Seq[(String, String, Long)], Seq[List[String]]) = {
    var cur = corpus
    val merges = Seq.newBuilder[(String, String, Long)]
    for (_ <- 0 until rounds) {
      val counts = cur.flatMap(d => d.zip(d.drop(1)))
        .groupBy(identity).map { case (p, l) => (p, l.size.toLong) }
      if (counts.nonEmpty) {
        val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((a, b, n))
        cur = cur.map(d => refMerge(d, a, b))
      }
    }
    (merges.result(), cur)
  }

  test("mergeOnce: greedy non-overlap, including a=b chains") {
    val cases = Seq(
      (Seq("x", "x", "x", "x", "x"), "x", "x",
        Seq("x+x", "x+x", "x")),
      (Seq("a", "b", "a", "b"), "a", "b", Seq("a+b", "a+b")),
      (Seq("a", "a", "b"), "a", "b", Seq("a", "a+b")),
      (Seq("c"), "a", "b", Seq("c")),
      (Seq.empty[String], "a", "b", Seq.empty[String]))
    cases.foreach { case (in, a, b, want) =>
      val got = Seq(Tuple1(in)).toDF("toks")
        .select(Bpe.mergeOnce(col("toks"), a, b).as("m"))
        .as[Seq[String]].head()
      assert(got == want, s"merge($in, $a, $b)")
    }
  }

  test("train equals the reference implementation over 5 rounds") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("t", "u", "v", "w")
    val corpus = Seq.fill(60)(
      List.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.length))))
    val df = corpus.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("id", "toks")
    val (merges, finalDf) = Bpe.train(df, "toks", rounds = 5)
    val (refMerges, refFinal) = refTrain(corpus, 5)
    assert(merges == refMerges, s"merge tables differ: $merges vs $refMerges")
    val got = finalDf.orderBy("id").as[(Long, Seq[String])].collect()
      .map(_._2.toList).toSeq
    assert(got == refFinal)
    // phrases compose: after 5 rounds some merged symbol contains '+'
    assert(merges.nonEmpty && got.flatten.exists(_.contains("+")))
  }

  test("merge plan is map-only: no shuffle in the merge stage") {
    val df = Seq((1L, Seq("a", "b", "c"))).toDF("id", "toks")
    val plan = df.select(Bpe.mergeOnce(col("toks"), "a", "b"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"merge must not shuffle:\n$plan")
  }

  test("encode applies the merge table in rank order, chains included") {
    val docs = Seq(
      (1L, Seq("a", "a", "b", "c")),
      (2L, Seq("a", "a", "a")),       // overlap: greedy-left pairs once
      (3L, Seq("x", "y"))             // untouched
    ).toDF("id", "toks")
    // rank order: (a,a) first, then the CHAINED (a+a, b)
    val got = Bpe.encode(docs, "toks", Seq(("a", "a"), ("a+a", "b")))
      .orderBy("id").as[(Long, Seq[String])].collect().map(_._2.toList)
    assert(got.toSeq == Seq(
      List("a+a+b", "c"), List("a+a", "a"), List("x", "y")))
    // encode == replaying train's own merges over the same corpus
    val (merges, trained) = Bpe.train(docs, "toks", rounds = 2)
    val replayed = Bpe.encode(docs, "toks", merges.map(m => (m._1, m._2)))
      .orderBy("id").as[(Long, Seq[String])].collect().map(_._2.toList)
    val ref = trained.orderBy("id").as[(Long, Seq[String])]
      .collect().map(_._2.toList)
    assert(replayed.toSeq == ref.toSeq)
    // encode is map-only end to end
    val plan = Bpe.encode(docs, "toks", Seq(("a", "a"), ("a+a", "b")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
  }
}
