package graft

import graft.operators.{Dedup, Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()

  test("minhash LSH finds every exact pair with jaccard >= 0.7") {
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashPairs(docs, "text", "doc_id", 64, 16, 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // verification guarantees precision; banding gives ~0.99 recall at 0.7
    assert(lsh.subsetOf(exact))
    assert(exact.nonEmpty && lsh == exact,
      s"missed=${exact -- lsh}")
  }

  test("simhash recalls every strong near-dup pair") {
    val sim = Dedup.simhashPairs(docs, "text", "doc_id", 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // simhash reflects token-distribution similarity, so on a shared-
    // vocabulary corpus it also pairs topically-similar docs; the
    // guarantee we assert is recall of true (jaccard >= 0.8) near-dups.
    val strong = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sim.nonEmpty && strong.nonEmpty)
    // simhash hamming correlates with — but does not bound — jaccard;
    // >= 80% recall of strong pairs is the realistic contract.
    val recall = (strong & sim).size.toDouble / strong.size
    assert(recall >= 0.8, s"recall=$recall missed=${strong -- sim}")
  }

  test("prefix-filtered jaccard equals naive all-pairs jaccard") {
    for (tau <- Seq(0.3, 0.5, 0.8)) {
      val naive = Dedup.ngramJaccardPairs(docs, "text", "doc_id", tau)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      val pref = Dedup.ngramJaccardPairsPrefix(docs, "text", "doc_id", tau)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(pref == naive, s"tau=$tau diff=${(naive -- pref).take(3)} extra=${(pref -- naive).take(3)}")
    }
  }

  test("salted gram join equals the plain exact join on natural and Zipfian corpora") {
    // natural corpus (max gram df ~25): salted with a low maxDf so the
    // heavy branch actually engages, pair set must be identical
    for (tau <- Seq(0.3, 0.7)) {
      val plain = Dedup.ngramJaccardPairs(docs, "text", "doc_id", tau)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      val salted = Dedup.ngramJaccardPairsSalted(docs, "text", "doc_id", tau, maxDf = 8)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(salted == plain,
        s"tau=$tau diff=${(plain -- salted).take(3)} extra=${(salted -- plain).take(3)}")
    }
    // adversarial Zipfian corpus: 400 docs all sharing one stop-shingle
    // run (df = corpus size -> 80k pairs through one gram key) plus
    // per-doc unique content and a few planted near-dup clusters
    val zipf = (0L until 400L).map { i =>
      val unique = (0 until 12).map(j => s"tok${i}_$j").mkString(" ")
      val planted = if (i % 100 < 2) "dup dup cluster body here now" else unique
      (i, s"the of and $planted")
    }.toDF("doc_id", "text")
    val plainZ = Dedup.ngramJaccardPairs(zipf, "text", "doc_id", 0.3)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val saltedZ = Dedup.ngramJaccardPairsSalted(zipf, "text", "doc_id", 0.3, maxDf = 32)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(saltedZ == plainZ && plainZ.nonEmpty,
      s"diff=${(plainZ -- saltedZ).take(3)} extra=${(saltedZ -- plainZ).take(3)}")
  }

  test("blocked all-pairs equals the cartesian pair set, via equi-join") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val blocked = Dedup.allPairsBlocked(emb, "embedding", "vec_id", blocks = 7)
    assert(!blocked.queryExecution.executedPlan.toString.contains("BroadcastNestedLoop"),
      "block-pair join must plan as an equi-join")
    val got = blocked.select("id_a", "id_b").as[(Long, Long)].collect()
    val n = emb.count()
    assert(got.length == n * (n - 1) / 2, s"expected all pairs once, got ${got.length}")
    assert(got.toSet.size == got.length, "pair emitted twice")
    assert(got.forall { case (a, b) => a < b })
  }

  test("LSH near-dup path recalls planted duplicates, sub-quadratically") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").limit(200).cache()
    // plant near-dups: slightly perturbed copies with shifted ids
    val planted = emb.select((col("vec_id") + 100000L).as("vec_id"),
      transform(col("embedding"), x => x * 1.001f + 0.0005f).as("embedding"))
    val corpus = emb.unionByName(planted)
    val pairs = Dedup.embeddingNearDupPairs(corpus, "embedding", "vec_id",
        maxCosDist = 0.01)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = emb.select("vec_id").as[Long].collect()
      .map(id => (id, id + 100000L)).toSet
    assert(expected.subsetOf(pairs),
      s"missed planted dups: ${(expected -- pairs).take(5)}")
    // precision: verification stage guarantees only pairs <= maxCosDist
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("semanticDedup drops exactly the planted near-copies, keeps originals") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").limit(200).cache()
    val planted = emb.select((col("vec_id") + 100000L).as("vec_id"),
      transform(col("embedding"), x => x * 1.001f + 0.0005f).as("embedding"))
    val corpus = emb.unionByName(planted)
    val model = graft.operators.Ivf.build(corpus, "embedding", nlists = 8)
    val kept = graft.operators.Dedup.semanticDedup(
        corpus, "embedding", "vec_id", model, maxCosDist = 0.01)
      .select("vec_id").as[Long].collect().toSet
    val originals = emb.select("vec_id").as[Long].collect().toSet
    // every original survives (smaller id in its ball), every planted
    // copy is dropped (its original co-clusters at cosd ~1e-6)
    assert(originals.subsetOf(kept), "an original was dropped")
    assert(kept.intersect(originals.map(_ + 100000L)).isEmpty,
      s"planted copies survived: ${kept.filter(_ >= 100000L).take(5)}")
    // idempotent: running again on the survivors changes nothing
    val again = graft.operators.Dedup.semanticDedup(
        corpus.join(kept.toSeq.toDF("vec_id"), Seq("vec_id")),
        "embedding", "vec_id", model, maxCosDist = 0.01)
      .select("vec_id").as[Long].collect().toSet
    assert(again == kept)
  }

  test("bucket guard: flood stays linear, clusters survive, normal corpus unchanged") {
    // on the normal corpus no bucket exceeds the cap: pair set identical
    val base = Dedup.minhashPairs(docs, "text", "doc_id", 64, 16, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val capped = Dedup.minhashPairs(docs, "text", "doc_id", 64, 16, 0.5, maxBucket = 200)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == base)
    // adversarial flood: 1000 identical docs share every band bucket —
    // 499,500 within-bucket pairs uncapped; the guard pivot-chains them
    // into 999 candidates and the dup cluster still collapses to one
    // survivor through the pivot.
    val flood = spark.range(100000, 101000)
      .select(col("id").as("doc_id"),
        lit("spam spam spam spam spam wonderful spam").as("text"))
    val corpus = docs.select("doc_id", "text").unionByName(flood)
    val pairs = Dedup.minhashPairs(corpus, "text", "doc_id", 64, 16,
      tau = 0.7, maxBucket = 100).cache()
    val floodPairs = pairs.filter(col("id_a") >= 100000L || col("id_b") >= 100000L)
    assert(floodPairs.count() == 999, "flood should contribute exactly the pivot chain")
    val surv = Dedup.survivorsFromPairs(corpus, "doc_id", pairs)
    assert(surv.filter(col("id") >= 100000L && col("keep")).count() == 1,
      "flood cluster must collapse to one survivor")
  }

  test("semanticDedup auto guard: a 10k-dup degenerate list stays linear") {
    // the pathological input semantic dedup exists FOR: one embedding
    // mass-duplicated 10k times collapses into a single IVF list —
    // unguarded that list alone is ~5e7 candidate pairs. The AUTO
    // default must pivot-chain it (linear) and keep survivors exact:
    // min-id ball member + every well-separated normal vector.
    val nDup = 10000
    val ball = (0 until nDup).map { i =>
      (i.toLong, Seq.tabulate(8)(d => 0.5f + (((i + d) % 7) * 1e-6f)))
    }
    // normals: +/- one-hots, pairwise cosd >= 1 — never within eps
    val normals = (0 until 8).map(d =>
      (100000L + d, Seq.tabulate(8)(j => if (j == d) 1.0f else 0.0f))) ++
      (0 until 8).map(d =>
        (100010L + d, Seq.tabulate(8)(j => if (j == d) -1.0f else 0.0f)))
    val corpus = (ball ++ normals).toDF("vec_id", "embedding")
    val model = graft.operators.Ivf.build(corpus, "embedding", nlists = 6)
    // derived cap: median list width is tiny next to the flood list
    val widths = graft.operators.Ivf.assign(corpus, "embedding", model)
      .groupBy(col("list_id")).count().select("count").as[Long].collect().toSeq
    val cap = graft.operators.Dedup.autoBucketGuard(widths)
    assert(cap < nDup, s"auto cap $cap does not trip on the $nDup-wide list")
    val kept = graft.operators.Dedup.semanticDedup(
        corpus, "embedding", "vec_id", model, maxCosDist = 0.01)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == (Set(0L) ++ normals.map(_._1)),
      s"survivors wrong: ${kept.toSeq.sorted.take(20)}... (${kept.size} kept)")
  }

  test("connected components + survivors") {
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.9), (10L, 11L, 0.8))
      .toDF("id_a", "id_b", "jaccard")
    val all = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val surv = Dedup.survivorsFromPairs(all, "doc_id", pairs)
      .filter($"keep").select("id").as[Long].collect().toSet
    assert(surv == Set(1L, 10L, 20L))
  }

  test("frame sampling shapes") {
    val media = Multimodal.asMedia(docs.limit(10), "text", "doc_id")
    val frames = Multimodal.frameSample(media, frameSize = 64, stride = 2)
    val r = frames.groupBy("doc_id").agg(count(lit(1)).as("n"),
      max(length(col("frame"))).as("mx")).collect()
    assert(r.nonEmpty && r.forall(_.getInt(2) <= 64))
    // stride 2 keeps every other frame
    val one = docs.limit(1).select(length($"text")).as[Int].head()
    val expect = (((one + 63) / 64) + 1) / 2
    assert(frames.filter(col("doc_id") === docs.limit(1).select("doc_id").as[Long].head())
      .count() == expect)
  }

  test("PNG codec round-trips: decoded features equal the generating formula") {
    val media = Multimodal.syntheticImages(docs.limit(20).select($"doc_id"), "doc_id")
    // payloads are genuine PNGs (magic bytes), not raw pixel dumps
    val magic = media.select($"payload").as[Array[Byte]].head()
    assert(magic.take(4).toSeq == Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
    val got = Multimodal.decodeImageFeatures(media)
      .select($"doc_id", $"width", $"height", $"luma_sum")
      .as[(Long, Int, Int, Long)].collect().sortBy(_._1)
    assert(got.nonEmpty)
    got.foreach { case (id, w, h, sum) =>
      assert(w == ((id % 4) * 16 + 32).toInt && h == ((id % 3) * 16 + 32).toInt)
      val expect = (for (y <- 0 until h; x <- 0 until w)
        yield (id * 31 + x * 7 + y * 13) % 256).sum
      assert(sum == expect, s"id=$id luma_sum $sum != $expect")
    }
  }

  test("nearest-neighbor resize: re-decoded pixels equal the index remap") {
    val media = Multimodal.syntheticImages(docs.limit(20).select($"doc_id"), "doc_id")
    val resized = Multimodal.resizeImages(media, 16, 16)
    val got = Multimodal.decodeImageStats(resized.select($"doc_id", $"payload"))
      .select($"doc_id", $"width", $"height", $"luma_sum")
      .as[(Long, Int, Int, Long)].collect().sortBy(_._1)
    assert(got.nonEmpty)
    got.foreach { case (id, w16, h16, sum) =>
      assert(w16 == 16 && h16 == 16)
      val (w, h) = (((id % 4) * 16 + 32).toInt, ((id % 3) * 16 + 32).toInt)
      val expect = (for (y <- 0 until 16; x <- 0 until 16)
        yield (id * 31 + (x * w / 16) * 7 + (y * h / 16) * 13) % 256).sum
      assert(sum == expect, s"id=$id resized luma_sum $sum != $expect")
    }
  }

  test("JPEG codec: genuine JFIF bytes, exact dims, pixel stats in band") {
    val media = Multimodal.syntheticJpegs(docs.limit(20).select($"doc_id"), "doc_id")
    // payloads are genuine JPEGs (SOI marker), not raw pixel dumps
    val magic = media.select($"payload").as[Array[Byte]].head()
    assert((magic(0) & 0xff) == 0xff && (magic(1) & 0xff) == 0xd8,
      "payload must start with the JPEG SOI marker")
    val got = Multimodal.decodeImageStats(media)
      .as[(Long, Int, Int, Long, Long, Int, Int)].collect().sortBy(_._1)
    assert(got.nonEmpty)
    got.foreach { case (id, w, h, np, sum, mn, mx) =>
      assert(w == ((id % 3) * 16 + 16).toInt && h == ((id % 2) * 16 + 16).toInt)
      assert(np == w.toLong * h)
      val base = (id % 128).toInt
      // lossy: mean within ±1.0 of the closed form, range within ±8
      val mean = sum.toDouble / np
      val expMean = base + (w - 1) / 2.0 + (h - 1) / 2.0
      assert(math.abs(mean - expMean) <= 1.0, s"id=$id mean $mean vs $expMean")
      assert(mn >= base - 8 && mx <= base + w + h - 2 + 8,
        s"id=$id range [$mn,$mx] outside band")
    }
  }

  test("WAV codec round-trips: decoded samples equal the generating formula") {
    val media = Multimodal.syntheticAudio(docs.limit(20).select($"doc_id"), "doc_id")
    // payloads are genuine RIFF/WAVE containers, not raw PCM dumps
    val magic = media.select($"payload").as[Array[Byte]].head()
    assert(magic.take(4).map(_.toChar).mkString == "RIFF")
    assert(magic.slice(8, 12).map(_.toChar).mkString == "WAVE")
    val got = Multimodal.decodeAudioFeatures(media)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.nonEmpty)
    got.foreach { case (id, n, sum, peak) =>
      val expN = 1024 + (id % 4) * 256
      val dc = id % 7
      assert(n == expN, s"id=$id n_samples $n != $expN")
      assert(sum == dc * expN - 128 * (expN / 256), s"id=$id sample_sum $sum")
      assert(peak == (if (dc == 0) 128 else 127 + dc), s"id=$id peak_abs $peak")
    }
  }

  test("Motion-PNG frames round-trip: each kept frame decodes to its luma") {
    val media = Multimodal.syntheticVideo(docs.limit(20).select($"doc_id"), "doc_id")
    // first frame of the container is a genuine PNG after its length prefix
    val payload = media.select($"payload").as[Array[Byte]].head()
    assert(payload.slice(4, 8).toSeq == Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
    val got = Multimodal.videoFrameFeatures(media, stride = 2)
      .as[(Long, Int, Int, Int, Long)].collect()
    assert(got.nonEmpty)
    val byDoc = got.groupBy(_._1)
    byDoc.foreach { case (id, frames) =>
      val nf = (4 + id % 3).toInt
      assert(frames.map(_._2).sorted.toSeq == (0 until nf by 2).toSeq,
        s"id=$id sampled frame indexes wrong")
      frames.foreach { case (_, fidx, w, h, sum) =>
        assert(w == 8 && h == 8)
        val l = (7 * id + 13 * fidx) % 256
        val rowSum = (0 until 8).map(x => (l + x) % 256).sum
        assert(sum == 8L * rowSum, s"id=$id frame=$fidx luma_sum $sum")
      }
    }
  }

  test("duplicated spans: planted shared passage found with exact extent") {
    // docs 1 and 2 share an exact 7-token passage embedded in otherwise
    // disjoint text; doc 3 is fully unique. With w=5 the shared passage
    // contributes duplicated grams at positions covering exactly it.
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      (1L, s"u1a u1b u1c $shared v1a v1b"),
      (2L, s"w2a $shared x2a x2b x2c x2d"),
      (3L, "y3a y3b y3c y3d y3e y3f y3g y3h y3i y3j")).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(docs, "text", "doc_id", w = 5)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // doc 1: passage = tokens 4-10 → gram positions 4,5,6 → run (4, 10, 3)
    // doc 2: passage = tokens 2-8  → gram positions 2,3,4 → run (2, 8, 3)
    assert(got.toSeq == Seq((1L, 4L, 10L, 3L), (2L, 2L, 8L, 3L)))
  }

  test("score-aware survivors keep the argmax-score doc per cluster") {
    // clusters {1,2,3} and {10,11}; 4 isolated. scores pick 2 (max),
    // and the 10-11 tie resolves to the smaller id
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val scored = Seq((1L, 5L), (2L, 9L), (3L, 7L), (10L, 4L), (11L, 4L),
      (4L, 1L)).toDF("id", "score")
    val got = Dedup.survivorsByScore(scored, "id", "score", pairs)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, false), (2L, 1L, true), (3L, 1L, false),
      (4L, 4L, true), (10L, 10L, true), (11L, 10L, false)))
  }

  test("contamination flags exactly the docs sharing a benchmark trigram") {
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "a sentence with the quick brown fox inside"), // shares 2 trigrams
      (2L, "quick brown unrelated words entirely"),       // bigram only - clean
      (3L, "completely disjoint vocabulary here"),
      (4L, "short text")                                  // < 3 tokens in common
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationFlags(train, "text", "doc_id", bench, "text")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, true), (2L, 0L, false),
      (3L, 0L, false), (4L, 0L, false)))
  }

  test("PII scrub masks every email and url, leaves clean text intact") {
    import graft.operators.TextAnalysis
    val rows = Seq(
      "write a@b.com and c.d+x@e-f.org today",
      "see https://x.org/a?b=c#d and http://y.io now",
      "user@site.com via https://l.me/u@v", // url embedding an @
      "no pii here 3.14 a@b (bare @, no tld)").toDF("t")
    val got = rows.select(TextAnalysis.scrubPii($"t")).as[String].collect().toSeq
    assert(got == Seq(
      "write <EMAIL> and <EMAIL> today",
      "see <URL> and <URL> now",
      "<EMAIL> via <URL>",
      "no pii here 3.14 a@b (bare @, no tld)"))
  }

  test("langid is deterministic and covers all docs") {
    val n = docs.count()
    assert(docs.select(TextAnalysis.langId($"text").as("l")).filter($"l".isNotNull).count() == n)
  }

  test("trigramBackoffNll: every backoff branch fires and matches closed form") {
    import org.apache.spark.sql.functions.col
    // train = even ids: "a b c a b c", "a b d".  score doc 1 (odd):
    // "a b c x" → trigrams (a,b,c): seen → c3/c12 = 2/3;
    // (b,c,x): unseen tri; bigram (c,x) unseen; x OOV →
    //   0.16·(0+1)/(N+V)  with N=9, V=4 → 0.16/13
    val tiny = Seq((0L, "a b c a b c"), (2L, "a b d"), (1L, "a b c x"))
      .toDF("id", "text")
    val got = TextAnalysis.trigramBackoffNll(tiny, "id", "text",
        col("id") % 2 === 0)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    def micros(ss: Seq[Double]): Long =
      ss.map(s => -BigDecimal(math.log(s)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.*(BigDecimal(1000000)).toLong
    // doc 0: (a,b,c)->2/3, (b,c,a)->1/2, (c,a,b)->1/1, (a,b,c)->2/3
    assert(got(0) == ((0L, 4L, 0L, micros(Seq(2.0/3, 0.5, 1.0, 2.0/3)))))
    // doc 1: 2 trigrams, 1 backoff position
    assert(got(1) == ((1L, 2L, 1L, micros(Seq(2.0/3, 0.16 * (1.0/13))))))
    // doc 2 (train member, all trigrams seen): (a,b,d)->1/3
    assert(got(2) == ((2L, 1L, 0L, micros(Seq(1.0/3)))))
    // a middle backoff case: bigram seen, trigram unseen —
    // "d a b": (d,a,b) unseen tri, (a,b) seen bigram c23=3? no —
    // bigram table keys (w2,w3)=(a,b): c=3, n2=c(a)=3 → 0.4·(3/3)
    val got2 = TextAnalysis.trigramBackoffNll(
        tiny.union(Seq((3L, "d a b")).toDF("id", "text")), "id", "text",
        col("id") % 2 === 0)
      .filter(col("id") === 3L).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    assert(got2 == ((1L, 1L, micros(Seq(0.4 * 1.0)))))
  }

  test("bigramNll equals the closed form on a tiny corpus") {
    val tiny = Seq((0L, "a b a b"), (1L, "a b c"), (2L, "x")).toDF("id", "text")
    val got = TextAnalysis.bigramNll(tiny, "id", "text")
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    // bigrams: (a,b)x3 across docs, (b,a)x1, (b,c)x1; unigrams:
    // a=3 b=3 c=1 x=1, V=4
    def lnp6(nab: Long, na: Long): BigDecimal =
      BigDecimal(math.round(math.log((nab + 1.0) / (na + 4.0)) * 1e6)) / 1e6
    val ab = lnp6(3, 3); val ba = lnp6(1, 3); val bc = lnp6(1, 3)
    def micros(s: BigDecimal): Long = (-s * 1e6).toLongExact
    assert(got == Seq(
      (0L, 3L, micros(ab + ba + ab)),
      (1L, 2L, micros(ab + bc))))
    // the 1-token doc scores nothing; repeated bigrams count per use
  }

  test("incremental near-dup equals the full batch restricted to the delta") {
    val old = docs.filter(pmod($"doc_id", lit(7)) =!= 0)
    val delta = docs.filter(pmod($"doc_id", lit(7)) === 0)
    val idx = Dedup.dedupIndex(old, "text", "doc_id")
    val inc = Dedup.incrementalMinhashPairs(idx, delta, "text", "doc_id",
        tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = Dedup.minhashPairs(docs, "text", "doc_id", tau = 0.5)
      .filter($"id_a" % 7 === 0 || $"id_b" % 7 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inc == full, s"incremental=$inc full-restricted=$full")
    assert(inc.nonEmpty, "expected at least one delta-touching pair")
  }
}
