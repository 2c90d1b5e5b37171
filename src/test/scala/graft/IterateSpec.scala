package graft

import graft.operators.{Dedup, Iterate}
import org.apache.spark.sql.functions._

/**
 * Fixpoint-operator contracts, on BOTH execution paths: the driver
 * fast path (union-find / BFS under graft.fixpoint.localEdgeThreshold)
 * and the distributed large-star/small-star + frontier-relaxation path
 * that runs at 100TB scale. Forced-path fixtures set the threshold to 0
 * and assert via Iterate.fixpointRuns that the distributed code really
 * executed — so the claim "the 100TB path is tested" is itself tested.
 * Also: the reliable-checkpoint path survives losing every
 * executor-resident block mid-iteration, and non-convergence throws
 * instead of returning a wrong state.
 */
class IterateSpec extends SparkSpec {

  /** Driver-side DSU oracle: (id -> min id of its component). */
  private def dsu(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def hopsOf(edges: Seq[(Long, Long)], sources: Seq[Long]): Map[Long, Long] = {
    import spark.implicits._
    Iterate.hopDistances(edges.toDF("id_a", "id_b"), sources.toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Pin graft.fixpoint.localEdgeThreshold for the body; 0 forces the
   *  distributed path. Restores the previous value afterwards. */
  private def withEdgeThreshold[T](n: Long)(body: => T): T = {
    val key = "graft.fixpoint.localEdgeThreshold"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, n.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Assert `body` ran >= 1 distributed fixpoint (proof the LS/SS or
   *  relaxation code executed, not the driver fast path). */
  private def assertDistributed[T](body: => T): T = {
    val before = Iterate.fixpointRuns.get()
    val out = body
    assert(Iterate.fixpointRuns.get() > before,
      "expected the distributed fixpoint path to execute; it did not")
    out
  }

  /** Assert `body` ran ZERO distributed fixpoints (fast path taken). */
  private def assertFastPath[T](body: => T): T = {
    val before = Iterate.fixpointRuns.get()
    val out = body
    assert(Iterate.fixpointRuns.get() == before,
      "expected the driver fast path; a distributed fixpoint ran")
    out
  }

  // long path (diameter 300 — one-hop propagation would need 300
  // rounds; LS/SS must close it in O(log^2)), plus a star, a clique,
  // two merged rings, and out-of-order ids
  private def adversarialEdges: Seq[(Long, Long)] = {
    val path = (0L until 300L).map(i => (i, i + 1))
    val star = (1L to 30L).map(i => (1000L, 1000L + i))
    val clique = for (i <- 0 until 10; j <- i + 1 until 10)
      yield (2000L + i, 2000L + j)
    val rings = (0L until 40L).map(i => (3000L + i, 3000L + (i + 1) % 40)) ++
      (0L until 40L).map(i => (3100L + i, 3100L + (i + 1) % 40)) :+ (3000L, 3100L)
    val scrambled = Seq((7L, 9000L), (9000L, 4L), (8999L, 9000L))
    scala.util.Random.shuffle(path ++ star ++ clique ++ rings ++ scrambled)
  }

  test("fast-path CC (driver union-find) equals union-find oracle") {
    val edges = adversarialEdges
    assert(assertFastPath(ccOf(edges)) == dsu(edges))
  }

  test("FORCED distributed LS/SS CC equals union-find on adversarial shapes") {
    val edges = adversarialEdges
    val got = withEdgeThreshold(0)(assertDistributed(ccOf(edges)))
    assert(got == dsu(edges))
  }

  test("fast path and distributed path agree on the same pair set") {
    val edges = adversarialEdges
    val fast = assertFastPath(ccOf(edges))
    val dist = withEdgeThreshold(0)(assertDistributed(ccOf(edges)))
    assert(fast == dist)
  }

  test("fixpoint survives losing all executor-resident blocks mid-iteration") {
    import spark.implicits._
    // the session fixture sets a checkpoint dir, so Iterate truncates
    // through RELIABLE checkpoints; simulate executor loss by dropping
    // every cached/localCheckpoint block before EVERY round — recompute
    // must come from checkpoint files, not the block manager
    def wipe(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.sharedState.cacheManager.clearCache()
    }
    val n = 50
    val edgeDf = (0 until n).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    val sym = edgeDf.union(edgeDf.select(col("b"), col("a")).toDF("a", "b"))
    val init = (0 to n).map(i => (i.toLong, i.toLong)).toDF("id", "root")
    // one-hop min-label propagation: needs a full `n` rounds on a path,
    // so every round exercises recompute-after-block-loss
    val out = Iterate.fixpoint(init, 2 * n, "wipe-test") { st =>
      wipe()
      val prop = sym.join(st, sym("b") === st("id"))
        .groupBy(col("a")).agg(min(col("root")).as("nr"))
      st.join(prop, st("id") === prop("a"), "left")
        .select(st("id"),
          least(col("root"), coalesce(col("nr"), col("root"))).as("root"))
    } { (prev, next) =>
      wipe()
      next.join(prev.select(col("id"), col("root").as("prev_root")), "id")
        .filter(col("root") =!= col("prev_root")).count()
    }
    assert(out.select(max(col("root"))).head().getLong(0) == 0L,
      "path did not fully converge to the min label")
    // the gated CC operator under the same block loss — FORCED onto the
    // distributed LS/SS path (the fast path never touches the block
    // manager, so only the forced form exercises recovery)
    val edges = (0L until 200L).map(i => (i, i + 1))
    withEdgeThreshold(0) {
      val cc = assertDistributed {
        val df = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        wipe()
        df.collect()
      }
      assert(cc.map(r => r.getLong(0) -> r.getLong(1)).toMap == dsu(edges))
    }
  }

  test("hop distances equal driver-side BFS on a path-plus-shortcut graph") {
    // path 0..20 plus a shortcut 0-15: BFS must prefer the shortcut
    val edges = (0L until 20L).map(i => (i, i + 1)) :+ (0L, 15L)
    val got = assertFastPath(hopsOf(edges, Seq(0L)))
    val expect = (0L to 20L).map { i =>
      i -> math.min(i, math.abs(15 - i) + 1) // along the path vs via 0-15
    }.toMap
    assert(got == expect)
  }

  test("FORCED distributed hop relaxation equals the driver BFS fast path") {
    // multi-source: two components, one source each, plus a shortcut
    // that the relaxation must prefer over the long way
    val edges = ((0L until 30L).map(i => (i, i + 1)) :+ (0L, 25L)) ++
      (100L until 110L).map(i => (i, i + 1))
    val sources = Seq(0L, 100L)
    val fast = assertFastPath(hopsOf(edges, sources))
    val dist = withEdgeThreshold(0)(assertDistributed(hopsOf(edges, sources)))
    assert(fast == dist)
    assert(dist(26L) == 2L, "shortcut 0-25 not preferred") // 0→25→26
    assert(dist(105L) == 5L)
  }

  test("null source ids are filtered, and an oversized source set falls back") {
    import spark.implicits._
    val edges = (0L until 5L).map(i => (i, i + 1))
    // a null id among the sources must neither NPE nor seed the BFS
    val srcWithNull = Seq(Some(0L), None).toDF("id")
    val got = Iterate.hopDistances(edges.toDF("id_a", "id_b"), srcWithNull)
      .as[(Long, Long)].collect().toMap
    assert(got == (0L to 5L).map(i => i -> i).toMap)
    // sources above the driver threshold force the distributed path
    // even when the edge set is tiny (the edge gate alone used to
    // collect sources unconditionally); isolated sources are part of
    // the output contract (hops 0) on both paths
    val manySources = spark.range(0, 50).select((col("id") % 20).as("id"))
    val viaDistributed = assertDistributed {
      withEdgeThreshold(10) { // sym edges = 10 pass; 20 sources don't
        Iterate.hopDistances(edges.toDF("id_a", "id_b"), manySources)
          .as[(Long, Long)].collect().toMap
      }
    }
    assert(viaDistributed == (0L until 20L).map(i => i -> 0L).toMap)
  }

  test("non-convergence throws instead of returning a wrong state") {
    import spark.implicits._
    val init = Seq((0L, 1L)).toDF("u", "v")
    val e = intercept[IllegalStateException] {
      Iterate.fixpoint(init, 3, "oscillator") { s =>
        s.select(col("u"), (lit(1L) - col("v")).as("v")) // flips forever
      } { (prev, next) => next.except(prev).count() }
    }
    assert(e.getMessage.contains("oscillator"))
  }

  test("pageRank matches a driver-side reference on a small graph") {
    import spark.implicits._
    // star into 0 plus a 2-cycle and a sink: covers hub accumulation,
    // mutual recursion, a dangling node, and a no-in-edge node
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L), (1L, 2L),
      (4L, 3L)).toDF("s", "d")
    val got = Iterate.pageRank(edges, "s", "d", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // hand-derived closed form (teleport 0.03, r0 = 0.2 each):
    //   iter1: 0→.455  1→.2     2→.115    3→.2     4→.03
    //   iter2: 0→.38275 1→.41675 2→.115   3→.0555  4→.03
    //   iter3: 0→.03+.85·(.41675/2+.115+.0555)  1→.03+.85·.38275  …
    // (independently reproduced by a Python Decimal replica; the
    // DuckDB oracle gate proves the same bits on the real data)
    val rank = Map(0L -> 0.35204375, 1L -> 0.3553375,
      2L -> 0.20711875, 3L -> 0.0555, 4L -> 0.03)
    assert(got.keySet == rank.keySet)
    rank.foreach { case (v, r) => assert(got(v) == r, s"node $v: ${got(v)} vs $r") }
    // mass check: with one dangling node (3 -> nothing... node 2 and 3
    // both dangle) total rank stays <= 1 and every rank is positive
    assert(got.values.sum <= 1.0 + 1e-9)
    assert(got.values.forall(_ > 0))
    // the sink that only the dangling node feeds, and the dangling
    // node itself, sit at the bottom; the hub and its successor at
    // the top (node 1 overtakes the hub at iter 3 — it receives the
    // hub's large iter-2 rank undivided)
    assert(Seq(got(4L), got(3L)).max < Seq(got(0L), got(1L)).min)
  }

  test("pageRank: FORCED distributed path equals the driver fast path " +
      "bit-for-bit") {
    import spark.implicits._
    // a denser deterministic graph than the closed-form fixture: ring +
    // chords + a star, ids scrambled — division results exercise many
    // 12dp rounding boundaries
    val es = (0L until 40L).map(i => (i, (i + 1) % 40)) ++
      (0L until 40L by 3).map(i => (i, (i * 7 + 5) % 40)) ++
      (1L to 10L).map(i => (500L, 500L + i))
    val edges = es.toDF("s", "d")
    val fast = Iterate.pageRank(edges, "s", "d", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dist = withEdgeThreshold(0) {
      Iterate.pageRank(edges, "s", "d", iters = 4)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    assert(fast.keySet == dist.keySet)
    fast.foreach { case (v, r) =>
      assert(dist(v) == r, s"node $v: fast $r vs distributed ${dist(v)}")
    }
  }
}
