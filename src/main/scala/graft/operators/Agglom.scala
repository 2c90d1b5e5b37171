package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Agglomerative (hierarchical) clustering — the one madlib/DB4AI
 * algorithm family the engine lacked (reference: src/gausskernel/
 * dbmind/deepsql/madlib_modules/agglomerative_clustering/
 * agglomerative_clustering.py_in — validates affinity ∈ {euclidean,
 * l1, l2, manhattan, cosine}, linkage ∈ {ward, complete, average,
 * single} with ward ⇒ euclidean (:36-55), then hands the WHOLE table
 * to sklearn on a single node; output is (id, label, point) :85-94).
 *
 * The Spark re-expression is two-phase, the same coarsen-then-solve
 * shape as the reference's own docs suggest for big data:
 *
 *  1. COARSEN (distributed): points collapse to weighted
 *     micro-clusters by an exact groupBy on the feature values —
 *     map-side combinable, one shuffle of m rows. Identical points
 *     are distance-0 siblings, so cluster-level linkage over the
 *     weighted cells is EXACTLY point-level linkage (no
 *     approximation): single/complete/average distances between
 *     cells of co-located points equal their point-level values
 *     directly, and ward seeds the matrix with the weighted merge
 *     cost 2·ni·nj/(ni+nj)·‖ci−cj‖² (the closed form of the
 *     Lance–Williams ward recurrence after the free distance-0
 *     merges; equals ‖ci−cj‖² for singleton cells). Continuous
 *     features should be quantized first (the same contract as
 *     nbayesND — the reference discretizes too). m is guarded by
 *     `maxReps`: driver state is O(m²), never O(N).
 *
 *  2. MERGE (driver, m ≤ maxReps): classic Lance–Williams
 *     agglomeration over the m cells — single (min), complete (max),
 *     average (size-weighted), ward (variance increase, squared
 *     euclidean) — down to k clusters. Single-threaded driver
 *     arithmetic in a fixed order, ties broken by (smaller i,
 *     smaller j): fully deterministic. Labels 0..k-1 are assigned by
 *     ascending lexicographic minimum member, so the labeling is
 *     reproducible and engine-neutral.
 *
 * Scale shape at 100 TB: one map-side-combined aggregate (the only
 * full-data pass), an m-row collect, O(m²) driver doubles, and a
 * broadcast-joined label map back onto the input — adding rows never
 * adds driver state.
 */
object Agglom {

  /**
   * Cluster `df` into `k` groups. Output: idCol as `id`, the feature
   * columns as f0..f{p-1}, and `label` (0..k-1).
   */
  def cluster(df: DataFrame, features: Seq[Column], idCol: Column, k: Int,
      linkage: String = "ward", affinity: String = "euclidean",
      maxReps: Int = 1024): DataFrame = {
    require(k >= 1, "graft: need k >= 1")
    require(Seq("ward", "complete", "average", "single").contains(linkage),
      s"graft: linkage must be ward|complete|average|single, got $linkage")
    val aff = affinity match {
      case "euclidean" | "l2" => "euclidean"
      case "l1" | "manhattan" => "manhattan"
      case "cosine" => "cosine"
      case a => throw new IllegalArgumentException(
        s"graft: affinity must be euclidean|l1|l2|manhattan|cosine, got $a")
    }
    require(linkage != "ward" || aff == "euclidean",
      "graft: ward linkage requires euclidean affinity") // ref :52-53
    val p = features.size
    require(p >= 1, "graft: need at least one feature")

    val pts = df.select(idCol.as("id") +:
      features.zipWithIndex.map { case (f, i) => f.cast("double").as(s"f$i") }: _*)
    val cellCols = (0 until p).map(i => col(s"f$i"))
    val cellsRaw = pts.groupBy(cellCols: _*).agg(count(lit(1)).as("w"))
      .collect()
    // null features have no coordinate — reject loudly (checked on the
    // collected cells, zero extra passes; a null cell would otherwise
    // NPE deep in the driver recurrence)
    cellsRaw.find(r => (0 until p).exists(r.isNullAt)).foreach { r =>
      throw new IllegalArgumentException(
        "graft: agglomerative clustering requires non-null features — " +
          s"found a cell with a null coordinate ($r); filter or impute first")
    }
    require(cellsRaw.length <= maxReps,
      s"graft: ${cellsRaw.length} distinct feature cells exceed maxReps=$maxReps — " +
        "quantize continuous features first (driver merge state is O(m^2))")
    require(cellsRaw.length >= k,
      s"graft: only ${cellsRaw.length} distinct cells for k=$k clusters")

    // collect() order follows the shuffle layout (partition count,
    // core count) — sort cells by coordinate so the merge-loop index
    // order (and therefore tie resolution) is input-determined only
    val cells = cellsRaw.sortBy(r =>
      Array.tabulate(p)(i => r.getDouble(i)).toIndexedSeq)(
      Ordering.Implicits.seqOrdering[IndexedSeq, Double])
    val m = cells.length
    val coord: Array[Array[Double]] =
      cells.map(r => Array.tabulate(p)(i => r.getDouble(i)))
    val size = cells.map(_.getAs[Long]("w")).map(_.toDouble)

    def baseDist(a: Array[Double], b: Array[Double]): Double = aff match {
      case "euclidean" =>
        val s = a.indices.foldLeft(0.0)((acc, i) =>
          acc + (a(i) - b(i)) * (a(i) - b(i)))
        if (linkage == "ward") s else math.sqrt(s) // ward merges on d²
      case "manhattan" =>
        a.indices.foldLeft(0.0)((acc, i) => acc + math.abs(a(i) - b(i)))
      case "cosine" =>
        val dot = a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
        val na = math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x * x))
        val nb = math.sqrt(b.foldLeft(0.0)((acc, x) => acc + x * x))
        if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - dot / (na * nb)
    }

    // active-cluster merge with the Lance–Williams recurrence. Ward's
    // recurrence assumes the matrix holds merge COSTS, so weighted
    // cells seed 2·ni·nj/(ni+nj)·d² (= d² when ni = nj = 1) — an
    // unweighted d² seed would under-price merging two heavy cells
    // and diverge from point-level ward whenever cell sizes differ.
    val d = Array.tabulate(m, m)((i, j) =>
      if (i == j) 0.0
      else {
        val base = baseDist(coord(i), coord(j))
        if (linkage == "ward")
          base * (2.0 * size(i) * size(j) / (size(i) + size(j)))
        else base
      })
    val n = size.clone()
    val active = Array.fill(m)(true)
    val members = Array.tabulate(m)(i => List(i))
    var remaining = m
    while (remaining > k) {
      var bi = -1; var bj = -1; var bd = Double.MaxValue
      var i = 0
      while (i < m) {
        if (active(i)) {
          var j = i + 1
          while (j < m) {
            if (active(j) && d(i)(j) < bd) { bd = d(i)(j); bi = i; bj = j }
            j += 1
          }
        }
        i += 1
      }
      // merge bj into bi (bi < bj keeps ids stable; ties resolved by
      // the strict < scan order: smallest (i, j) wins)
      val (ni, nj, dij) = (n(bi), n(bj), d(bi)(bj))
      var kk = 0
      while (kk < m) {
        if (active(kk) && kk != bi && kk != bj) {
          val dki = d(math.min(kk, bi))(math.max(kk, bi))
          val dkj = d(math.min(kk, bj))(math.max(kk, bj))
          val nd = linkage match {
            case "single" => math.min(dki, dkj)
            case "complete" => math.max(dki, dkj)
            case "average" => (ni * dki + nj * dkj) / (ni + nj)
            case "ward" =>
              val nk = n(kk)
              ((nk + ni) * dki + (nk + nj) * dkj - nk * dij) / (nk + ni + nj)
          }
          d(math.min(kk, bi))(math.max(kk, bi)) = nd
        }
        kk += 1
      }
      n(bi) = ni + nj
      members(bi) = members(bi) ++ members(bj)
      active(bj) = false
      remaining -= 1
    }

    // deterministic labels: clusters ordered by their lexicographic
    // minimum member coordinate
    implicit val arrOrd: Ordering[Array[Double]] =
      (a: Array[Double], b: Array[Double]) => {
        var i = 0
        var c = 0
        while (c == 0 && i < a.length && i < b.length) {
          c = java.lang.Double.compare(a(i), b(i))
          i += 1
        }
        if (c != 0) c else a.length - b.length
      }
    val clusters = (0 until m).filter(active).map(ci => members(ci))
      .sortBy(ms => ms.map(coord).min)
    val cellLabel: Map[Int, Int] = clusters.zipWithIndex
      .flatMap { case (ms, lbl) => ms.map(_ -> lbl) }.toMap

    // label map back onto the points: m rows, broadcast equi-join on
    // the exact cell coordinates
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val labelRows = (0 until m).map(ci =>
      Row.fromSeq(coord(ci).toSeq :+ cellLabel(ci)))
    val labelSchema = StructType(
      (0 until p).map(i => StructField(s"f$i", DoubleType, nullable = false)) :+
        StructField("label", IntegerType, nullable = false))
    val labels = spark.createDataFrame(
      spark.sparkContext.parallelize(labelRows, 1), labelSchema)
    pts.join(broadcast(labels), (0 until p).map(i => s"f$i"), "inner")
      .select(col("id") +: cellCols :+ col("label"): _*)
  }
}
