package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.Bridge

/**
 * Per-key top-k as a first-class operator (SURVEY §3 tier (c): custom
 * LogicalPlan + Strategy + SparkPlan).
 *
 * The window-function formulation (`row_number() OVER (PARTITION BY k
 * ORDER BY o) <= n`) sorts every group in full; this operator keeps a
 * bounded heap per key — O(k) memory per group, one pass — after a
 * hash-partition on the keys (declared via requiredChildDistribution, so
 * Catalyst plans the exchange and AQE still applies).
 */
final case class TopKPerKeyPlan(child: LogicalPlan, keys: Seq[Expression],
    order: SortOrder, k: Int) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyPlan =
    copy(child = c)
}

final case class TopKPerKeyExec(child: SparkPlan, keys: Seq[Expression],
    order: SortOrder, k: Int) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val ordExpr = order.child
    val descending = order.direction == Descending
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordEval = UnsafeProjection.create(Seq(ordExpr), childOutput)
      // per key: a bounded "worst-first" ordered buffer of (ordValue, row)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[(Double, UnsafeRow)]]()
      val cmp = new java.util.Comparator[(Double, UnsafeRow)] {
        // head = the entry to evict = worst under the requested order
        override def compare(a: (Double, UnsafeRow), b: (Double, UnsafeRow)): Int =
          if (descending) java.lang.Double.compare(a._1, b._1)
          else java.lang.Double.compare(b._1, a._1)
      }
      it.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[(Double, UnsafeRow)](k + 1, cmp)
          heaps.put(key.copy(), heap)
        }
        val ord = ordEval(row).getDouble(0)
        if (heap.size() < k) {
          heap.add((ord, row.copy().asInstanceOf[UnsafeRow]))
        } else {
          val worst = heap.peek()
          val better = if (descending) ord > worst._1 else ord < worst._1
          if (better) { heap.poll(); heap.add((ord, row.copy().asInstanceOf[UnsafeRow])) }
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.forEach { (_, heap) =>
        val rows = new Array[(Double, UnsafeRow)](heap.size())
        var i = rows.length - 1
        while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // best-first
        rows.foreach(r => out += r._2)
      }
      out.iterator
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKPerKey {
  private object TopKStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerKeyPlan(child, keys, order, k) =>
        TopKPerKeyExec(planLater(child), keys, order, k) :: Nil
      case _ => Nil
    }
  }

  /** Idempotently register the planning strategy on this session. */
  def register(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    val cur = exp.extraStrategies
    if (!cur.exists(_ eq TopKStrategy))
      exp.extraStrategies = cur :+ TopKStrategy
  }

  /**
   * Top-k rows per key group, ordered by `orderCol` (asc unless `desc`).
   * Ties are unspecified — pass a compound numeric order (e.g. value *
   * 1e6 + id) or re-sort downstream when determinism matters.
   */
  def perKey(df: DataFrame, keyCols: Seq[String], orderCol: String, k: Int,
      desc: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    val lp = Bridge.logicalPlan(df)
    val attrs = keyCols.map(c => lp.output.find(_.name == c).getOrElse(
      throw new IllegalArgumentException(s"no column $c")))
    val ordAttr = lp.output.find(_.name == orderCol).getOrElse(
      throw new IllegalArgumentException(s"no column $orderCol"))
    val so = SortOrder(ordAttr, if (desc) Descending else Ascending)
    Bridge.ofRows(spark, TopKPerKeyPlan(lp, attrs, so, k))
  }
}
