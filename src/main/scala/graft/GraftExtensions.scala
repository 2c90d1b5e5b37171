package graft

import graft.plans.{RewriteWindowTopK, TopKPerKey}
import org.apache.spark.sql.SparkSessionExtensions

/**
 * Session-extension entry point — the idiomatic deployment packaging
 * for a Spark extension library:
 *
 *   spark.sql.extensions=graft.GraftExtensions
 *
 * injects the optimizer rule + planning strategy at session build time
 * (no per-session register calls), and SQL function registration runs
 * on first use via [[graft.functions.SqlFunctions.register]]. The
 * programmatic path (`GraftOptimizations.register(spark)`) remains for
 * notebooks and tests on an existing session.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteWindowTopK)
    ext.injectPlannerStrategy(_ => TopKPerKey.strategy)
  }
}
