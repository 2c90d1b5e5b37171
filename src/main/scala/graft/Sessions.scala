package graft

import org.apache.spark.sql.SparkSession

/** Shared session setup for the graft mains and test fixture. */
object Sessions {
  /**
   * Point the context at a fresh reliable-checkpoint dir (used by
   * Iterate.fixpoint for cross-round lineage truncation) and remove
   * it on JVM exit — the cleaner's cleanCheckpoints only covers RDDs
   * GC'd during the session, so converged final states would
   * otherwise accumulate across bench/verify runs.
   */
  def initCheckpoints(spark: SparkSession): Unit = {
    val dir = new java.io.File(
      s"target/graft-checkpoints/${java.util.UUID.randomUUID()}")
    spark.sparkContext.setCheckpointDir(dir.toString)
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
    ()
  }
}
