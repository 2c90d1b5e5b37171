package graft

import graft.operators.Ivf

class EntrySpec extends SparkSpec {

  test("driver contract: entry returns rows; every oracle key has a query") {
    assert(SparkEntry.entry(spark).count() > 0)
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
    assert(SparkEntry.queries.size >= 79)
  }

  test("ivf model save/load round-trips") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val model = Ivf.build(emb, "embedding", nlists = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_model").toString
    Ivf.saveModel(spark, model, dir)
    val loaded = Ivf.loadModel(spark, dir)
    assert(loaded.nlists == model.nlists)
    assert(loaded.centroids.zip(model.centroids).forall {
      case (a, b) => a.sameElements(b)
    })
  }
}
