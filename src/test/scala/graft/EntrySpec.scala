package graft

import graft.operators.Ivf

class EntrySpec extends SparkSpec {

  test("driver contract: entry returns rows; every oracle key has a query") {
    assert(SparkEntry.entry(spark).count() > 0)
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
    assert(SparkEntry.queries.size >= 95)
  }

  test("GraftExtensions wires the topk rewrite rule and strategy") {
    // getOrCreate would return the shared test session (ignoring the
    // extensions conf), so exercise the injection path directly: this
    // is exactly what session building runs under spark.sql.extensions.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val (rules, strategies) =
      org.apache.spark.sql.graft.Bridge.injectedRulesAndStrategies(ext, spark)
    assert(rules.contains(graft.plans.RewriteWindowTopK))
    assert(strategies.contains(graft.plans.TopKPerKey.strategy))
    // the whole SQL-name surface injects at session build (r16)
    val names =
      org.apache.spark.sql.graft.Bridge.injectedFunctionNames(ext).toSet
    assert(graft.functions.SqlFunctions.allBuilders.keySet.subsetOf(names),
      s"missing: ${graft.functions.SqlFunctions.allBuilders.keySet -- names}")
    assert(names.contains("to_tsvector") && names.contains("akeys") &&
      names.contains("crypt") && names.contains("l2_distance"))
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
