package graft.core

import org.apache.spark.sql.DataFrame

/** A feature: a named, versioned, memoized transformation materialized to a
  * table — the reference's core abstraction (a Dagster asset backed by
  * Ibis/Polars compute; reference: README.md:21-24,
  * examples/dagster_feray_example/defs/ray/ray_integration.py:5,44).
  *
  * @param name        feature (table) name in the store
  * @param entityKeys  identity columns — memoization and upserts key on these
  * @param codeVersion bump to force recompute of every record (A10: "data and
  *                    code version are tracked on the record level",
  *                    reference README.md:23)
  * @param transform   the pipeline body — plain declarative DataFrame code so
  *                    Catalyst owns the physical plan; the SAME function runs
  *                    in batch and fastlane/streaming mode (A14)
  */
final case class FeatureDef(
    name: String,
    entityKeys: Seq[String],
    codeVersion: String,
    transform: DataFrame => DataFrame) {
  require(entityKeys.nonEmpty, s"feature $name needs at least one entity key")
}

/** A named DAG of features (reference: Dagster asset graph,
  * definitions.py:20-31). Edges are upstream feature names; the runner
  * materializes in topological order. */
final case class FeatureGraph(features: Seq[FeatureDef], deps: Map[String, Seq[String]] = Map.empty) {
  private val byName = features.map(f => f.name -> f).toMap
  require(deps.keys.forall(byName.contains), "dependency on unknown feature")

  /** Topological order (stable: ties broken by declaration order). */
  def topoOrder: Seq[FeatureDef] = {
    val visited = scala.collection.mutable.LinkedHashSet[String]()
    def visit(n: String, path: Set[String]): Unit = {
      require(!path(n), s"feature dependency cycle through $n")
      if (!visited(n)) {
        deps.getOrElse(n, Nil).foreach(visit(_, path + n))
        visited += n
      }
    }
    features.foreach(f => visit(f.name, Set.empty))
    visited.toSeq.map(byName)
  }
}
