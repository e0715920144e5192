package graft.queries

/** Registry of all verifiable queries. Each module contributes a Seq[Q];
  * SparkEntry exposes the union to the driver harness.
  */
object Catalog {
  lazy val all: Seq[Q] =
    CoreQueries.all ++ WindowQueries.all ++ GeoQueries.all ++
      DedupQueries.all ++ TextQueries.all ++ VectorQueries.all ++
      MiscQueries.all ++ SourceQueries.all ++ DomainQueries.all ++
      MultimodalQueries.all ++ StreamQueries.all ++ CatalogQueries.all ++
      LifecycleQueries.all ++ ExtensionQueries.all ++ AudioQueries.all ++ SketchQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  lazy val headline: Seq[String] = all.filter(_.headline).map(_.name)
}
