package graft.enrich

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.blocker.Blocker
import graft.matching.Algorithms

/** Aleph-style enricher (reference `enrich/aleph.py:20-144`) — the
  * same match-service algebra as [[YenteEnricher]] (Aleph's `/match`
  * endpoint), plus Aleph's own shaping:
  *
  *  - optional **collection scoping** (`collection_id`, `:44-56` +
  *    `match`, `:122-124`): when a collection is named, only mirror
  *    statements from that collection are searchable;
  *  - `load_aleph_entity` (`:58-73`): every match carries its
  *    `alephUrl` entity link, the collection label as `publisher`, and
  *    itself as a referent;
  *  - `_traverse_nested` re-uses the yente nested expansion.
  */
final class AlephEnricher(
    mirror: DataFrame,
    host: String = "https://aleph.local/",
    collection: Option[String] = None,
    algorithm: String = Algorithms.default.name,
    cutoff: Option[Double] = None,
    stripNamespace: Boolean = false) {

  /** The searchable slice: collection-scoped when configured. The
    * mirror may carry a `collection` column; absent, scoping is a
    * no-op (a single-collection mirror).
    */
  private def scoped: DataFrame = {
    val sliced = collection match {
      case Some(c) if mirror.columns.contains("collection") =>
        mirror.filter(col("collection") === c)
      case _ => mirror
    }
    // the scoping column is Aleph bookkeeping, not a statement column
    if (sliced.columns.contains("collection")) sliced.drop("collection")
    else sliced
  }

  private def delegate = new YenteEnricher(scoped, api = host,
    algorithm = algorithm, cutoff = cutoff,
    stripNamespace = stripNamespace)

  /** Match + Aleph decoration: `aleph_url` entity link and the
    * collection label as `publisher`.
    */
  def matchEntities(s: SparkSession, queryStmts: DataFrame,
      cfg: Blocker.Config = Blocker.Config()): DataFrame =
    delegate.matchEntities(s, queryStmts, cfg)
      .withColumnRenamed("source_url", "aleph_url")
      .withColumn("publisher",
        lit(collection.getOrElse("default")))

  def expandNested(candidates: DataFrame): DataFrame =
    delegate.expandNested(candidates)
}
