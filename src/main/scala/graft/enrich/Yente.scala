package graft.enrich

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.blocker.Blocker
import graft.matching.Algorithms
import graft.model.Ftm

/** Yente-style match-service enricher (reference `enrich/yente.py:
  * 21-120`). Yente is the reference's own matching API — so its mirror
  * form is this engine itself: matching against a mirrored FtM dataset
  * through the shared blocker + algorithm registry, with yente's
  * request/response shaping kept:
  *
  *  - query shaping (`match`, `:56-75`): only matchable schemata; the
  *    query carries matchable, non-entity-type properties only (the
  *    `prop.type == registry.entity` skip and `prop.matchable` gate);
  *  - `algorithm` and `cutoff` parameters (`:38-40`): candidate scores
  *    come from a named registry algorithm and fall away below the
  *    cutoff;
  *  - every match gains a `sourceUrl` pointing at the service's entity
  *    endpoint (`make_url` + `:85`), computed from the id *before*
  *    namespace stripping;
  *  - `strip_namespace` (`:41-43`): FtM-namespaced ids (`plain.sig`)
  *    lose their signature suffix, like `Namespace().apply`;
  *  - `expand` (`:96-120`): the match's nested entity record — the
  *    candidate's statements plus one hop of referenced entities, with
  *    reverse properties injected on the referenced side for
  *    (schema, prop) pairs whose reverse is a real (non-stub) property.
  *    FtM's default ontology reverses are stubs, so `reverses` defaults
  *    empty, matching the reference's `not prop.reverse.stub` skip.
  */
final class YenteEnricher(
    mirror: DataFrame,
    api: String = "http://yente.local/",
    algorithm: String = Algorithms.default.name,
    cutoff: Option[Double] = None,
    stripNamespace: Boolean = false,
    reverses: Map[(String, String), String] = Map.empty) {

  import YenteEnricher._

  private val delegate = new DatasetEnricher("yente", mirror)

  /** The reference's query payload: matchable non-entity props of
    * matchable schemata (plus the identity statements that keep
    * property-less entities alive).
    */
  def matchableQuery(stmts: DataFrame): DataFrame = {
    val keep = typedlit(matchableProps)
    stmts.filter(array_contains(typedlit(matchableSchemata),
      col("schema")))
      .filter(col("prop") === "id" ||
        array_contains(keep, concat(col("schema"), lit(":"), col("prop"))))
  }

  /** Match query statements against the mirror: `(query_id,
    * candidate_id, blocker_score, match_score, source_url)`, cutoff
    * applied, ids namespace-stripped when configured.
    */
  def matchEntities(s: SparkSession, queryStmts: DataFrame,
      cfg: Blocker.Config = Blocker.Config()): DataFrame = {
    val cands = delegate.matchCandidates(s, matchableQuery(queryStmts),
      algorithm, cfg)
    val cut = cutoff.fold(cands)(c => cands.filter(col("match_score") >= c))
    val withUrl = cut.withColumn("source_url",
      concat(lit(api), lit("entities/"), col("candidate_id")))
    if (stripNamespace)
      withUrl.withColumn("candidate_id", stripNs(col("candidate_id")))
    else withUrl
  }

  /** The nested entity record: candidate statements + one referenced
    * hop, with non-stub reverse properties injected.
    */
  def expandNested(candidates: DataFrame): DataFrame = {
    val pulled = delegate.expand(candidates)
    if (reverses.isEmpty) pulled
    else {
      val revMap = typedlit(
        reverses.map { case ((sch, p), r) => s"$sch:$p" -> r })
      val ent = pulled.filter(col("prop_type") === "entity")
        .withColumn("rev_prop",
          element_at(revMap, concat(col("schema"), lit(":"), col("prop"))))
        .filter(col("rev_prop").isNotNull)
        .select(col("canonical_id").as("parent_id"),
          col("value").as("child_id"), col("rev_prop"),
          col("dataset"), col("external"),
          col("first_seen"), col("last_seen"))
      val childSchema = pulled
        .groupBy(col("canonical_id").as("child_id"))
        .agg(min(col("schema")).as("child_schema"))
      val rev = ent.join(childSchema, Seq("child_id"))
        .select(
          md5(concat_ws("|", col("dataset"), col("child_id"),
            col("rev_prop"), col("parent_id"))).as("id"),
          col("child_id").as("entity_id"),
          col("child_id").as("canonical_id"),
          col("rev_prop").as("prop"), lit("entity").as("prop_type"),
          col("child_schema").as("schema"),
          col("parent_id").as("value"),
          lit(null).cast("string").as("original_value"),
          col("dataset"),
          lit("expand").as("origin"),
          lit(null).cast("string").as("lang"),
          col("external"), col("first_seen"), col("last_seen"))
      pulled.unionByName(rev, allowMissingColumns = true)
    }
  }
}

object YenteEnricher {

  /** FtM `Namespace().apply`: an id `plain.sig` loses the signature
    * after the last dot; an unsigned id passes through.
    */
  def stripNs(c: Column): Column = regexp_replace(c, "\\.[^.]+$", "")

  private[enrich] val matchableSchemata: Seq[String] =
    Ftm.schemata.keys.filter(Ftm.isMatchable).toSeq.sorted

  private[enrich] val matchableProps: Seq[String] = (for {
    sch <- Ftm.schemata.keys.toSeq if Ftm.isMatchable(sch)
    (p, prop) <- Ftm.propsOf(sch)
    if prop.matchable && prop.tpe != Ftm.T.Entity
  } yield s"$sch:$p").sorted
}
