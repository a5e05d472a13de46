package graft.xref

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.blocker.{Blocker, EntityTokenizer}
import graft.matching.{Algorithms, EntityMatch}
import graft.model.Ftm
import graft.store.EntityStore

/** The end-to-end xref pipeline (`xref.py:29-160`) in batch form:
  * tokenize → TF-IDF → candidate pairs (limit·limit_factor) → anti-join
  * already-decided pairs → score with a matching algorithm → discount
  * same-dataset pairs ×0.7 → threshold → auto-merge edges above the auto
  * threshold, top-`limit` suggestions otherwise.
  *
  * The reference's per-pair Python loop with patience/budget counters
  * becomes one declarative plan: the pair budget is the blocker's top-N
  * cut, the suggestion limit is a final ordered limit, and patience (a
  * sequential-scan heuristic against wasted scoring) has no analogue
  * because scoring is distributed, not sequential.
  */
object Xref {

  final case class Config(
      limit: Int = 5000,
      limitFactor: Int = 10,
      discountInternal: Double = 0.7,
      minThreshold: Double = 0.01,
      autoThreshold: Option[Double] = None,
      algorithm: String = Algorithms.default.name,
      external: Boolean = true,
      focusDatasets: Set[String] = Set.empty,
      range: Option[String] = None,
      blocker: Blocker.Config = Blocker.Config.reference)

  def compatDf(s: SparkSession): DataFrame = {
    import s.implicits._
    Ftm.compatPairs.toDF("ls", "rs")
  }

  def boostsDf(s: SparkSession): DataFrame = {
    import s.implicits._
    EntityTokenizer.Boosts.toDF("field", "boost")
  }

  /** Scored candidate pairs for a statement table (ids are canonical
    * when `stmts` went through [[graft.resolver.Resolver.applyCanonical]]
    * first, mirroring the reference's canonicalize-on-write).
    */
  def scoredPairs(s: SparkSession, stmts0: DataFrame,
      decided: DataFrame, cfg: Config): DataFrame = {
    // external=true by default, like the reference's xref view
    // (`xref.py:38,61`)
    val stmts = EntityStore.view(stmts0, withExternal = cfg.external)
    val entries = EntityTokenizer.entries(stmts)
    val compat = compatDf(s)
    val tf = Blocker.termFrequencies(entries, compat, boostsDf(s),
      cfg.blocker, dampFields = EntityTokenizer.DampFields)
    val pairs = Blocker.pairs(tf, compat,
      cfg.blocker.copy(maxPairs = cfg.limit * cfg.limitFactor))
    scoreCandidates(s, stmts, undecidedOf(pairs, decided), cfg)
  }

  /** Incremental xref candidates: pairs touching the delta entity set
    * only, generated in O(|Δ| × postings) by
    * [[graft.blocker.Blocker.deltaPairScores]] and scored through the
    * SAME tail as [[scoredPairs]] — the post-MERGE re-xref shape
    * (`xref.py:29-160` run on an increment). `isDelta` is a column
    * predicate over the TF rows (id/schema/field/token); pass a
    * prebuilt `tf` to reuse the ingest-maintained index artifact
    * instead of re-deriving it (Blocker TF is lake-persisted in
    * production — the soak's index_refresh stage).
    */
  def scoredDeltaPairs(s: SparkSession, stmts0: DataFrame,
      decided: DataFrame, isDelta: org.apache.spark.sql.Column,
      cfg: Config, tfPrebuilt: Option[DataFrame] = None): DataFrame = {
    val stmts = EntityStore.view(stmts0, withExternal = cfg.external)
    val compat = compatDf(s)
    val tf = tfPrebuilt.getOrElse {
      Blocker.termFrequencies(EntityTokenizer.entries(stmts), compat,
        boostsDf(s), cfg.blocker, dampFields = EntityTokenizer.DampFields)
    }
    val cand = Blocker.deltaPairScores(tf, isDelta, compat)
    // COLLECT the undecided candidate table (Δ-sized by contract,
    // bounded by the blocker pair budget — the union-find-fast-path
    // idiom) into ONE literal relation: it feeds the endpoint slice
    // AND the scoring join, and the slice is consumed by every
    // analysis view — referencing the O(|Δ|·postings) candidate
    // SUBTREE from each consumer both re-evaluated the join per
    // consumer and sent Catalyst's DeduplicateRelations quadratic
    // (measured 7 s → 86 s at 10×). A pin fixed the re-evaluation but
    // leaked one cached frame per batch in the continuous-increment
    // regime; the literal relation needs no cache at all, and the
    // endpoint id set falls out of the same collected rows with no
    // second job.
    val candRows = undecidedOf(cand, decided)
      .select(col("lid"), col("rid"), col("score")).collect()
    val undecided = s.createDataFrame(
      java.util.Arrays.asList(candRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("lid",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("rid",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.DoubleType))))
    // restrict the scoring corpus to the pair endpoints: the analysis
    // views (assemble, per-entity aggregates, dataset meta) are
    // corpus-sized aggregations, but a delta batch only needs the
    // Δ ∪ partners slice — per-entity derivations are identical on the
    // slice, so results match the full-corpus path row for row while
    // the increment's scoring stays O(|Δ|) instead of O(corpus).
    val ids = candRows.iterator
      .flatMap(r => Iterator(r.getString(0), r.getString(1)))
      .toIndexedSeq.distinct
    import s.implicits._
    // close the slice over addressEntity dereferences: the view
    // builder resolves an entity's address THROUGH the referenced
    // Address entity's statements (EntityMatch.views refFull join), so
    // an endpoint slice without them scores the address features
    // against missing data (measured on donations: a cross-batch pair
    // scored 0.221 on the unclosed slice vs 0.472 on the full corpus —
    // a silently dropped merge edge). One Δ-sized lookup, collected
    // under the same bounded-endpoint contract.
    val refIds = stmts.filter(col("prop") === "addressEntity")
      .join(broadcast(ids.toDF("cid")),
        stmts("canonical_id") === col("cid"), "left_semi")
      .select(col("value")).distinct()
      .collect().map(_.getString(0)).toIndexedSeq
    val slice = stmts.join(broadcast((ids ++ refIds).distinct.toDF("cid")),
      stmts("canonical_id") === col("cid"), "left_semi")
    scoreCandidates(s, slice, undecided, cfg)
  }

  /** Skip already-decided pairs (check_candidate,
    * `resolver.py:284-288`). No broadcast hint: the judgement set
    * grows with every xref round and is unbounded — AQE broadcasts it
    * while small, and the anti join degrades gracefully to a shuffle
    * once it is not.
    */
  private def undecidedOf(pairs: DataFrame, decided: DataFrame): DataFrame = {
    val dec = decided.select(
      least(col("src"), col("dst")).as("da"),
      greatest(col("src"), col("dst")).as("db")).distinct()
    pairs.join(dec,
      least(col("lid"), col("rid")) === col("da") &&
        greatest(col("lid"), col("rid")) === col("db"), "left_anti")
  }

  /** The scoring tail shared by the full and delta candidate paths:
    * assemble views, score with the configured algorithm, gate on
    * focus/range, discount same-dataset pairs, threshold.
    */
  private def scoreCandidates(s: SparkSession, stmts: DataFrame,
      undecided: DataFrame, cfg: Config): DataFrame = {
    val assembled = EntityStore.assemble(stmts)
    val views = EntityMatch.views(assembled, stmts)
    val algoCol = cfg.algorithm.replace("-", "_")
    // gate schema must be deterministic under mixed-schema clusters —
    // reuse the assembled entity's merged FtM schema, not first()
    val meta = stmts.groupBy(col("canonical_id").as("id"))
      .agg(collect_set(col("dataset")).as("ds"))
      .join(assembled.select(col("id"), col("schema")), Seq("id"))
    val lm = meta.select(col("id").as("lid"), col("ds").as("lds"),
      col("schema").as("lschema"))
    val rm = meta.select(col("id").as("rid"), col("ds").as("rds"),
      col("schema").as("rschema"))
    val scored0 = EntityMatch.scorePairs(undecided, views, Seq(cfg.algorithm))
      .join(lm, Seq("lid")).join(rm, Seq("rid"))
    // focus-dataset gate: at least one side in the focus set
    // (`xref.py:105-109`)
    val focused =
      if (cfg.focusDatasets.isEmpty) scored0
      else {
        val f = typedLit(cfg.focusDatasets.toSeq)
        scored0.filter(arrays_overlap(col("lds"), f) ||
          arrays_overlap(col("rds"), f))
      }
    // schema-range gate: one side must descend from the range schema
    // (`xref.py:111-116`)
    val ranged = cfg.range match {
      case None => focused
      case Some(r) =>
        val inRange = Ftm.schemata.keys
          .filter(sc => Ftm.ancestors(sc).contains(r)).toSeq
        focused.filter(col("lschema").isin(inRange: _*) ||
          col("rschema").isin(inRange: _*))
    }
    ranged
      .select(col("lid"), col("rid"),
        round(when(arrays_overlap(col("lds"), col("rds")),
          col(algoCol) * cfg.discountInternal).otherwise(col(algoCol)), 6)
          .as("score"))
      .filter(col("score") >= cfg.minThreshold)
  }

  /** Top-`limit` suggestions below the auto threshold
    * (`xref.py:150-153` + `resolver.suggest`).
    */
  def suggestions(s: SparkSession, stmts: DataFrame, decided: DataFrame,
      cfg: Config = Config()): DataFrame = {
    val scored = scoredPairs(s, stmts, decided, cfg)
    val below = cfg.autoThreshold match {
      case Some(t) => scored.filter(col("score") <= t)
      case None => scored
    }
    below.orderBy(col("score").desc, col("lid").asc, col("rid").asc)
      .limit(cfg.limit)
  }

  /** Pairs above the auto-merge threshold → positive judgement edges
    * (`xref.py:138-147`).
    */
  def autoMerges(s: SparkSession, stmts: DataFrame, decided: DataFrame,
      cfg: Config): DataFrame = {
    val scored = scoredPairs(s, stmts, decided, cfg)
    val gate = cfg.autoThreshold
      .map(t => col("score") > t).getOrElse(lit(false))
    scored.filter(gate)
      .select(col("lid").as("src"), col("rid").as("dst"), col("score"))
  }

  /** The standard xref run (`xref.py:138-153`): ONE scored pass,
    * materialized, then partitioned into (auto-merge edges,
    * suggestions) — calling [[autoMerges]] and [[suggestions]]
    * separately executes the whole tokenize/TF/pair/score pipeline
    * twice.
    */
  def run(s: SparkSession, stmts: DataFrame, decided: DataFrame,
      cfg: Config = Config()): (DataFrame, DataFrame) = {
    // DISK_ONLY, not localCheckpoint(true): the scored table is bounded
    // by limit·limitFactor (50k at reference defaults) but operators
    // raise the cap — spilling to local disk keeps a raised cap from
    // pinning executor memory; the extra pass is one scan of a slim
    // (lid, rid, score) table
    val scored = scoredPairs(s, stmts, decided, cfg)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    scored.count() // materialize once, before both consumers fork
    val gate = cfg.autoThreshold
      .map(t => col("score") > t).getOrElse(lit(false))
    val merges = scored.filter(gate)
      .select(col("lid").as("src"), col("rid").as("dst"), col("score"))
    val below = cfg.autoThreshold match {
      case Some(t) => scored.filter(col("score") <= t)
      case None => scored
    }
    val suggest = below
      .orderBy(col("score").desc, col("lid").asc, col("rid").asc)
      .limit(cfg.limit)
    (merges, suggest)
  }
}
