package graft.textanalysis

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Bigram language-model scoring with stupid backoff — the CCNet-style
  * "perplexity filter" of a training-data pipeline: train a count LM on
  * a held-out reference slice, score every document by its mean token
  * log-probability, and keep/bucket documents by that score (CCNet uses
  * a Wikipedia-trained KenLM; the relational form is engine-agnostic —
  * counts are just aggregates).
  *
  * Train/score split is content-keyed (same md5-bucket idiom as
  * q_doc_sample): documents whose hash bucket falls under 50% form the
  * training slice, so the split is reproducible across engines and
  * partitionings, and non-train documents genuinely exercise the
  * backoff/OOV paths.
  *
  * Model (Brants et al. 2007 "stupid backoff", unnormalized scores):
  *   S(w | prev) = count(prev, w) / count(prev)   if the bigram was seen
  *               = 0.4 · S(w)                      otherwise
  *   S(w)        = coalesce(count(w), 0.5) / T    (0.5 = OOV pseudocount)
  * First token of a document scores S(w) without the backoff penalty.
  *
  * Scale shape (100 TB): the LM tables are vocabulary-sized hash
  * aggregates with full map-side combine (the corpus token stream never
  * self-joins); scoring is two equi-joins of the token stream against
  * the unigram table and one against the bigram table — all
  * hash-partitioned on the term key, no window, no sort. A production
  * run writes the count tables to the lake once and scores any corpus
  * against them; a pruned LM (top-|V| rows) becomes a broadcast join.
  *
  * Per-token log terms are floored to 1e-6 fixed-point BIGINT before
  * the per-document sum (the same determinism rule as BM25/k-means:
  * double addition is non-associative, integer sums are partition- and
  * engine-independent).
  */
object LangModel {

  val Backoff = 0.4
  val OovCount = 0.5
  /** md5 buckets below this (of 65536) train the LM — a 50% split. */
  val TrainBuckets = 32768

  /** Vocabulary cap before the broadcast joins: unique-bigram counts
    * grow with the corpus (not the vocabulary), so an uncapped table
    * would eventually blow the broadcast/driver limits. When the
    * trained vocabulary exceeds this, only the top-|V| terms (count
    * desc, term asc) keep their counts; pruned terms degrade to the
    * OOV pseudocount and their bigrams to backoff — the CCNet-style
    * top-|V| approximation. Under the cap (every test SF) scoring is
    * bit-identical to the unpruned model. 1M terms ≈ tens of MB
    * broadcast; both tables stay bounded by construction, so the
    * plan-pinned broadcast shape (PlanShapeSpec) is safe at any
    * corpus size.
    */
  val LmTopV = 1000000L

  /** Bigram rows kept per context term once the vocabulary cap has
    * engaged: the term cap alone bounds bigrams only by |V|², so the
    * pruned path also keeps the top-N continuations per context
    * (count desc, term asc) — the table is then ≤ |V|·N rows BY
    * CONSTRUCTION (1M × 64 worst case, far below real corpora's
    * concentration; dropped bigrams back off like any unseen pair).
    * Under the vocabulary cap nothing is pruned at all.
    */
  val LmBigramsPerContext = 64

  private def bucket = conv(substring(
    md5(col("doc_id").cast("string")), 1, 4), 16, 10).cast("long")

  /** The capped LM count tables as ONE kind-tagged lake artifact
    * (`uni` ≤ topV + `bi` ≤ topV·64 + 1 `tot` row — model-sized, a
    * trained model is ingest output, not query work): before this,
    * q_text_lm and q_doc_curriculum each re-ran the training aggregate
    * and its vocabulary count per invocation (~0.5-0.8 s of JobCount
    * build time at sf0.1).
    */
  def lmModelCk(s: SparkSession, d: String): DataFrame =
    graft.IndexLake.artifact(s, d, "lm_model") {
      val (uni, bi, tot) =
        lmTables(corpusTokenRows(s, d).filter(bucket < TrainBuckets),
          LmTopV, LmBigramsPerContext)
      uni.select(lit("uni").as("kind"), lit(null).cast("string").as("prev"),
          col("term"), col("un").as("cnt"))
        .unionByName(bi.select(lit("bi").as("kind"), col("prev"),
          col("term"), col("bc").as("cnt")))
        .unionByName(tot.select(lit("tot").as("kind"),
          lit(null).cast("string").as("prev"),
          lit(null).cast("string").as("term"), col("t").as("cnt")))
    }

  /** (uni, bi, tot) views of [[lmModelCk]] — each consumer's filter and
    * projection prune the artifact scan.
    */
  private def lmTablesCk(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val a = lmModelCk(s, d)
    (a.filter(col("kind") === "uni").select(col("term"), col("cnt").as("un")),
      a.filter(col("kind") === "bi")
        .select(col("prev"), col("term"), col("cnt").as("bc")),
      a.filter(col("kind") === "tot").select(col("cnt").as("t")))
  }

  /** Token rows (doc_id, term, prev) of the document corpus, scattered
    * once (explicit count — AQE-coalesce-exempt) so tokenize+posexplode
    * runs at full parallelism for every consumer.
    */
  private def corpusTokenRows(s: SparkSession, d: String): DataFrame =
    tokenRows(Tables.documents(s, d))

  def lmScoreQ(s: SparkSession, d: String): DataFrame = {
    val (uni, bi, tot) = lmTablesCk(s, d)
    lmScoreFrom(corpusTokenRows(s, d), uni, bi, tot)
  }

  def lmScoreOf(docs: DataFrame): DataFrame =
    lmScoreOf(docs, LmTopV, LmBigramsPerContext)

  def lmScoreOf(docs: DataFrame, topV: Long): DataFrame =
    lmScoreOf(docs, topV, LmBigramsPerContext)

  def lmScoreOf(docs: DataFrame, topV: Long,
      bigramsPerContext: Int): DataFrame = {
    val rows = tokenRows(docs)
    val (uni, bi, tot) =
      lmTables(rows.filter(bucket < TrainBuckets), topV, bigramsPerContext)
    lmScoreFrom(rows, uni, bi, tot)
  }

  /** Token rows (doc_id, term, prev) of a document frame. Scatters the
    * raw docs once (explicit count — AQE-coalesce-exempt) so the
    * tokenize+posexplode runs at full parallelism for every consumer
    * (train aggregate and/or scoring pass) instead of on the
    * one-row-group scan task. posexplode's pos is 0-based, element_at
    * is 1-based, so element_at(w, pos) IS the previous word.
    */
  private def tokenRows(docs: DataFrame): DataFrame =
    TextAnalysis.withWords(docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism,
        col("doc_id")))
      .filter(size(col("w")) > 0)
      .select(col("doc_id"), col("w"))
      .select(col("doc_id"), col("w"),
        posexplode(col("w")).as(Seq("pos", "term")))
      .select(col("doc_id"), col("term"),
        when(col("pos") > 0, element_at(col("w"), col("pos"))).as("prev"))

  /** The scoring tail over token rows and (uni, bi, tot) count tables —
    * integer e6 sums keep the result partitioning-invariant.
    */
  private def lmScoreFrom(rows: DataFrame, uni: DataFrame, bi: DataFrame,
      tot: DataFrame): DataFrame = {
    val unPrev = uni.select(col("term").as("prev"), col("un").as("un_prev"))
    val pUni = coalesce(col("un").cast("double"), lit(OovCount)) /
      col("t").cast("double")
    val p = when(col("prev").isNull, pUni)
      .when(col("bc").isNotNull,
        col("bc").cast("double") / col("un_prev").cast("double"))
      .otherwise(lit(Backoff) * pUni)
    // LM tables broadcast — bounded by the LmTopV cap above, so the
    // hint is safe at any corpus size; the corpus token stream is
    // never shuffled on a term key, only hash-aggregated by doc at
    // the end
    val scored = rows
      .join(broadcast(uni), Seq("term"), "left")
      .join(broadcast(unPrev), Seq("prev"), "left")
      .join(broadcast(bi), Seq("prev", "term"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        floor(log(p) * lit(1e6) + lit(0.5)).cast("long").as("e6"))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("e6")).as("s6"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("s6").cast("double") /
          (col("n_tokens").cast("double") * lit(1e6)), 6).as("avg_logp"))
  }

  /** Capped LM count tables from (prev, term) token rows — the shared
    * train core of [[lmScoreOf]] and [[train]]. ONE training pass over
    * the corpus: grouping on (prev, term) with prev-null rows included
    * makes the bigram table a sufficient statistic — unigram counts
    * and the token total are vocabulary-sized rollups of it
    * (un(w) = Σ_prev bc(prev, w): every token occurrence is exactly
    * one (prev, term) row). localCheckpoint before the fan-out so the
    * derived tables don't each re-inline the corpus explode (the
    * PLANS.md fan-out rule). Returns (uni ≤ topV rows,
    * bi ≤ topV·bigramsPerContext rows, 1-row full-corpus token total —
    * computed BEFORE any cap: pruned mass becomes OOV mass, it does
    * not vanish).
    */
  private def lmTables(tokenRows: DataFrame, topV: Long,
      bigramsPerContext: Int): (DataFrame, DataFrame, DataFrame) = {
    // pinned, not checkpointed (corpus-vocabulary-sized, three
    // consumers): lineage retained, no on-heap block tax
    val biAll = graft.Caches.pin(tokenRows
      .groupBy(col("prev"), col("term")).agg(count(lit(1)).as("bc")))
    val uniAll = biAll.groupBy(col("term")).agg(sum(col("bc")).as("un"))
    val tot = uniAll.agg(sum(col("un")).as("t"))
    // top-|V| cap (see LmTopV): the count runs on the checkpointed
    // vocabulary table, never the corpus. Both prune sides key on the
    // same kept-term set, so a surviving bigram always finds its
    // context count (bc non-null ⇒ un_prev non-null).
    val (uni, bi) =
      if (uniAll.count() <= topV)
        (uniAll, biAll.filter(col("prev").isNotNull)
          .select(col("prev"), col("term"), col("bc")))
      else {
        val keep = uniAll
          .orderBy(col("un").desc, col("term").asc).limit(topV.toInt)
          .select(col("term")).localCheckpoint(true)
        val biKept = biAll.filter(col("prev").isNotNull)
          .select(col("prev"), col("term"), col("bc"))
          .join(keep, Seq("term"), "left_semi")
          .join(keep.select(col("term").as("prev")), Seq("prev"),
            "left_semi")
        // |V|·N bound: top continuations per context (see
        // LmBigramsPerContext) — a per-context window, never global
        val wCtx = org.apache.spark.sql.expressions.Window
          .partitionBy(col("prev"))
          .orderBy(col("bc").desc, col("term").asc)
        (uniAll.join(keep, Seq("term"), "left_semi"),
          biKept.withColumn("brn", row_number().over(wCtx))
            .filter(col("brn") <= bigramsPerContext).drop("brn"))
      }
    (uni, bi, tot)
  }

  // -------------------------------------------------- servable model form

  /** A trained LM small enough to broadcast (production prunes to the
    * top-|V| unigrams/bigrams before shipping — the count tables are
    * already vocabulary-sized). `avgLogp` reproduces the fixed-point
    * arithmetic of [[lmScoreOf]] exactly, so a stream gated with this
    * model and a batch rescore agree bit-for-bit.
    */
  final case class LmModel(uni: Map[String, Long],
      bi: Map[(String, String), Long], total: Long) extends Serializable {
    def avgLogp(words: Seq[String]): Option[Double] = {
      if (words.isEmpty || total == 0L) return None
      var s6 = 0L
      var prev: String = null
      for (w <- words) {
        val pUni = uni.get(w).map(_.toDouble).getOrElse(OovCount) / total
        // uni.get guard: a top-|V|-pruned model may keep a bigram whose
        // context fell below the unigram cutoff — back off, don't throw
        val p =
          if (prev == null) pUni
          else (bi.get((prev, w)), uni.get(prev)) match {
            case (Some(bc), Some(un)) => bc.toDouble / un.toDouble
            case _ => Backoff * pUni
          }
        s6 += math.floor(math.log(p) * 1e6 + 0.5).toLong
        prev = w
      }
      Some(BigDecimal(s6.toDouble / (words.length * 1e6))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  /** Train an [[LmModel]] on the ENTIRE given frame (callers hold out
    * their own reference slice — [[lmScoreOf]] shows the hash-split
    * idiom). One corpus aggregation; the collects are capped BY
    * CONSTRUCTION to ≤ topV unigram rows and ≤ topV·bigramsPerContext
    * bigram rows (the [[lmTables]] prune — unique bigrams grow with
    * corpus content, so an uncapped collect would be a driver OOM at
    * scale). Pruned terms degrade to OOV and pruned bigrams to
    * backoff exactly as in [[lmScoreOf]]; `total` is the FULL pre-cap
    * token count, and [[LmModel.avgLogp]] already backs off on pruned
    * contexts.
    */
  def train(docs: DataFrame): LmModel =
    train(docs, LmTopV, LmBigramsPerContext)

  def train(docs: DataFrame, topV: Long, bigramsPerContext: Int): LmModel = {
    val rows = TextAnalysis.withWords(docs)
      .filter(size(col("w")) > 0)
      .select(col("w"), posexplode(col("w")).as(Seq("pos", "term")))
      .select(col("term"),
        when(col("pos") > 0, element_at(col("w"), col("pos"))).as("prev"))
    val (uniDf, biDf, totDf) = lmTables(rows, topV, bigramsPerContext)
    val uni = uniDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bi = biDf.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    LmModel(uni, bi, totDf.head().getLong(0))
  }

  // ---------------------------------------------------------------- oracle

  private val wSql = TextAnalysis.wSql

  private def d(x: Double): String = s"CAST($x AS DOUBLE)"

  /** Per-language curriculum bucketing: split each language's corpus
    * into [[CurriculumStages]] difficulty quartiles by LM score
    * (stage 1 = most-probable/easiest text first — the curriculum-
    * learning ordering), fully tiebroken so the stage assignment is
    * deterministic across engines. One window over the vocabulary-
    * joined score table; the corpus itself is only touched by the LM
    * scorer's two passes.
    */
  val CurriculumStages = 4

  def curriculumQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // stored-model scoring (lmScoreQ) — the curriculum reads the same
    // lm_model artifact instead of re-training per invocation
    val scored = lmScoreQ(s, d)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    scored.withColumn("stage", ntile(CurriculumStages).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
          .orderBy(col("avg_logp").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("lang"), col("avg_logp"), col("stage"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_lm" -> (lmScoreQ _),
    "q_doc_curriculum" -> (curriculumQ _))

  /** The scorer's CTE chain + final aggregate, shared by both oracles. */
  private lazy val lmCtes: String = s"""
      WITH wd AS (SELECT doc_id, $wSql AS w FROM documents),
      base AS (SELECT doc_id, w FROM wd WHERE len(w) > 0),
      rows_ AS (
        SELECT doc_id, w[i] AS term,
               CASE WHEN i > 1 THEN w[i - 1] END AS prev
        FROM base, unnest(range(1, len(w) + 1)) t(i)),
      train AS (
        SELECT * FROM rows_
        WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                AS BIGINT) < $TrainBuckets),
      uni AS (SELECT term, count(*) AS un FROM train GROUP BY term),
      bi AS (
        SELECT prev, term, count(*) AS bc FROM train
        WHERE prev IS NOT NULL GROUP BY prev, term),
      tot AS (SELECT count(*) AS t FROM train),
      contrib AS (
        SELECT r.doc_id,
               CAST(floor(ln(
                 CASE
                   WHEN r.prev IS NULL THEN
                     coalesce(CAST(u.un AS DOUBLE), ${d(OovCount)})
                       / CAST(tot.t AS DOUBLE)
                   WHEN b.bc IS NOT NULL THEN
                     CAST(b.bc AS DOUBLE) / CAST(up.un AS DOUBLE)
                   ELSE ${d(Backoff)} *
                     coalesce(CAST(u.un AS DOUBLE), ${d(OovCount)})
                       / CAST(tot.t AS DOUBLE)
                 END) * 1e6 + ${d(0.5)}) AS BIGINT) AS e6
        FROM rows_ r
        LEFT JOIN uni u ON r.term = u.term
        LEFT JOIN uni up ON r.prev = up.term
        LEFT JOIN bi b ON r.prev = b.prev AND r.term = b.term
        CROSS JOIN tot),
      scored AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               round(CAST(sum(e6) AS DOUBLE)
                 / (CAST(count(*) AS DOUBLE) * 1e6), 6) AS avg_logp
        FROM contrib GROUP BY doc_id)
      """

  val oracles: Map[String, String] = Map(
    "q_text_lm" -> (lmCtes +
      "SELECT doc_id, n_tokens, avg_logp FROM scored"),
    "q_doc_curriculum" -> (lmCtes + s"""
      SELECT s.doc_id, d.lang, s.avg_logp,
             CAST(ntile($CurriculumStages) OVER (PARTITION BY d.lang
               ORDER BY s.avg_logp DESC, s.doc_id ASC) AS INTEGER) AS stage
      FROM scored s JOIN documents d ON s.doc_id = d.doc_id"""))
}
