package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Wikipedia lead-paragraph summaries for reconciliation review, in
  * mirror form (`wikidata/wikipedia.py:1-130`): the reference fetches
  * `page/summary` per candidate from the CDN REST endpoint with a
  * SQL response cache; the batch shape joins against a mirrored
  * summaries table (site, title, extract) — the same rows that cache
  * would hold, with the reference's `""` no-summary sentinel.
  *
  * Language preference (`preferred_langs`): the person's own country
  * languages first — a national politician's native-language article is
  * the richest — then the global list, deduplicated in priority order.
  * Summary selection (`item_wikipedia_summaries`): walk the item's
  * sitelinks in that order, prefer the plain wiki over variant wikis
  * (zh over zh-classical), skip languages outside the preference list,
  * cap per candidate.
  */
object Wikipedia {

  /** Per-candidate summary ceiling (`wikipedia.py:26` MAX_SUMMARIES). */
  val MaxSummaries = 5

  /** Globally preferred review languages (`rigour.langs
    * PREFERRED_LANGS` — the wiki-language subset, `mul` is not a wiki).
    */
  val GlobalLangs: Seq[String] =
    Seq("eng", "spa", "fra", "deu", "rus", "ara")

  /** Country → ordered primary languages, ISO 639-3 (public CLDR
    * knowledge; the engine's stand-in for `rigour.territories` langs).
    */
  val CountryLangs: Map[String, Seq[String]] = Map(
    "dz" -> Seq("ara", "fra"), "ar" -> Seq("spa"),
    "br" -> Seq("por"), "ca" -> Seq("eng", "fra"),
    "eg" -> Seq("ara"), "et" -> Seq("amh", "eng"),
    "fr" -> Seq("fra"), "de" -> Seq("deu"),
    "in" -> Seq("hin", "eng"), "id" -> Seq("ind"),
    "ir" -> Seq("fas"), "iq" -> Seq("ara", "kur"),
    "jp" -> Seq("jpn"), "jo" -> Seq("ara"),
    "ke" -> Seq("swa", "eng"), "ma" -> Seq("ara", "fra"),
    "mz" -> Seq("por"), "pe" -> Seq("spa"), "cn" -> Seq("zho"),
    "ro" -> Seq("ron"), "ru" -> Seq("rus"), "sa" -> Seq("ara"),
    "gb" -> Seq("eng"), "us" -> Seq("eng"), "vn" -> Seq("vie"),
    "ua" -> Seq("ukr", "rus"), "su" -> Seq("rus"),
    "es" -> Seq("spa"), "it" -> Seq("ita"), "nl" -> Seq("nld"),
    "pl" -> Seq("pol"), "se" -> Seq("swe"), "tr" -> Seq("tur"),
    "au" -> Seq("eng"), "mx" -> Seq("spa"), "kz" -> Seq("kaz", "rus"))

  private val countryLangsLit = typedLit(CountryLangs)
  private val globalLangsLit = typedLit(GlobalLangs)
  private val langIsoLit = typedLit(Wikidata.LangIso)

  /** Ordered language preference per person (`wikipedia.py:64-84`
    * `preferred_langs`): `(entity_id, lang, rank)`, smaller rank =
    * higher preference. Countries sort alphabetically for determinism
    * (the reference iterates a set); a lang keeps its best rank.
    */
  def preferredLangs(personStmts: DataFrame): DataFrame = {
    // ONE aggregation, then pure array algebra: sorted own countries →
    // their language lists flattened (rank order = country order, langs
    // in-country order) → global tail appended → array_distinct keeps
    // the FIRST occurrence, i.e. each lang's best rank — the position
    // IS the preference rank. Replaces an agg + distinct + union +
    // re-agg (three shuffles → one) with identical ordering semantics.
    val empty = array().cast("array<string>")
    personStmts.groupBy(col("entity_id"))
      .agg(sort_array(collect_set(when(col("prop_type") === "country",
        col("value")))).as("countries"))
      .select(col("entity_id"),
        posexplode(array_distinct(concat(
          flatten(transform(col("countries"),
            c => coalesce(element_at(countryLangsLit, c), empty))),
          globalLangsLit))).as(Seq("rank", "lang")))
  }

  /** Candidate summaries (`wikipedia.py:86-130`
    * `item_wikipedia_summaries` over the whole candidate table):
    * `candidates` is `(entity_id, qid)`, `snaks` the parsed dump (for
    * `sitelink` rows), `summariesTbl` the mirrored
    * `(site, title, extract)` responses — `""` is the cached
    * no-summary sentinel, a missing row an unfetched page; both drop.
    * Returns `(entity_id, qid, lang, summary)`, at most `limit` rows
    * per candidate in preference order.
    *
    * The summaries mirror joins on (site, title) — dwarfed by a real
    * candidate corpus, so it broadcasts; the candidate×sitelink join
    * shuffles on the qid like every other dump join.
    */
  def summaries(candidates: DataFrame, snaks: DataFrame,
      prefLangs: DataFrame, summariesTbl: DataFrame,
      limit: Int = MaxSummaries): DataFrame = {
    // variant wikis (zh-classical, be-x-old) resolve to the plain
    // language code (`wikipedia.py:105-116`)
    val langOf = element_at(langIsoLit,
      regexp_extract(regexp_replace(col("site"), "wiki$", ""),
        "^([a-z]+)", 1))
    // plain wiki beats variant wiki for the same language
    // (`wikipedia.py:105-116`): zhwiki over zh-classicalwiki — as ONE
    // argmin aggregation (min over the (variant, site, title) struct =
    // the former rank-1 row of the (variant, site) window; (qid, site)
    // is unique in a dump, so the tiebreak never decides): map-side
    // partials collapse the sitelink rows before the exchange, where
    // the former qid repartition shipped every row and AQE coalesced
    // the window to a single task (measured 104k rows / 1 task at
    // sf0.1)
    val links = snaks.filter(col("role") === "sitelink")
      .select(col("qid"), col("site"), col("title"),
        // variant site codes carry a dash (zh-classical, be-x-old)
        when(col("site").contains("-"), 1).otherwise(0).as("variant"),
        langOf.as("lang"))
      .filter(col("lang").isNotNull)
      .groupBy(col("qid"), col("lang"))
      .agg(min(struct(col("variant"), col("site"), col("title"))).as("m"))
      .select(col("qid"), col("lang"), col("m.site").as("site"),
        col("m.title").as("title"))
    // no re-keying after the qid join: the stream side stays
    // partitioned by qid, which already satisfies the final
    // per-candidate (entity_id, qid) window clustering (subset rule);
    // the prefLangs side is batch-bounded and broadcasts
    candidates.join(links, Seq("qid"))
      .join(broadcast(prefLangs), Seq("entity_id", "lang"))
      .join(broadcast(summariesTbl), Seq("site", "title"))
      .filter(col("extract").isNotNull && col("extract") =!= "")
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("entity_id"), col("qid"))
        .orderBy(col("rank"), col("lang"))))
      .filter(col("rn") <= limit)
      .select(col("entity_id"), col("qid"), col("lang"),
        col("extract").as("summary"))
  }
}
