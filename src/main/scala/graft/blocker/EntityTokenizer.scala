package graft.blocker

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Ftm

/** Typed entity tokenizer — the FtM-aware token emission of the
  * reference (`blocker/tokenizer.py:61-132`), columnar: every family is
  * a select + explode over the statement table (map-side only; the one
  * shuffle is the final per-entity count groupBy, which IS the inverted
  * index build `blocker/index.py:162-169`).
  *
  * Emission families (field → token prefix):
  *  - `name`  → `n:<fingerprint>` — sorted distinct name parts joined
  *  - `np`    → `np:<part>` — name parts of length 3..30, set semantics
  *  - `country`/`phone`/`email` → full lowercase value, set semantics
  *  - `identifier` → `i:<A-Z0-9-normalized>`, set semantics
  *  - `date`  → `d:<value[:10]>`, set semantics
  *  - `address` → `a:<word>` for words >3 chars (counted), plus
  *    `wd:<word>` for words >6 chars
  *  - string/text/identifier values → `wd:<token>` for tokens ≥6 chars
  *    (counted)
  *  - `sy`    → `sy:<category>:<id>` symbol tokens from name parts
  *    (org-class groups, name-variant groups, nicknames, locations,
  *    numerals — [[graft.text.Symbols.blockingSymbols]]), set
  *    semantics; the engine's analogue of the reference's symbol-span
  *    emission (`blocker/tokenizer.py:71-78`, which skips the INITIAL
  *    and SYMBOL categories)
  */
object EntityTokenizer {

  val WordField = "wd"
  val NamePartField = "np"
  val SymbolField = "sy"

  /** Reference boosts (`blocker/index.py:87-95`): full-name fingerprints
    * 15×, phone/email/identifier 10×, name parts 5×, address 1×, generic
    * words 0.5×, every other field 1×.
    */
  val Boosts: Seq[(String, Double)] = Seq(
    NamePartField -> 5.0, WordField -> 0.5, "name" -> 15.0,
    "phone" -> 10.0, "email" -> 10.0, "address" -> 1.0,
    "identifier" -> 10.0)

  /** Alias-damped fields (`blocker/index.py:521`). */
  val DampFields: Seq[String] = Seq(NamePartField, SymbolField)

  val SkipProperties: Set[String] = Set(
    "wikidataId", "wikipediaUrl", "publisher", "publisherUrl", "programId",
    "recordId", "legalForm", "status")

  /** Multi-language function words standing in for rigour's
    * `is_stopword`: filtered from generic word tokens and damped in
    * name alignment. English, German, Dutch, Romance and Slavic
    * articles/prepositions that appear inside entity names.
    */
  val Stopwords: Seq[String] = Seq(
    "the", "and", "for", "with", "from",
    "von", "und", "der", "die", "das", "des", "den", "dem", "ein",
    "eine", "fur", "bei", "nach", "uber", "unter", "zum", "zur",
    "van", "het", "een", "ten", "ter",
    "les", "los", "las", "del", "della", "delle", "degli", "dei",
    "aux", "par", "pour", "sur", "chez", "et",
    "dos", "nas", "nos", "pelo", "pela",
    "och", "med", "pa", "av",
    "na", "po", "pri", "za", "iz", "ot", "pod", "nad")

  /** Accent-fold source/target alphabets — shared with the DuckDB
    * oracle SQL (BlockerQueries) so both sides tokenize identically on
    * accented input.
    */
  val FoldSrc = "àáâãäåæçèéêëìíîïñòóôõöøùúûüýÿšžđ"
  val FoldDst = "aaaaaaaceeeeiiiinoooooouuuuyyszd"

  /** Lower + latin-1 accent fold (ä→a … ß→ss) — the pragmatic subset of
    * rigour's transliteration the fixtures need.
    */
  def foldAscii(c: Column): Column =
    translate(regexp_replace(lower(c), "ß", "ss"), FoldSrc, FoldDst)

  /** Lowercased, folded, non-alphanumeric-split parts of a value. */
  def parts(c: Column): Column =
    filter(split(foldAscii(c), "[^a-z0-9]+"), p => length(p) > 0)

  private def tok(field: Column, token: Column): Column =
    struct(field.as("field"), token.as("token"))

  /** Matchable-schema statement projection shared by the batch entries
    * build and the streaming tokenizer: filter + column shaping only.
    */
  def preparedStatements(stmts: DataFrame, idCol: String): DataFrame = {
    val matchable = Ftm.schemata.keys.filter(Ftm.isMatchable).toSeq
    stmts
      .filter(col("schema").isin(matchable: _*) &&
        !col("prop").isin(SkipProperties.toSeq: _*))
      .select(col(idCol).as("id"), col("schema"), col("prop"),
        col("prop_type"), col("value"))
  }

  /** Statements → (schema, id, field, token, cnt) entries for matchable
    * schemata. `idCol` selects entity_id vs canonical_id grouping.
    */
  def entries(stmts: DataFrame, idCol: String = "canonical_id"): DataFrame = {
    val st = preparedStatements(stmts, idCol)
    val setFam = setFamilyRows(st)
      .distinct()
      .withColumn("cnt", lit(1L))
    val counted = countedFamilyRows(st)
      .groupBy(col("id"), col("schema"), col("field"), col("token"))
      .agg(count(lit(1)).as("cnt"))

    val union = setFam.select(col("schema"), col("id"), col("field"),
        col("token"), col("cnt"))
      .unionByName(counted.select(col("schema"), col("id"), col("field"),
        col("token"), col("cnt")))
    // One row per (id, field, token) with the cluster's MERGED schema:
    // a mixed-schema canonical cluster (Person merged under LegalEntity)
    // must not emit the same token once per statement schema — that
    // doubles n in the pair score and inflates xref ranking. The
    // reference tokenizes the assembled entity, which has one schema.
    // The groupBy key matches the per-entity count shuffle that was
    // already here; commonSchema runs on the (tiny) distinct-schema set.
    union
      .groupBy(col("id"), col("field"), col("token"))
      .agg(commonSchemaUdf(collect_set(col("schema"))).as("schema"),
        sum(col("cnt")).as("cnt"))
      .select(col("schema"), col("id"), col("field"), col("token"),
        col("cnt"))
  }

  /** Set-semantics token families (one row per occurrence, PRE-distinct)
    * — stateless narrow transforms over prepared statements, shared by
    * [[entries]] and the streaming tokenizer (which dedupes in its own
    * state instead of a batch `distinct`).
    */
  def setFamilyRows(st: DataFrame): DataFrame = {
    val p = parts(col("value"))

    val nameFp = st.filter(col("prop_type") === Ftm.T.Name)
      .select(col("id"), col("schema"),
        array_join(array_sort(array_distinct(p)), "").as("fp"))
      .filter(length(col("fp")) > 3 && length(col("fp")) < 200)
      .select(col("id"), col("schema"), lit("name").as("field"),
        concat(lit("n:"), col("fp")).as("token"))
    val nameParts = st.filter(col("prop_type") === Ftm.T.Name)
      .select(col("id"), col("schema"), explode(p).as("part"))
      .filter(length(col("part")) >= 3 && length(col("part")) <= 30)
      .select(col("id"), col("schema"), lit(NamePartField).as("field"),
        concat(lit("np:"), col("part")).as("token"))
    val full = st
      .filter(col("prop_type").isin(Ftm.T.Country, Ftm.T.Phone, Ftm.T.Email))
      .select(col("id"), col("schema"), col("prop_type").as("field"),
        concat(col("prop_type"), lit(":"),
          lower(substring(col("value"), 1, 300))).as("token"))
    val ident = st.filter(col("prop_type") === Ftm.T.Identifier)
      .select(col("id"), col("schema"), lit("identifier").as("field"),
        concat(lit("i:"),
          regexp_replace(upper(col("value")), "[^A-Z0-9]+", "")).as("token"))
      .filter(length(col("token")) > 2)
    val date = st.filter(col("prop_type") === Ftm.T.Date)
      .select(col("id"), col("schema"), lit("date").as("field"),
        concat(lit("d:"), substring(col("value"), 1, 10)).as("token"))
    val symbols = st.filter(col("prop_type") === Ftm.T.Name)
      .select(col("id"), col("schema"), explode(symbolsUdf(p)).as("token"))
      .select(col("id"), col("schema"), lit(SymbolField).as("field"),
        col("token"))
    nameFp.unionByName(nameParts).unionByName(full)
      .unionByName(ident).unionByName(date).unionByName(symbols)
  }

  /** Counted token families (one row per occurrence, PRE-count) —
    * stateless, shared like [[setFamilyRows]].
    */
  def countedFamilyRows(st: DataFrame): DataFrame = {
    val p = parts(col("value"))
    val addrWords = st.filter(col("prop_type") === Ftm.T.Address)
      .select(col("id"), col("schema"), explode(p).as("w"))
      .filter(!col("w").isInCollection(Stopwords))
    val addrA = addrWords.filter(length(col("w")) > 3)
      .select(col("id"), col("schema"), lit("address").as("field"),
        concat(lit("a:"), col("w")).as("token"))
    val addrWd = addrWords.filter(length(col("w")) > 6)
      .select(col("id"), col("schema"), lit(WordField).as("field"),
        concat(lit("wd:"), col("w")).as("token"))
    val words = st
      .filter(col("prop_type").isin(Ftm.T.StringT, Ftm.T.Text,
        Ftm.T.Identifier))
      .select(col("id"), col("schema"), explode(p).as("w"))
      .filter(length(col("w")) >= 6 && !col("w").isInCollection(Stopwords))
      .select(col("id"), col("schema"), lit(WordField).as("field"),
        concat(lit("wd:"), col("w")).as("token"))
    addrA.unionByName(addrWd).unionByName(words)
  }

  private val commonSchemaUdf =
    udf((schemata: Seq[String]) => Ftm.commonSchema(schemata))

  private val symbolsUdf = udf((parts: Seq[String]) =>
    parts.flatMap(graft.text.Symbols.blockingSymbols).distinct)

  /** Symbol tokens of raw (id, schema, value) name rows →
    * (schema, id, field='sy', token, cnt=1), set semantics. The
    * standalone form of the `sy` family for callers whose input is not
    * a full statement table (q_blk_symbols).
    */
  def symbolEntries(named: DataFrame): DataFrame =
    named.select(col("schema"), col("id"),
        explode(symbolsUdf(parts(col("value")))).as("token"))
      .distinct()
      .select(col("schema"), col("id"), lit(SymbolField).as("field"),
        col("token"), lit(1L).as("cnt"))
}
