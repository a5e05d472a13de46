package graft.model

/** Minimal Follow-the-Money ontology: the schema hierarchy, property
  * types, matchability flags and caption rules the engine's operators
  * need (reference: the `followthemoney` model consumed all over
  * nomenklatura — e.g. schema compatibility `blocker/index.py:220-225`,
  * matchable filter `blocker/index.py:227-228`, property types driving
  * the tokenizer `blocker/tokenizer.py:40-58`).
  *
  * This is a hand-authored subset covering the schemata exercised by the
  * reference's own fixtures (donations.ijson: Organization, Address,
  * Person, Company, Payment) plus their ancestors. It is a broadcastable
  * plain-Scala object: tiny, immutable, shipped to executors by closure
  * capture — never a join against a "model table".
  */
object Ftm {

  /** FtM property types (the registry). Statement values are always
    * strings; the type drives operator behaviour.
    */
  object T {
    val Name = "name"
    val Entity = "entity"
    val Country = "country"
    val Date = "date"
    val Number = "number"
    val Address = "address"
    val Identifier = "identifier"
    val StringT = "string"
    val Text = "text"
    val Email = "email"
    val Phone = "phone"
    val Url = "url"
    val Gender = "gender"
    val Topic = "topic"
  }

  final case class Prop(name: String, tpe: String, matchable: Boolean = true)

  final case class Schema(
      name: String,
      isA: Seq[String],
      matchable: Boolean,
      caption: Seq[String],
      props: Seq[Prop])

  /** Schema definitions (subset of the public FtM ontology). */
  val schemata: Map[String, Schema] = Seq(
    Schema("Thing", Nil, matchable = false, caption = Seq("name"), props = Seq(
      Prop("name", T.Name),
      Prop("alias", T.Name),
      Prop("weakAlias", T.Name, matchable = false),
      Prop("previousName", T.Name),
      Prop("country", T.Country),
      Prop("address", T.Address),
      Prop("addressEntity", T.Entity),
      Prop("sourceUrl", T.Url, matchable = false),
      Prop("notes", T.Text, matchable = false),
      Prop("wikidataId", T.Identifier),
      Prop("wikipediaUrl", T.Url, matchable = false),
      Prop("topics", T.Topic))),
    Schema("LegalEntity", Seq("Thing"), matchable = true, caption = Seq("name"),
      props = Seq(
        Prop("email", T.Email),
        Prop("phone", T.Phone),
        Prop("website", T.Url, matchable = false),
        Prop("legalForm", T.StringT, matchable = false),
        Prop("incorporationDate", T.Date),
        Prop("dissolutionDate", T.Date),
        Prop("taxNumber", T.Identifier),
        Prop("vatCode", T.Identifier),
        Prop("jurisdiction", T.Country),
        Prop("registrationNumber", T.Identifier),
        Prop("idNumber", T.Identifier))),
    Schema("Person", Seq("LegalEntity"), matchable = true,
      caption = Seq("name"), props = Seq(
        Prop("title", T.Name, matchable = false),
        Prop("firstName", T.Name),
        Prop("secondName", T.Name),
        Prop("middleName", T.Name),
        Prop("fatherName", T.Name),
        Prop("motherName", T.Name),
        Prop("lastName", T.Name),
        Prop("birthDate", T.Date),
        Prop("birthPlace", T.StringT),
        Prop("deathDate", T.Date),
        Prop("nationality", T.Country),
        Prop("citizenship", T.Country),
        Prop("gender", T.Gender),
        Prop("religion", T.StringT, matchable = false),
        Prop("education", T.StringT, matchable = false),
        Prop("political", T.StringT, matchable = false),
        Prop("ethnicity", T.StringT, matchable = false),
        Prop("position", T.StringT, matchable = false))),
    Schema("Organization", Seq("LegalEntity"), matchable = true,
      caption = Seq("name"), props = Nil),
    Schema("Company", Seq("Organization"), matchable = true,
      caption = Seq("name"), props = Nil),
    Schema("PublicBody", Seq("Organization"), matchable = true,
      caption = Seq("name"), props = Nil),
    Schema("Vehicle", Seq("Thing"), matchable = false,
      caption = Seq("name"), props = Seq(
        Prop("registrationNumber", T.Identifier),
        Prop("type", T.StringT, matchable = false))),
    Schema("Vessel", Seq("Vehicle"), matchable = true,
      caption = Seq("name"), props = Seq(
        Prop("imoNumber", T.Identifier),
        Prop("mmsi", T.Identifier),
        Prop("callSign", T.Identifier),
        Prop("flag", T.Country))),
    Schema("Airplane", Seq("Vehicle"), matchable = true,
      caption = Seq("name"), props = Seq(
        Prop("serialNumber", T.Identifier),
        Prop("icaoCode", T.Identifier))),
    Schema("CryptoWallet", Seq("Thing"), matchable = true,
      caption = Seq("publicKey"), props = Seq(
        Prop("publicKey", T.Identifier),
        Prop("currency", T.StringT, matchable = false))),
    Schema("Security", Seq("Thing"), matchable = true,
      caption = Seq("name"), props = Seq(
        Prop("isin", T.Identifier),
        Prop("figiCode", T.Identifier),
        Prop("ticker", T.Identifier),
        Prop("issuer", T.Entity))),
    Schema("Position", Seq("Thing"), matchable = true,
      caption = Seq("name"), props = Seq(
        Prop("country", T.Country),
        Prop("organization", T.Entity))),
    Schema("Address", Seq("Thing"), matchable = true, caption = Seq("full"),
      props = Seq(
        Prop("full", T.Address),
        Prop("street", T.StringT),
        Prop("street2", T.StringT),
        Prop("city", T.StringT),
        Prop("postalCode", T.StringT),
        Prop("region", T.StringT),
        Prop("state", T.StringT))),
    Schema("Interval", Nil, matchable = false, caption = Nil, props = Seq(
      Prop("date", T.Date),
      Prop("startDate", T.Date),
      Prop("endDate", T.Date),
      Prop("sourceUrl", T.Url, matchable = false),
      Prop("summary", T.Text, matchable = false))),
    Schema("Occupancy", Seq("Interval"), matchable = false,
      caption = Nil, props = Seq(
        Prop("holder", T.Entity),
        Prop("post", T.Entity),
        // curation-period fallbacks for the tenure dates
        Prop("periodStart", T.Date),
        Prop("periodEnd", T.Date))),
    Schema("Family", Seq("Interval"), matchable = false,
      caption = Seq("relationship"), props = Seq(
        Prop("person", T.Entity),
        Prop("relative", T.Entity),
        Prop("relationship", T.StringT, matchable = false))),
    Schema("Associate", Seq("Interval"), matchable = false,
      caption = Seq("relationship"), props = Seq(
        Prop("person", T.Entity),
        Prop("associate", T.Entity),
        Prop("relationship", T.StringT, matchable = false))),
    Schema("Payment", Seq("Interval"), matchable = false,
      caption = Seq("amountEur"), props = Seq(
        Prop("payer", T.Entity),
        Prop("beneficiary", T.Entity),
        Prop("amount", T.Number),
        Prop("amountEur", T.Number),
        Prop("currency", T.StringT, matchable = false),
        Prop("purpose", T.Text, matchable = false),
        Prop("namesMentioned", T.Name, matchable = false)))
  ).map(s => s.name -> s).toMap

  /** Name-type tag for the logic-v2 name matcher (the followthemoney
    * `schema_type_tag` classification): PER for people, ORG for legal
    * entities, OBJ for named things (vessels, planes, wallets), UNK
    * otherwise — UNK schemata don't get name matching at all.
    */
  sealed trait NameTag
  case object PER extends NameTag
  case object ORG extends NameTag
  case object OBJ extends NameTag
  case object UNK extends NameTag

  def nameTypeTag(schema: String): NameTag = {
    val anc = ancestors(schema)
    if (anc.contains("Person")) PER
    else if (anc.contains("LegalEntity")) ORG
    else if (anc.contains("Vehicle") || anc.contains("CryptoWallet")) OBJ
    else UNK
  }

  /** Featured properties per schema — the public FtM `featured:` lists
    * (own declaration, not inherited, like `followthemoney`'s
    * `Schema.featured`). Consumed by the review-comparison ordering
    * (`tui/util.py:40-49`: featured props sort first).
    */
  val featured: Map[String, Seq[String]] = Map(
    "LegalEntity" -> Seq("name", "country", "legalForm"),
    "Person" -> Seq("name", "nationality", "birthDate"),
    "Organization" -> Seq("name", "country"),
    "Company" -> Seq("name", "jurisdiction", "registrationNumber"),
    "PublicBody" -> Seq("name", "country"),
    "Vehicle" -> Seq("name", "registrationNumber"),
    "Vessel" -> Seq("name", "imoNumber", "flag"),
    "Airplane" -> Seq("name", "serialNumber"),
    "CryptoWallet" -> Seq("publicKey", "currency"),
    "Security" -> Seq("name", "isin", "issuer"),
    "Position" -> Seq("name", "country"),
    "Address" -> Seq("full"),
    "Family" -> Seq("person", "relative", "relationship"),
    "Associate" -> Seq("person", "associate", "relationship"),
    "Payment" -> Seq("payer", "beneficiary", "amount"))

  def featuredOf(schema: String): Seq[String] =
    featured.getOrElse(schema, Nil)

  /** Display ordering weight per property type — `tui/util.py:9-17`
    * TYPE_ORDER: names first, then identifiers, dates, countries;
    * free text and URLs last.
    */
  val typeOrder: Map[String, Int] = Map(
    T.Name -> -6, T.Identifier -> -5, T.Date -> -4, T.Country -> -3,
    T.StringT -> -1, T.Text -> 3, T.Url -> 5)

  /** Property types whose values are match candidates (the FtM registry
    * `matchable` flag on types — distinct from per-prop matchability).
    * Drives the review filter `prop.type.matchable and not
    * prop.matchable` (`tui/util.py:56-58`).
    */
  val matchableTypes: Set[String] = Set(
    T.Name, T.Identifier, T.Date, T.Country, T.Address, T.Email,
    T.Phone, T.Url, T.Entity)

  /** Transitive ancestors of a schema, including itself. */
  def ancestors(name: String): Set[String] = {
    def go(n: String): Set[String] =
      schemata.get(n).map(s => s.isA.flatMap(go).toSet + n).getOrElse(Set(n))
    go(name)
  }

  /** All properties visible on a schema (own + inherited). */
  def propsOf(name: String): Map[String, Prop] =
    ancestors(name).toSeq.flatMap(a =>
      schemata.get(a).toSeq.flatMap(_.props)).map(p => p.name -> p).toMap

  def isMatchable(name: String): Boolean =
    schemata.get(name).exists(_.matchable)

  /** Type of (schema, prop), resolving through the hierarchy. */
  def propType(schema: String, prop: String): Option[String] =
    propsOf(schema).get(prop).map(_.tpe)

  /** can_match: both matchable and related by descent (the FtM
    * `matchable_schemata` rule — Person matches LegalEntity but not
    * Company).
    */
  def canMatch(a: String, b: String): Boolean =
    isMatchable(a) && isMatchable(b) &&
      (ancestors(a).contains(b) || ancestors(b).contains(a))

  /** Compatibility pairs, normalized ls <= rs — the broadcast `schemata`
    * table (`blocker/index.py:220-225`).
    */
  val compatPairs: Seq[(String, String)] = {
    val ms = schemata.keys.filter(isMatchable).toSeq.sorted
    for { a <- ms; b <- ms if a <= b && canMatch(a, b) } yield (a, b)
  }

  /** Caption of an assembled entity: first value of the first caption
    * property that has one (`followthemoney` caption semantics, asserted
    * by the reference store tests — `tests/store/test_stores.py`).
    */
  def captionProps(schema: String): Seq[String] =
    schemata.get(schema).map(_.caption).getOrElse(Seq("name"))

  /** Most specific schema of a set (cluster merge): the one all others
    * are ancestors of; falls back to lexicographic min of the deepest.
    */
  def commonSchema(names: Seq[String]): String = {
    val distinct = names.distinct
    distinct.find(n => distinct.forall(o => ancestors(n).contains(o)))
      .getOrElse(distinct.minBy(n => (-ancestors(n).size, n)))
  }
}
