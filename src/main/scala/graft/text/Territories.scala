package graft.text

/** Territory containment for country comparison — the engine's
  * public-data stand-in for the territory knowledge base the reference
  * uses in `territories_intersect`
  * (`matching/compare/countries.py:1-14`). Sanctions data constantly
  * carries disputed/sub-territory codes ("ua-cri", "hk", "xk") and
  * historic codes ("suhh"); a plain set-intersect would call those
  * mismatches.
  *
  * Data assembled from public ISO-3166 / CLDR knowledge: dependent
  * territories → administering state, disputed regions → every
  * claimant, dissolved states → successor states.
  */
object Territories {

  /** Sub-territory / dependency → containing (or claiming) codes. */
  private val Parents: Map[String, Set[String]] = Map(
    // disputed regions list every claimant
    "ua-cri" -> Set("ua", "ru"), "ua-dpr" -> Set("ua", "ru"),
    "ua-lpr" -> Set("ua", "ru"),
    "ge-ab" -> Set("ge", "ru"), "x-so" -> Set("ge", "ru"),
    "ge-so" -> Set("ge", "ru"),
    "md-pmr" -> Set("md"),
    "az-nk" -> Set("az", "am"),
    "xk" -> Set("rs"),
    "cy-trnc" -> Set("cy", "tr"), "cy-north" -> Set("cy", "tr"),
    "so-som" -> Set("so"),
    "eh" -> Set("ma"),
    // Greater-China special administrative regions. Taiwan is
    // deliberately NOT listed: the reference's territory KB (rigour)
    // documents an explicit stance that tw is a de-facto independent
    // territory, so tw/cn pairs keep the country-mismatch penalty —
    // a claim is not administration (hk/mo are genuine SARs).
    "hk" -> Set("cn"), "mo" -> Set("cn"),
    // UK crown dependencies + overseas territories
    "gg" -> Set("gb"), "je" -> Set("gb"), "im" -> Set("gb"),
    "gi" -> Set("gb"), "ky" -> Set("gb"), "bm" -> Set("gb"),
    "vg" -> Set("gb"), "tc" -> Set("gb"), "fk" -> Set("gb"),
    "ms" -> Set("gb"), "ai" -> Set("gb"), "sh" -> Set("gb"),
    "pn" -> Set("gb"), "io" -> Set("gb"),
    // US territories
    "pr" -> Set("us"), "gu" -> Set("us"), "vi" -> Set("us"),
    "as" -> Set("us"), "mp" -> Set("us"), "um" -> Set("us"),
    // Danish / Dutch / French / Nordic / Oceanian dependencies
    "gl" -> Set("dk"), "fo" -> Set("dk"),
    "aw" -> Set("nl"), "cw" -> Set("nl"), "sx" -> Set("nl"),
    "bq" -> Set("nl"),
    "pf" -> Set("fr"), "nc" -> Set("fr"), "gp" -> Set("fr"),
    "mq" -> Set("fr"), "re" -> Set("fr"), "yt" -> Set("fr"),
    "gf" -> Set("fr"), "bl" -> Set("fr"), "mf" -> Set("fr"),
    "pm" -> Set("fr"), "wf" -> Set("fr"), "tf" -> Set("fr"),
    "ax" -> Set("fi"), "sj" -> Set("no"),
    "cx" -> Set("au"), "cc" -> Set("au"), "nf" -> Set("au"),
    "hm" -> Set("au"),
    "tk" -> Set("nz"), "ck" -> Set("nz"), "nu" -> Set("nz"))

  /** Dissolved state → successor states (a record stamped "SUHH" does
    * not mismatch one stamped "ua", but "ua" still mismatches "ru").
    */
  private val Successors: Map[String, Set[String]] = Map(
    "suhh" -> Set("ru", "ua", "by", "kz", "ge", "az", "am", "md",
      "lv", "lt", "ee", "tj", "tm", "uz", "kg"),
    "yucs" -> Set("rs", "hr", "si", "ba", "mk", "me", "xk"),
    "csxx" -> Set("rs", "me", "xk"),
    "cshh" -> Set("cz", "sk"),
    "anhh" -> Set("nl", "aw", "cw", "sx", "bq"),
    "dddr" -> Set("de"),
    "ydye" -> Set("ye"),
    "vdvn" -> Set("vn"),
    // plain "cs" is ambiguous (Czechoslovakia / Serbia-Montenegro);
    // cover both readings
    "cs" -> Set("cz", "sk", "rs", "me"))

  private def related(c: String): Set[String] =
    Parents.getOrElse(c, Set.empty) ++ Successors.getOrElse(c, Set.empty)

  /** Two single codes name intersecting territories. */
  def intersectCodes(a0: String, b0: String): Boolean = {
    val a = a0.toLowerCase
    val b = b0.toLowerCase
    a == b || related(a).contains(b) || related(b).contains(a)
  }

  /** Any pair across the two sets intersects. Empty sides do not
    * intersect (the mismatch feature separately guards empties).
    */
  def intersect(as0: Seq[String], bs0: Seq[String]): Boolean =
    as0.exists(a => bs0.exists(b => intersectCodes(a, b)))

  /** Administering parent for dependent territories — a single code,
    * unlike [[Parents]] which lists every claimant for matching
    * purposes. Disputed regions resolve to the de-jure state; xk is
    * deliberately absent (Kosovo is a country of its own in the
    * reference's territory KB — its enricher skip-lists "xk", which
    * only works if the code survives country resolution).
    */
  private val AdministeringParent: Map[String, String] =
    (Parents - "xk").map { case (k, vs) => k -> vs.head } ++ Map(
      "ua-cri" -> "ua", "ua-dpr" -> "ua", "ua-lpr" -> "ua",
      "ge-ab" -> "ge", "x-so" -> "ge", "ge-so" -> "ge",
      "az-nk" -> "az", "cy-trnc" -> "cy", "cy-north" -> "cy",
      "hk" -> "cn", "mo" -> "cn", "eh" -> "ma")

  private val IsoCountries: Set[String] =
    java.util.Locale.getISOCountries.map(_.toLowerCase).toSet + "xk"

  /** Resolve one code the way the reference's enrichers narrow search
    * countries (`enrich/opencorporates.py:131-146`
    * filter_ftm_countries): sub-territories map to their administering
    * country, historical states and codes unknown to ISO-3166 drop out.
    */
  def ftmCountry(code0: String): Option[String] = {
    val code = code0.toLowerCase.trim
    if (Successors.contains(code) || code == "su") None
    else {
      val resolved = AdministeringParent.getOrElse(code, code)
      if (IsoCountries.contains(resolved)) Some(resolved) else None
    }
  }

  /** Spark-facing variants of the two maps for pure-column pipelines
    * (no UDF: `transform` + `element_at` over these literals stays in
    * codegen).
    */
  def administeringParentMap: Map[String, String] = AdministeringParent
  def historicalCodes: Set[String] = Successors.keySet + "su"
  def isoCountryCodes: Set[String] = IsoCountries
}
