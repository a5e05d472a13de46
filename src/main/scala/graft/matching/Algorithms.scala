package graft.matching

/** Algorithm registry: named scoring algorithms composing the feature
  * library, with the reference's composition semantics and weights
  * (`matching/__init__.py:11-22`, `matching/types.py:242-308`).
  */
object Algorithms {

  final case class Feat(name: String, fn: Features.Feature, weight: Double,
      qualifier: Boolean = false)

  // Algo instances are captured by the scoring UDF closure → must ship
  // to executors
  sealed trait Algo extends Serializable {
    def name: String
    def features: Seq[Feat]
    /** Combine feature scores; result is clamped to [0,1] by [[score]]. */
    def compute(scores: Map[String, Double]): Double
    final def score(q: EntityView, r: EntityView): Double = {
      val scores = features.map(f => f.name -> f.fn(q, r)).toMap
      math.min(1.0, math.max(0.0, compute(scores)))
    }
    final def weightOf(n: String): Double =
      features.find(_.name == n).map(_.weight).getOrElse(0.0)
  }

  /** max(weighted mains) + Σ weighted qualifiers, qualifiers skipped
    * when no main fired (`logic_v1/model.py:63-81`).
    */
  trait MaxPlusQualifiers extends Algo {
    def compute(scores: Map[String, Double]): Double = {
      val mains = features.filterNot(_.qualifier)
        .map(f => scores.getOrElse(f.name, 0.0) * f.weight)
      val best = if (mains.isEmpty) 0.0 else mains.max
      if (best == 0.0) 0.0
      else best + features.filter(_.qualifier)
        .map(f => scores.getOrElse(f.name, 0.0) * f.weight).sum
    }
  }

  /** Plain weighted sum (`name_based/model.py:34-42,57-71,84-91`). */
  trait WeightedSum extends Algo {
    def compute(scores: Map[String, Double]): Double =
      features.map(f => scores.getOrElse(f.name, 0.0) * f.weight).sum
  }

  /** Logistic scorer over externally supplied (already scaler-folded)
    * coefficients — the runtime form of a model imported from JSON
    * ([[ModelIO]], SURVEY §7.4 risk 6).
    */
  final case class ExternalLogistic(name: String, features: Seq[Feat],
      intercept: Double) extends Algo {
    def compute(scores: Map[String, Double]): Double = {
      val z = intercept + features
        .map(f => scores.getOrElse(f.name, 0.0) * f.weight).sum
      1.0 / (1.0 + math.exp(-z))
    }
  }

  import Features._

  /** logic-v1 (`matching/logic_v1/model.py:36-61`) with the reference's
    * feature set and weights. The two FNUL-weight phonetic features are
    * present-but-disabled, exactly like the reference.
    */
  object LogicV1 extends MaxPlusQualifiers {
    val name = "logic-v1"
    val features: Seq[Feat] = Seq(
      Feat("name_literal_match", nameLiteralMatch, 1.0),
      Feat("person_name_jaro_winkler", personNameJaroWinkler, 0.8),
      Feat("person_name_phonetic_match", personNamePhoneticMatch, 0.9),
      Feat("name_fingerprint_levenshtein", nameFingerprintLevenshtein, 0.9),
      Feat("name_metaphone_match", nameMetaphoneMatch, 0.0),
      Feat("name_soundex_match", nameSoundexMatch, 0.0),
      Feat("address_entity_match", addressEntityMatch, 0.98),
      Feat("crypto_wallet_address", cryptoWalletAddress, 0.98),
      Feat("isin_security_match", isinSecurityMatch, 0.98),
      Feat("lei_code_match", leiCodeMatch, 0.95),
      Feat("ogrn_code_match", ogrnCodeMatch, 0.95),
      Feat("vessel_imo_mmsi_match", vesselImoMmsiMatch, 0.95),
      Feat("inn_code_match", innCodeMatch, 0.95),
      Feat("bic_code_match", bicCodeMatch, 0.95),
      Feat("identifier_match", identifierMatch, 0.85),
      Feat("weak_alias_match", weakAliasMatch, 0.8),
      Feat("country_mismatch", countryMismatch, -0.2, qualifier = true),
      Feat("last_name_mismatch", lastNameMismatch, -0.2, qualifier = true),
      Feat("dob_year_disjoint", dobYearDisjoint, -0.15, qualifier = true),
      Feat("dob_day_disjoint", dobDayDisjoint, -0.2, qualifier = true),
      Feat("gender_mismatch", genderMismatch, -0.2, qualifier = true),
      Feat("orgid_disjoint", orgidDisjoint, -0.2, qualifier = true),
      Feat("numbers_mismatch", numbersMismatch, -0.1, qualifier = true))
  }

  /** logic-v2 (`matching/logic_v2/model.py:24-52`): the v2 name matcher
    * plus identifier features, with the reference's weights. Same
    * max-plus-qualifiers composition (weights applied before the max).
    */
  object LogicV2 extends MaxPlusQualifiers {
    val name = "logic-v2"
    val features: Seq[Feat] = Seq(
      Feat("name_match", NameMatchV2.nameMatch, 1.0),
      Feat("address_entity_match", addressEntityMatch, 0.98),
      Feat("crypto_wallet_address", cryptoWalletAddress, 0.98),
      Feat("isin_security_match", isinSecurityMatch, 0.98),
      Feat("lei_code_match", leiCodeMatch, 0.95),
      Feat("ogrn_code_match", ogrnCodeMatch, 0.95),
      Feat("vessel_imo_mmsi_match", vesselImoMmsiMatch, 0.95),
      Feat("inn_code_match", innCodeMatch, 0.95),
      Feat("bic_code_match", bicCodeMatch, 0.95),
      Feat("uei_code_match", ueiCodeMatch, 0.95),
      Feat("npi_code_match", npiCodeMatch, 0.95),
      Feat("identifier_match", identifierMatch, 0.85),
      Feat("weak_alias_match", weakAliasMatch, 0.8),
      Feat("address_prop_match", addressPropMatch, 0.2, qualifier = true),
      Feat("country_mismatch", countryMismatch, -0.2, qualifier = true),
      Feat("dob_year_disjoint", dobYearDisjoint, -0.15, qualifier = true),
      Feat("dob_day_disjoint", dobDayDisjoint, -0.25, qualifier = true),
      Feat("gender_mismatch", genderMismatch, -0.2, qualifier = true))
  }

  /** name-based (`name_based/model.py:44-66`). */
  object NameBased extends WeightedSum {
    val name = "name-based"
    val features: Seq[Feat] = Seq(
      Feat("jaro_name_parts", jaroNameParts, 0.5),
      Feat("soundex_name_parts", soundexNameParts, 0.5))
  }

  /** name-qualified (`name_based/model.py:69-91`). */
  object NameQualified extends WeightedSum {
    val name = "name-qualified"
    val features: Seq[Feat] = Seq(
      Feat("jaro_name_parts", jaroNameParts, 0.5),
      Feat("soundex_name_parts", soundexNameParts, 0.5),
      Feat("country_mismatch", countryMismatch, -0.1, qualifier = true),
      Feat("dob_year_disjoint", dobYearDisjoint, -0.1, qualifier = true),
      Feat("dob_day_disjoint", dobDayDisjoint, -0.15, qualifier = true),
      Feat("gender_mismatch", genderMismatch, -0.1, qualifier = true),
      Feat("orgid_disjoint", orgidDisjoint, -0.1, qualifier = true))
  }

  /** ofac (`name_based/model.py:14-41`): OFAC name-score emulation with
    * mismatch qualifiers.
    */
  object Ofac extends WeightedSum {
    val name = "ofac"
    val features: Seq[Feat] = Seq(
      Feat("ofac_name_score", ofacNameScore, 1.0),
      Feat("country_mismatch", countryMismatch, -0.1, qualifier = true),
      Feat("dob_year_disjoint", dobYearDisjoint, -0.1, qualifier = true),
      Feat("dob_day_disjoint", dobDayDisjoint, -0.15, qualifier = true),
      Feat("gender_mismatch", genderMismatch, -0.1, qualifier = true),
      Feat("orgid_disjoint", orgidDisjoint, -0.1, qualifier = true))
  }

  /** regression-v1 (`matching/regression_v1/model.py:37-58`): logistic
    * inference over the reference's exact feature list. The reference
    * ships trained pickle coefficients (unloadable in the JVM); the
    * constant vector here preserves the trained model's sign structure
    * and can be refit with [[Training.trainLogistic]].
    */
  object RegressionV1 extends Algo {
    val name = "regression-v1"
    val features: Seq[Feat] = Seq(
      Feat("name_match", nameMatchR, 2.6),
      Feat("name_levenshtein", nameLevenshteinR, 1.8),
      Feat("name_token_overlap", nameTokenOverlapR, 1.2),
      Feat("name_numbers", nameNumbersR, -1.0),
      Feat("first_name_match", firstNameMatch, 0.6),
      Feat("family_name_match", familyNameMatchR, 0.8),
      Feat("phone_match", phoneMatch, 1.2),
      Feat("email_match", emailMatch, 1.2),
      Feat("address_match", addressMatch, 0.9),
      Feat("address_numbers", addressNumbers, 0.3),
      Feat("identifier_match", identifierMatchNonOrg, 1.8),
      Feat("org_identifier_match", orgIdentifierMatch, 1.8),
      Feat("birth_place", birthPlace, 0.5),
      Feat("dob_matches", dobMatches, 1.4),
      Feat("dob_year_matches", dobYearMatches, 0.7),
      Feat("dob_year_disjoint", dobYearDisjoint, -1.0),
      Feat("gender_mismatch", genderMismatch, -0.9),
      Feat("country_mismatch", countryMismatch, -0.9),
      // retains predictive power on entity refs beyond the reference set
      Feat("address_entity_match", addressEntityMatch, 1.1),
      Feat("person_name_jaro_winkler", personNameJaroWinkler, 1.4))
    val intercept: Double = -2.4
    def compute(scores: Map[String, Double]): Double = {
      val z = intercept + features
        .map(f => scores.getOrElse(f.name, 0.0) * f.weight).sum
      1.0 / (1.0 + math.exp(-z))
    }
  }

  /** er-unstable (`matching/erun/model.py:45-126`): the dedupe
    * regression, scoring with the reference's SHIPPED trained model —
    * the `er-unstable.pkl` scaler + LogisticRegressionCV coefficients
    * transcribed to the [[ModelIO]] JSON interchange and folded at
    * class-load (`w' = w/σ`, `b' = b − Σ w·μ/σ`), over the exact
    * 21-feature roster in its published order (`erun/model.py:50-72`).
    */
  object ErUnstable extends Algo {
    val name = "er-unstable"
    private val fns: Map[String, Features.Feature] = Map(
      "name_token_overlap" -> nameTokenOverlap,
      "name_numbers" -> nameNumbers,
      "legal_name_levenshtein" -> legalNameLevenshtein,
      "person_name_levenshtein" -> personNameLevenshtein,
      "org_name_levenshtein" -> orgNameLevenshtein,
      "strong_identifier_match" -> strongIdentifierMatch,
      "weak_identifier_match" -> weakIdentifierMatch,
      "dob_match" -> dobMatch,
      "dob_year_match" -> dobYearMatch,
      "contact_match" -> contactMatch,
      "family_name_match" -> familyNameMatch,
      "birth_place" -> birthPlaceErun,
      "gender_mismatch" -> genderMismatch,
      "per_country_mismatch" -> perCountryMismatch,
      "position_country_match" -> positionCountryMatch,
      "org_country_mismatch" -> orgCountryMismatch,
      "security_isin_mismatch" -> securityIsinMismatch,
      "obj_name_levenshtein" -> objNameLevenshtein,
      "address_match" -> addressOverlapMatch,
      "address_number_overlap" -> addressNumberOverlap,
      "address_number_disagreement" -> addressNumberDisagreement)
    private val model: ModelIO.ScaledModel = {
      val in = getClass.getResourceAsStream(
        "/graft/matching/er-unstable-reference.json")
      require(in != null, "er-unstable-reference.json resource missing")
      val json = try scala.io.Source.fromInputStream(in).mkString
        finally in.close()
      ModelIO.fromJson(json)
    }
    private val flat = model.flat
    val features: Seq[Feat] = model.features.zip(flat.weights).map {
      case (n, w) => Feat(n, fns(n), w)
    }
    val intercept: Double = flat.intercept
    def compute(scores: Map[String, Double]): Double = {
      val z = intercept + features
        .map(f => scores.getOrElse(f.name, 0.0) * f.weight).sum
      1.0 / (1.0 + math.exp(-z))
    }
  }

  val registry: Map[String, Algo] = Seq(
    LogicV1, LogicV2, NameBased, NameQualified, Ofac, RegressionV1,
    ErUnstable)
    .map(a => a.name -> a).toMap

  /** `DefaultAlgorithm = RegressionV1` (`matching/__init__.py:21`). */
  val default: Algo = RegressionV1

  /** `DedupeAlgorithm = EntityResolveRegression`
    * (`matching/__init__.py:22`).
    */
  val dedupe: Algo = ErUnstable
}
