package graft.matching

import org.scalatest.funsuite.AnyFunSuite

/** The erun comparator family (`matching/erun/misc.py`,
  * `erun/countries.py`): contact channels, erun address semantics,
  * schema-gated country mismatches, security ISIN disjointness.
  */
class ErunFeaturesSpec extends AnyFunSuite {

  private def view(schema: String,
      countries: Seq[String] = Nil, addresses: Seq[String] = Nil,
      phones: Seq[String] = Nil, emails: Seq[String] = Nil,
      urls: Seq[String] = Nil, isins: Seq[String] = Nil,
      birthPlaces: Seq[String] = Nil): EntityView =
    EntityView("x", schema, Seq("N"), Nil, Nil, Nil, Nil, countries,
      Nil, addresses, Nil, phones = phones, emails = emails,
      urls = urls, isins = isins, birthPlaces = birthPlaces)

  test("contact_match: phone beats email beats url, any hit is 1.0") {
    val a = view("Person", phones = Seq("+491"), emails = Seq("A@B.C"))
    val b = view("Person", phones = Seq("+492"), emails = Seq("a@b.c"))
    assert(Features.contactMatch(a, b) === 1.0) // email, case-folded
    val c = view("Person", urls = Seq("http://x"))
    assert(Features.contactMatch(a, c) === 0.0)
    assert(Features.contactMatch(c, view("Person",
      urls = Seq("HTTP://X"))) === 1.0)
  }

  test("security_isin_mismatch gates on Security schema") {
    val s1 = view("Security", isins = Seq("US0378331005"))
    val s2 = view("Security", isins = Seq("DE0005557508"))
    assert(Features.securityIsinMismatch(s1, s2) === 1.0)
    assert(Features.securityIsinMismatch(s1,
      view("Security", isins = Seq("US0378331005"))) === 0.0)
    // Person pair: gate closed even with disjoint isins
    assert(Features.securityIsinMismatch(
      view("Person", isins = Seq("A")),
      view("Person", isins = Seq("B"))) === 0.0)
  }

  test("country mismatch family: schema gates and territory logic") {
    val deP = view("Person", countries = Seq("de"))
    val frP = view("Person", countries = Seq("fr"))
    val deC = view("Company", countries = Seq("de"))
    val frC = view("Company", countries = Seq("fr"))
    assert(Features.perCountryMismatch(deP, frP) === 1.0)
    assert(Features.perCountryMismatch(deP, deP) === 0.0)
    assert(Features.perCountryMismatch(deC, frC) === 0.0) // not persons
    assert(Features.orgCountryMismatch(deC, frC) === 1.0)
    assert(Features.orgCountryMismatch(deP, frP) === 0.0) // person pair
    // territory containment: gi is administered by gb
    assert(Features.orgCountryMismatch(
      view("Company", countries = Seq("gi")),
      view("Company", countries = Seq("gb"))) === 0.0)
    val p1 = view("Position", countries = Seq("de"))
    val p2 = view("Position", countries = Seq("fr"))
    assert(Features.positionCountryMatch(p1, p2) === -1.0)
    assert(Features.positionCountryMatch(p1, p1) === 1.0)
    assert(Features.positionCountryMatch(deP, frP) === 0.0)
  }

  test("erun address family: token overlap and number sets") {
    val a = view("Person",
      addresses = Seq("12 Market Street Springfield"))
    val b = view("Person",
      addresses = Seq("12 Market St Springfield"))
    // keyword shortening folds street/st together
    assert(Features.addressOverlapMatch(a, b) === 1.0)
    assert(Features.addressNumberOverlap(a, b) === 1.0)
    assert(Features.addressNumberDisagreement(a, b) === 0.0)
    val c = view("Person", addresses = Seq("14 Market St", "12 Old Rd"))
    // numbers {12} vs {14, 12}: overlap 1/1, disagreement 1/2
    assert(Features.addressNumberOverlap(a, c) === 1.0)
    assert(Features.addressNumberDisagreement(a, c) === 0.5)
    assert(Features.addressOverlapMatch(view("Person"), b) === 0.0)
  }

  test("birth_place: person gate and overlap-over-smaller") {
    val a = view("Person", birthPlaces = Seq("Springfield Illinois"))
    val b = view("Person", birthPlaces = Seq("Springfield"))
    assert(Features.birthPlaceErun(a, b) === 1.0)
    assert(Features.birthPlaceErun(a,
      view("Person", birthPlaces = Seq("Shelbyville"))) === 0.0)
    assert(Features.birthPlaceErun(
      view("Company", birthPlaces = Seq("Springfield")), b) === 0.0)
  }

  test("er-unstable roster matches the reference feature list") {
    val names = Algorithms.ErUnstable.features.map(_.name)
    val expected = Seq("name_token_overlap", "name_numbers",
      "legal_name_levenshtein", "person_name_levenshtein",
      "org_name_levenshtein", "strong_identifier_match",
      "weak_identifier_match", "dob_match", "dob_year_match",
      "contact_match", "family_name_match", "birth_place",
      "gender_mismatch", "per_country_mismatch",
      "position_country_match", "org_country_mismatch",
      "security_isin_mismatch", "obj_name_levenshtein",
      "address_match", "address_number_overlap",
      "address_number_disagreement")
    assert(names === expected)
  }
}
