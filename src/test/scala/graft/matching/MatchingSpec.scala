package graft.matching

import org.scalatest.funsuite.AnyFunSuite

/** Feature and algorithm behaviour on constructed entities — the Spark
  * analogue of the reference's per-comparator test modules
  * (`tests/matching/`).
  */
class MatchingSpec extends AnyFunSuite {

  def person(id: String, names: Seq[String], dob: Seq[String] = Nil,
      country: Seq[String] = Nil, gender: Seq[String] = Nil,
      lastName: Seq[String] = Nil): EntityView =
    EntityView(id, "Person", names, Nil, lastName, dob, gender, country,
      Nil, Nil, Nil)

  def company(id: String, names: Seq[String], ids: Seq[String] = Nil,
      country: Seq[String] = Nil): EntityView =
    EntityView(id, "Company", names, Nil, Nil, Nil, Nil, country, ids, Nil,
      Nil)

  val jq = person("a", Seq("Johanna Quandt"), country = Seq("de"))
  val fjq = person("b", Seq("Frau Johanna Quandt"), country = Seq("de"))
  val skl = person("c", Seq("Susanne Klatten"), country = Seq("de"))

  test("person_name_jaro_winkler aligns subset names") {
    assert(Features.personNameJaroWinkler(jq, fjq) === 1.0)
    assert(Features.personNameJaroWinkler(jq, skl) === 0.0)
  }

  test("person_name_phonetic_match is full when all query parts match") {
    assert(Features.personNamePhoneticMatch(jq, fjq) === 1.0)
    assert(Features.personNamePhoneticMatch(fjq, jq) < 1.0) // frau unmatched
  }

  test("name_literal_match needs identical cleaned names") {
    assert(Features.nameLiteralMatch(jq,
      person("x", Seq("johanna  quandt"))) === 1.0)
    assert(Features.nameLiteralMatch(jq, fjq) === 0.0)
  }

  test("dob comparators: disjoint, flipped, year") {
    val p1 = person("p1", Seq("X"), dob = Seq("1962-05-10"))
    val p2 = person("p2", Seq("X"), dob = Seq("1962-10-05"))
    val p3 = person("p3", Seq("X"), dob = Seq("1962-05-10"))
    val p4 = person("p4", Seq("X"), dob = Seq("1980-01-01"))
    assert(Features.dobDayDisjoint(p1, p3) === 0.0)
    assert(Features.dobDayDisjoint(p1, p2) === 0.5) // day/month flip
    assert(Features.dobDayDisjoint(p1, p4) === 1.0)
    assert(Features.dobYearDisjoint(p1, p2) === 0.0)
    assert(Features.dobYearDisjoint(p1, p4) === 1.0)
    assert(Features.dobMatch(p1, p3) === 1.0)
    assert(Features.dobMatch(p1, p2) === 0.5)
    assert(Features.dobYearMatch(p1, p4) === -1.0)
  }

  test("identifier features: strong formats and orgid tolerance") {
    val c1 = company("c1", Seq("Acme"), ids = Seq("529900T8BM49AURSDO55"))
    val c2 = company("c2", Seq("Acme Corp"), ids = Seq("5299 00T8 BM49 AURS DO55"))
    val c3 = company("c3", Seq("Other"), ids = Seq("US0378331005"))
    assert(Features.leiCodeMatch(c1, c2) === 1.0)
    assert(Features.strongIdentifierMatch(c1, c2) === 1.0)
    assert(Features.identifierMatch(c1, c2) === 1.0)
    assert(Features.orgidDisjoint(c1, c2) === 0.0)
    assert(Features.orgidDisjoint(c1, c3) === 1.0)
  }

  test("gender/country mismatches need both sides non-empty") {
    val m = person("m", Seq("X"), gender = Seq("male"), country = Seq("de"))
    val f = person("f", Seq("X"), gender = Seq("female"), country = Seq("fr"))
    val u = person("u", Seq("X"))
    assert(Features.genderMismatch(m, f) === 1.0)
    assert(Features.genderMismatch(m, u) === 0.0)
    assert(Features.countryMismatch(m, f) === 1.0)
    assert(Features.countryMismatch(m, u) === 0.0)
  }

  test("country mismatch respects territory containment") {
    def withC(id: String, c: String) =
      person(id, Seq("X"), country = Seq(c))
    // contained / claimed territories do not mismatch their parents
    assert(Features.countryMismatch(withC("a", "ua-cri"), withC("b", "ua")) === 0.0)
    assert(Features.countryMismatch(withC("a", "ua-cri"), withC("b", "ru")) === 0.0)
    assert(Features.countryMismatch(withC("a", "hk"), withC("b", "cn")) === 0.0)
    assert(Features.countryMismatch(withC("a", "xk"), withC("b", "rs")) === 0.0)
    assert(Features.countryMismatch(withC("a", "SUHH"), withC("b", "ua")) === 0.0)
    assert(Features.countryMismatch(withC("a", "gl"), withC("b", "dk")) === 0.0)
    // sibling territories and plain different countries still mismatch
    assert(Features.countryMismatch(withC("a", "ua"), withC("b", "ru")) === 1.0)
    assert(Features.countryMismatch(withC("a", "hk"), withC("b", "ua")) === 1.0)
  }

  test("logic-v1 composition: qualifiers only apply when a main fired") {
    val p1 = person("p1", Seq("Johanna Quandt"), dob = Seq("1926-06-21"))
    val p2 = person("p2", Seq("Johanna Quandt"), dob = Seq("1930-01-01"))
    // literal match 1.0 - dob qualifiers (year disjoint -0.15, day -0.2)
    val s = Algorithms.LogicV1.score(p1, p2)
    assert(math.abs(s - 0.65) < 1e-9)
    // no main evidence → qualifiers never push below zero
    val q1 = person("q1", Seq("Abc"), dob = Seq("1930-01-01"))
    val q2 = person("q2", Seq("Xyz"), dob = Seq("1926-06-21"))
    assert(Algorithms.LogicV1.score(q1, q2) === 0.0)
  }

  test("logic-v2 name match: literal, alignment, numbers penalty") {
    assert(NameMatchV2.nameMatch(jq,
      person("x", Seq("Johanna Quandt"))) === 1.0)
    // honorific prefixes are stripped by the fingerprint normalization
    assert(NameMatchV2.nameMatch(jq, fjq) === 1.0)
    val aligned = NameMatchV2.nameMatch(jq,
      person("x", Seq("Johanna Maria Quandt")))
    assert(aligned > 0.5 && aligned < 1.0) // extra middle part weighs in
    val o1 = company("o1", Seq("Warehouse 12"))
    val o2 = company("o2", Seq("Warehouse 13"))
    val o3 = company("o3", Seq("Warehouse 12 GmbH"))
    assert(NameMatchV2.nameMatch(o1, o2) <
      NameMatchV2.nameMatch(o1, o3))
  }

  test("ofac name score reproduces the short-token and order quirks") {
    val kim1 = person("k1", Seq("KIM JONG UN"))
    val kim2 = person("k2", Seq("KIM JONG"))
    // "UN" dropped from the query → full score on remaining tokens
    assert(Features.ofacNameScore(kim1, kim2) === 1.0)
    val gb = person("g1", Seq("GEORGE BUSH"))
    val bg = person("g2", Seq("BUSH GEORGE"))
    // per-token technique is order-insensitive → still 1.0
    assert(Features.ofacNameScore(gb, bg) === 1.0)
  }

  test("algorithm registry covers the reference's seven") {
    assert(Algorithms.registry.keySet === Set("logic-v1", "logic-v2",
      "name-based", "name-qualified", "ofac", "regression-v1",
      "er-unstable"))
    assert(Algorithms.default.name === "regression-v1")
    assert(Algorithms.dedupe.name === "er-unstable")
  }

  test("er-unstable separates dupes from family members") {
    val dupe = Algorithms.ErUnstable.score(jq, fjq)
    val fam = Algorithms.ErUnstable.score(skl, fjq)
    assert(dupe > fam)
  }
}
