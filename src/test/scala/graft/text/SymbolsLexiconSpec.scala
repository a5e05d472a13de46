package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** The external variant-lexicon plug (rigour's nickname/variant tables
  * are not publicly redistributable; the wiring is): file parsing,
  * union-merge semantics, and the no-lexicon identity guarantee that
  * keeps the gated `sy:` token streams byte-stable.
  */
class SymbolsLexiconSpec extends AnyFunSuite {

  test("parse: tags, comments, case folding") {
    val (name, nick) = Symbols.parseVariantLexicon(Iterator(
      "# full-line comment",
      "name hussein HUSAYN hussain  # trailing comment",
      "",
      "nick william bill billy",
      "nick c#dev csharp dev  # '#' inside a token is data"))
    assert(name == Seq(Seq("hussein", "husayn", "hussain")))
    assert(nick == Seq(Seq("william", "bill", "billy"),
      Seq("c#dev", "csharp", "dev")))
  }

  test("parse: bad category and short group throw with line numbers") {
    val e1 = intercept[IllegalArgumentException] {
      Symbols.parseVariantLexicon(Iterator("name a b", "alias x y"))
    }
    assert(e1.getMessage.contains("line 2"))
    val e2 = intercept[IllegalArgumentException] {
      Symbols.parseVariantLexicon(Iterator("name solo"))
    }
    assert(e2.getMessage.contains("line 1"))
  }

  test("unionGroups: overlapping groups merge transitively") {
    val merged = Symbols.unionGroups(Seq(
      Seq("william", "bill"), Seq("william", "guillermo"),
      Seq("ivan", "iwan")))
    assert(merged.map(_.toSet).toSet == Set(
      Set("william", "bill", "guillermo"), Set("ivan", "iwan")))
  }

  test("unionGroups: deterministic ordering across invocations") {
    val gs = Seq(Seq("b", "a"), Seq("z", "y"), Seq("a", "c"))
    assert(Symbols.unionGroups(gs) == Symbols.unionGroups(gs))
    assert(Symbols.unionGroups(gs) ==
      Symbols.unionGroups(gs.reverse).sortBy(_.head))
  }

  test("mergedMap: no external lexicon is the identity (gated sy: ids)") {
    // the live maps were built through mergedMap with no lexicon
    // configured — they must equal the raw builtin groupMap exactly
    val raw = Symbols.BuiltinNameGroups.zipWithIndex
      .flatMap { case (g, i) => g.map(_ -> i) }.toMap
    assert(Symbols.NameVariants == raw)
    val rawNick = Symbols.BuiltinNickGroups.zipWithIndex
      .flatMap { case (g, i) => g.map(_ -> i) }.toMap
    assert(Symbols.Nicknames == rawNick)
  }

  test("mergedMap: external group extends a builtin group, keeps pairs") {
    val m = Symbols.mergedMap(Symbols.BuiltinNickGroups,
      Seq(Seq("william", "guillermo"), Seq("zork", "zorkette")))
    // builtin pair survives the union-merge
    assert(m("william") == m("bill"))
    // external token joins the same group
    assert(m("guillermo") == m("william"))
    // brand-new group gets its own id
    assert(m("zork") == m("zorkette") && m("zork") != m("william"))
    // an untouched builtin group is unaffected
    assert(m("benjamin") == m("benny") && m("benjamin") != m("william"))
  }

  test("lexiconFingerprint is empty when no lexicon is configured") {
    assert(!sys.props.contains("graft.name.variants"))
    assert(Symbols.lexiconFingerprint == "")
  }
}
