package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** The SHIPPED public variant lexicon (`data/name_variants_public.txt`
  * — hand-curated public-domain hypocorisms + cross-language cognate
  * families, the optional GRAFT_NAME_VARIANTS payload): it must parse,
  * respect the curation rules its header states, and union-merge into
  * the builtin seed without losing a builtin pair or fusing distinct
  * name families through a bridge token.
  */
class PublicLexiconSpec extends AnyFunSuite {

  val path = "data/name_variants_public.txt"

  lazy val parsed: (Seq[Seq[String]], Seq[Seq[String]]) = {
    val src = scala.io.Source.fromFile(path)(scala.io.Codec.UTF8)
    try Symbols.parseVariantLexicon(src.getLines()) finally src.close()
  }

  test("parses with substantial coverage in both categories") {
    val (name, nick) = parsed
    assert(name.size >= 60, s"name groups: ${name.size}")
    assert(nick.size >= 70, s"nick groups: ${nick.size}")
  }

  test("tokens are lowercase ascii in the TextNorm output space") {
    for (g <- parsed._1 ++ parsed._2; t <- g) {
      assert(t.forall(c => c >= 'a' && c <= 'z'), s"bad token '$t'")
      assert(t.length >= 2, s"single-letter token '$t'")
    }
  }

  test("no token appears in two groups of the same category") {
    for (groups <- Seq(parsed._1, parsed._2)) {
      val all = groups.flatten
      val dups = all.groupBy(identity).filter(_._2.size > 1).keys
      assert(dups.isEmpty, s"duplicated tokens: ${dups.toSeq.sorted}")
    }
  }

  test("merging preserves every builtin pair and extends families") {
    val name = Symbols.mergedMap(Symbols.BuiltinNameGroups, parsed._1)
    val nick = Symbols.mergedMap(Symbols.BuiltinNickGroups, parsed._2)
    // every builtin same-group pair survives the union-merge
    for ((groups, merged) <- Seq(
        Symbols.BuiltinNameGroups -> name,
        Symbols.BuiltinNickGroups -> nick);
      g <- groups; a <- g.headOption; b <- g.tail)
      assert(merged(a) === merged(b), s"builtin pair lost: $a ~ $b")
    // anchored extensions land in the builtin family
    assert(name("pedro") === name("pyotr"), "peter anchor")
    assert(name("miguel") === name("mikhail"), "michael anchor")
    assert(name("nicolas") === name("nikolai"), "nicholas anchor")
    assert(name("juan") === name("ivan"), "ivan anchor")
    assert(nick("andy") === nick("andrew"))
    // new families exist and are distinct
    assert(name("lukashenko") === name("lukashenka"))
    assert(name("lukashenko") !== name("yanukovych"))
    // r13 breadth pass: anchored extensions into builtin families...
    assert(name("eugene") === name("yevhen"), "eugene anchor")
    assert(name("theodore") === name("fedir"), "fyodor anchor")
    assert(name("mohammed") === name("magomed"), "mohammed anchor")
    assert(name("gregory") === name("grzegorz"), "gregory anchor")
    // ...and new independent families that must not fuse
    assert(name("semyon") === name("szymon"))
    assert(name("suleiman") === name("sulayman"))
    assert(name("osman") === name("uthman"))
    assert(name("osman") !== name("suleiman"))
    assert(name("maxim") === name("maksym"))
    assert(name("daniel") === name("danylo"))
    assert(name("elena") === name("olena"))
    assert(name("elena") !== name("yulia"))
  }

  test("ambiguous bridge tokens do not fuse distinct families") {
    val nick = Symbols.mergedMap(Symbols.BuiltinNickGroups, parsed._2)
    // harry stays with henry (builtin); harold is its own family
    assert(nick("harry") === nick("henry"))
    assert(nick("harold") !== nick("henry"))
    // pat stays with patrick; patricia is its own family
    assert(nick("pat") === nick("patrick"))
    assert(nick("patricia") !== nick("patrick"))
    // terry (terence) must not pull in gerald's jerry or teresa
    assert(nick("terry") !== nick("jerry"))
    assert(nick("terry") !== nick("tess"))
    // nathan/nate stay clear of jonathan (absent) and nancy
    assert(nick("nate") === nick("nathaniel"))
    assert(nick("nate") !== nick("nan"))
  }
}
