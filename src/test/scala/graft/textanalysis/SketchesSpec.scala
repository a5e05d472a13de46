package graft.textanalysis

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** HLL sketch against the real sf0.001 corpus: the oracle gate checks
  * engine parity of every register and the estimate; this checks the
  * estimate is actually a good one, and that the merged row behaves
  * like a union.
  */
class SketchesSpec extends AnyFunSuite {
  import SparkSpec.spark

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val rows = Sketches.hllQ(spark, sfDir).collect()
    .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("every source estimate is within 5% of the exact cardinality") {
    assert(rows.nonEmpty)
    rows.foreach { case (src, _, est, exact) =>
      val err = math.abs(est - exact).toDouble / exact
      assert(err <= 0.05, s"$src: est=$est exact=$exact err=$err")
    }
  }

  test("the ALL row merges the per-source registers") {
    val all = rows.filter(_._1 == "ALL")
    assert(all.length === 1)
    val (_, regsUsed, _, exactAll) = all.head
    val perSource = rows.filter(_._1 != "ALL")
    // merged register count is bounded by the union of per-source sets
    assert(regsUsed <= perSource.map(_._2).sum)
    assert(regsUsed >= perSource.map(_._2).max)
    // docs belong to exactly one source, so the union is the sum here
    assert(exactAll === perSource.map(_._4).sum)
  }

  test("register state is tiny relative to the input") {
    // the whole point at 100 TB: per-source state ≤ m rows
    rows.foreach { case (_, regsUsed, _, _) =>
      assert(regsUsed <= Sketches.M)
    }
  }

  test("count-min never under-counts and is near-exact at this width") {
    val cms = Sketches.cmsQ(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(cms.length === Sketches.CmsTopK)
    cms.foreach { case (term, exact, est, over) =>
      assert(est >= exact, s"$term under-counted: est=$est exact=$exact")
      assert(over === est - exact)
      // 1024 counters vs a ~40-word vocabulary: collisions are rare
      // enough that top-term overcount stays under 10%
      assert(over.toDouble / exact <= 0.10, s"$term overcount=$over")
    }
  }

  test("count-min estimates are reproducible across runs") {
    val a = Sketches.cmsQ(spark, sfDir).collect().map(_.toString).sorted
    val b = Sketches.cmsQ(spark, sfDir).collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("bloom probe has no false negatives; positives are bounded") {
    val rows = Sketches.bloomQ(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, grams, bloom, exact) =>
      assert(bloom >= exact, s"doc $id: false negative ($bloom < $exact)")
      assert(bloom <= grams && exact <= grams)
    }
    // every exact hit is found (aggregate form of the per-doc check)
    assert(rows.map(_._3).sum >= rows.map(_._4).sum)
  }

  test("histogram quantiles stay within one bin of the exact value") {
    val rows = Sketches.histqQ(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // every (lang, q) in the grid appears exactly once
    assert(rows.map(t => (t._1, t._2)).distinct.length === rows.length)
    // binning error is bounded by one bin width by construction
    val wdt = graft.Tables.documents(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.col("lang"))
      .agg(org.apache.spark.sql.functions.expr(
        s"(max(n_chars) - min(n_chars)) div ${Sketches.HistBins} + 1")
        .as("wdt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (lang, q, est, exact, err) =>
      assert(err === est - exact)
      assert(math.abs(err) <= wdt(lang),
        s"$lang q=$q est=$est exact=$exact wdt=${wdt(lang)}")
    }
  }
}
