package graft.cli

import graft.matching.EntityBench

/** `BenchChecksMain [checks.yml] [threshold,...]` — the entity-bench
  * accuracy scoreboard (reference `contrib/entity_bench/benchmark.py`):
  * scores every registered algorithm over the checks corpus at each
  * threshold and prints per-schema confusion matrices. Driver-side,
  * no Spark session — the corpus is a few hundred pairs.
  */
/** `LexiconBenchMain [frozen.csv] [checks.yml]` — the variant-lexicon
  * A/B scoreboard: frozen name-bench agreement/MAE (logic-v2 vs the
  * reference's frozen run at threshold 0.7) plus the entity_bench
  * confusion totals, in ONE driver-side process so the
  * GRAFT_NAME_VARIANTS env (read once at Symbols class init) can be
  * flipped between runs:
  *
  * {{{
  *   java ... graft.cli.LexiconBenchMain                      # baseline
  *   GRAFT_NAME_VARIANTS=data/name_variants_public.txt \
  *     java ... graft.cli.LexiconBenchMain                    # plugged
  * }}}
  */
object LexiconBenchMain {
  def main(args: Array[String]): Unit = {
    import graft.matching.{Algorithms, EntityBench, EntityView, NameBench}
    val frozen = args.headOption.getOrElse(
      "/root/reference/contrib/name_bench/run_data/logicv2-frozen.csv")
    val checksPath = args.lift(1).getOrElse(EntityBench.DefaultChecksPath)
    val lex = sys.env.get("GRAFT_NAME_VARIANTS")
      .orElse(sys.props.get("graft.name.variants"))
    println(s"[lexicon-bench] GRAFT_NAME_VARIANTS=${lex.getOrElse("(none)")}")
    val threshold = 0.7
    def view(schema: String, name: String): EntityView =
      EntityView("x", schema, Seq(name), Nil, Nil, Nil, Nil, Nil, Nil,
        Nil, Nil)
    val cases = NameBench.readCsv(frozen).flatMap { r =>
      try Some((r("schema"), r("name1"), r("name2"),
        r("is_match").toBoolean, r("score").toDouble,
        r("predicted_match").toBoolean))
      catch { case _: Exception => None }
    }
    val scored = cases.map { case (sc, n1, n2, isM, fs, fp) =>
      val s = Algorithms.LogicV2.score(view(sc, n1), view(sc, n2))
      (isM, fs, fp, s, s >= threshold)
    }
    val n = scored.size
    val agreeFrozen = scored.count { case (_, _, fp, _, p) => p == fp }
    val agreeTruth = scored.count { case (isM, _, _, _, p) => p == isM }
    val mae = scored.map { case (_, fs, _, s, _) =>
      math.abs(s - fs) }.sum / n
    println(f"[lexicon-bench] name-bench n=$n " +
      f"agreeFrozen=$agreeFrozen (${agreeFrozen.toDouble / n}%.5f) " +
      f"agreeTruth=$agreeTruth (${agreeTruth.toDouble / n}%.5f) " +
      f"MAE=$mae%.4f")
    val checks = EntityBench.loadChecks(checksPath)
    val r = EntityBench.run(checks, Algorithms.LogicV2, threshold)
    println(f"[lexicon-bench] entity_bench@$threshold%.1f " +
      f"correct=${r.total.correct}/${checks.size} " +
      f"FP=${r.total.falsePositives} FN=${r.total.falseNegatives} " +
      f"loss=${r.total.avgLoss}%.3f")
  }
}

object BenchChecksMain {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse(EntityBench.DefaultChecksPath)
    val thresholds = args.lift(1)
      .map(_.split(',').toSeq.map(_.toDouble))
      .getOrElse(Seq(0.5, 0.7, 0.9))
    val checks = EntityBench.loadChecks(path)
    println(s"entity_bench: ${checks.size} checks from $path")
    for (r <- EntityBench.runAll(checks, thresholds))
      println(EntityBench.format(r))
  }
}
