package graft.cli

import graft.matching.EntityBench

/** `BenchChecksMain [checks.yml] [threshold,...]` — the entity-bench
  * accuracy scoreboard (reference `contrib/entity_bench/benchmark.py`):
  * scores every registered algorithm over the checks corpus at each
  * threshold and prints per-schema confusion matrices. Driver-side,
  * no Spark session — the corpus is a few hundred pairs.
  */
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
