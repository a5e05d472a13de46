package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.StarStatements
import graft.xref.Xref

/** Xref scale soak: replicate the star corpus N× (identical values,
  * suffixed ids — worst-case token duplication, every entity has N−1
  * duplicates) and run the full xref pipeline under the REFERENCE
  * blocker caps. Proves the stopword cost cap holds the pair join at a
  * corpus 10× the bench without config changes, and records wall time
  * plus total/peak shuffle volumes for PLANS.md.
  *
  * A second mode soaks the corpus-curation pipeline the same way:
  * `runMain graft.Soak <sfDir> <replicas> curate` replicates the
  * document corpus N× with IDENTICAL texts (worst-case duplication —
  * every document has N−1 exact copies) and runs `CurateMain.run`;
  * the exact-dedup stage must collapse the corpus back to ~1× before
  * the quadratic-ish near-dup stage ever sees it.
  *
  * Usage: runMain graft.Soak [sfDir] [replicas] [xref|curate]
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(10)
    val mode = args.lift(2).getOrElse("xref")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.maxPlanStringLength", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var shuffleWrite = 0L
    @volatile var peakStageWrite = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          s: SparkListenerStageCompleted): Unit = {
        val w = s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        shuffleWrite += w
        if (w > peakStageWrite) peakStageWrite = w
      }
    })

    if (mode == "curate") {
      val docs = docCorpus(spark, sfDir, replicas)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val nDocs = docs.count()
      val t0 = System.nanoTime()
      val (curated, report) =
        cli.CurateMain.run(spark, docs, minQuality = 0.3, minLogp = -12.0)
      val nOut = curated.count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"""{"soak":"curate","sf":"$sfDir","replicas":$replicas,""" +
        f""""docs":$nDocs,"out":$nOut,"report":${report.json},""" +
        f""""wall_sec":$wall%.1f,""" +
        f""""shuffle_write_mb":${shuffleWrite / 1e6}%.1f,""" +
        f""""peak_stage_shuffle_mb":${peakStageWrite / 1e6}%.1f}""")
      spark.stop()
      return
    }

    val stmts = corpus(spark, sfDir, replicas)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val nStmts = stmts.count()
    val nEntities = stmts.select("canonical_id").distinct().count()

    import spark.implicits._
    val decided = Seq.empty[(String, String)].toDF("src", "dst")
    val t0 = System.nanoTime()
    val (merges, suggestions) = Xref.run(spark, stmts, decided,
      Xref.Config(autoThreshold = Some(0.7)))
    val nMerges = merges.count()
    val nSuggest = suggestions.count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"""{"soak":"xref","sf":"$sfDir","replicas":$replicas,""" +
      f""""statements":$nStmts,"entities":$nEntities,""" +
      f""""wall_sec":$wall%.1f,"merges":$nMerges,""" +
      f""""suggestions":$nSuggest,""" +
      f""""shuffle_write_mb":${shuffleWrite / 1e6}%.1f,""" +
      f""""peak_stage_shuffle_mb":${peakStageWrite / 1e6}%.1f}""")
    spark.stop()
  }

  /** N replicas of the document corpus with distinct ids but IDENTICAL
    * texts — every doc has N−1 exact duplicates. The id span is derived
    * from the corpus's own max id so replicas can never collide.
    */
  def docCorpus(s: SparkSession, sfDir: String, replicas: Int): DataFrame = {
    val base = Tables.documents(s, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val maxRow = base.agg(max(col("doc_id"))).head
    val span = if (maxRow.isNullAt(0)) 1L else maxRow.getLong(0) + 1L
    (0 until replicas).map { i =>
      base.withColumn("doc_id", col("doc_id") + lit(i * span))
    }.reduce(_.unionByName(_))
  }

  /** N replicas of the star statement view widened to the full
    * statement-table shape, each replica its own dataset. Star schemas
    * map onto FtM matchable schemata so the production tokenizer (which
    * gates on the ontology) processes them.
    */
  def corpus(s: SparkSession, sfDir: String, replicas: Int): DataFrame = {
    val base = StarStatements(s, sfDir)
      .filter(col("field") === "name")
      .withColumn("schema",
        when(col("schema") === "Customer", "Person")
          .when(col("schema") === "Supplier", "Company")
          .otherwise("Organization"))
    val reps = (0 until replicas).map { i =>
      base.select(
        concat(col("id"), lit(s"-r$i")).as("canonical_id"),
        col("schema"),
        col("field").as("prop"),
        lit("name").as("prop_type"),
        col("value"),
        lit(s"soak$i").as("dataset"),
        lit(false).as("external"))
    }
    reps.reduce(_.unionByName(_))
      .withColumn("entity_id", col("canonical_id"))
      .withColumn("id", md5(concat_ws("|", col("canonical_id"),
        col("prop"), col("value"))))
      .withColumn("original_value", lit(null).cast("string"))
      .withColumn("origin", lit(null).cast("string"))
      .withColumn("lang", lit(null).cast("string"))
      .withColumn("first_seen", lit(null).cast("timestamp"))
      .withColumn("last_seen", lit(null).cast("timestamp"))
  }
}
