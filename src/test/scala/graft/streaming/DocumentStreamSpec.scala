package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Streaming document ingest driven through MemoryStream: the quality
  * gate matches its batch twin and the watermarked dedupe keeps one
  * copy per content hash across micro-batches.
  */
class DocumentStreamSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  private val good =
    "the quick brown fox jumps over a lazy dog and then the " +
      "fox runs off to find a meal of fresh berries by the river"
  private val bad = "x x x x x"

  test("quality gate passes rich text, drops degenerate text") {
    implicit val sc = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val docs = src.toDF().toDF("doc_id", "text")
    val q = DocumentStream.qualityGate(docs, minScore = 0.5)
      .writeStream.format("memory").queryName("qgate")
      .outputMode("append").start()
    try {
      src.addData((1L, good), (2L, bad))
      q.processAllAvailable()
      val ids = spark.table("qgate").select("doc_id")
        .as[Long].collect().toSet
      assert(ids === Set(1L))
      // the streaming score equals the batch expression's score
      val batch = Seq((1L, good)).toDF("doc_id", "text")
        .select(graft.textanalysis.TextAnalysis.qualityExpr(
          graft.textanalysis.TextAnalysis.words(col("text")))
          .as("quality")).head.getDouble(0)
      val streamed = spark.table("qgate")
        .select("quality").head.getDouble(0)
      assert(streamed === batch)
    } finally q.stop()
  }

  test("watermarked dedupe keeps the first copy per content hash") {
    implicit val sc = spark.sqlContext
    val src = MemoryStream[(Long, Timestamp, String)]
    val docs = src.toDF().toDF("doc_id", "ts", "text")
    val q = DocumentStream.dedupeStream(docs, horizon = "1 hour")
      .writeStream.format("memory").queryName("dedupe")
      .outputMode("append").start()
    try {
      def t(min: Int) = new Timestamp(min * 60000L)
      src.addData((1L, t(0), good), (2L, t(1), good), (3L, t(2), bad))
      q.processAllAvailable()
      // a later micro-batch with the same content still drops
      src.addData((4L, t(10), good))
      q.processAllAvailable()
      val ids = spark.table("dedupe").select("doc_id")
        .as[Long].collect().toSet
      // exactly one copy of the duplicated content survives (which of
      // the in-batch twins is unspecified), the distinct doc passes,
      // and the cross-batch duplicate is dropped by state
      assert(ids.size === 2)
      assert(ids.contains(3L))
      assert((ids & Set(1L, 2L)).size === 1)
      assert(!ids.contains(4L))
    } finally q.stop()
  }

  test("streaming HLL registers converge to the batch register table") {
    import graft.textanalysis.Sketches
    implicit val sc = spark.sqlContext
    val src = MemoryStream[(String, Long, String)]
    val docs = src.toDF().toDF("source", "doc_id", "text")
    val q = DocumentStream.hllRegisters(docs)
      .writeStream.format("memory").queryName("hllregs")
      .outputMode("complete").start()
    val batch1 = Seq(
      ("s0", 1L, good), ("s0", 2L, bad), ("s1", 3L, good))
    val batch2 = Seq(
      ("s0", 4L, "berries and river and fox"), ("s1", 5L, bad))
    try {
      src.addData(batch1: _*)
      q.processAllAvailable()
      src.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("hllregs")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        .toSet
      val batchRegs = Sketches.registersOf(Sketches.postingsOf(
        (batch1 ++ batch2).toDF("source", "doc_id", "text")))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        .toSet
      // the streaming state snapshot IS the batch register table
      assert(streamed === batchRegs)
      // and the snapshot estimates with the batch algebra
      val est = Sketches.estimateOf(spark.table("hllregs"))
        .collect().map(r => (r.getString(0), r.getLong(2))).toMap
      assert(est.keySet === Set("s0", "s1"))
      assert(est.values.forall(_ > 0))
    } finally q.stop()
  }

  test("streaming near-dup screen equals batch LSH candidates") {
    import graft.dedup.{Dedup, DedupQueries}
    import org.apache.spark.sql.functions._
    val near1 = "the quick brown fox jumps over the lazy dog tonight"
    val near2 = "the quick brown fox jumps over the lazy dog today"
    val other = "completely different words about spark window joins here"
    val all = Seq((1L, near1), (3L, other), (2L, near2), (4L, near1))
    implicit val sc = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val q = DocumentStream.nearDupStream(src.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try {
      src.addData(all(0), all(1)) // batch 1
      q.processAllAvailable()
      src.addData(all(2), all(3)) // batch 2: near-dups of doc 1 arrive
      q.processAllAvailable()
      val streamed = spark.table("neardup")
        .select("a", "b").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch twin over the union corpus — the SAME shared pipeline
      val docs = all.toDF("doc_id", "text")
      val sigs = DedupQueries.hashedShinglesOf(docs)
        .select(col("doc_id"), Dedup.minhashSigFromHashes(col("hs"),
          DedupQueries.MinhashK).as("sig"))
      val batch = Dedup.lshCandidates(sigs, "doc_id",
        DedupQueries.Bands, DedupQueries.RowsPerBand)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch)
      // the cross-batch exact duplicate (1, 4) is found with est 1.0
      assert(streamed.contains((1L, 4L)))
      val est14 = spark.table("neardup")
        .filter(col("a") === 1L && col("b") === 4L)
        .select("est_jaccard").head.getDouble(0)
      assert(est14 === 1.0)
    } finally q.stop()
  }

  test("LM gate scores against the static model, exact arithmetic") {
    import graft.textanalysis.LangModel
    // train on "a b a b": un(a)=2 un(b)=2 T=4; bc(a,b)=2 bc(b,a)=1
    val model = LangModel.train(Seq((1L, "a b a b")).toDF("doc_id", "text"))
    assert(model.total === 4L && model.bi(("a", "b")) === 2L)
    def e6(p: Double) = math.floor(math.log(p) * 1e6 + 0.5).toLong
    // "a b c": p(a)=.5, p(b|a)=1, p(c|b)=0.4*(0.5/4) → avg of 3
    val expHeld = BigDecimal((e6(0.5) + e6(1.0) + e6(0.4 * 0.5 / 4)).toDouble
      / (3 * 1e6)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(model.avgLogp(Seq("a", "b", "c")) === Some(expHeld))

    implicit val sc = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val docs = src.toDF().toDF("doc_id", "text")
    val q = DocumentStream.lmGate(docs, model, minLogp = expHeld - 0.001)
      .writeStream.format("memory").queryName("lmgate")
      .outputMode("append").start()
    try {
      // doc 1 scores exactly expHeld (passes); doc 2 is all-OOV (drops)
      src.addData((1L, "a b c"), (2L, "zz zz zz zz"))
      q.processAllAvailable()
      val rows = spark.table("lmgate")
        .select("doc_id", "avg_logp").collect()
      assert(rows.map(_.getLong(0)).toSet === Set(1L))
      assert(rows.head.getDouble(1) === expHeld)
    } finally q.stop()
  }

  test("classifier gate matches the batch scoring bit-for-bit") {
    import graft.textanalysis.Classifier
    val sf = "/root/testdata/sf0.001"
    // train once on the lake corpus (the ingest artifact path), then
    // serve the stream against the frozen coefficients
    val model = Classifier.train(
      Classifier.featuresOf(graft.Tables.documents(spark, sf)))
    val sample = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(40)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    implicit val sc = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val docs = src.toDF().toDF("doc_id", "text")
    val q = DocumentStream.classifierGate(docs, model, minProb = 0.5)
      .writeStream.format("memory").queryName("clfgate")
      .outputMode("append").start()
    try {
      src.addData(sample: _*)
      src.addData((990001L, "   ")) // token-less: must drop, not crash
      q.processAllAvailable()
      val streamed = spark.table("clfgate")
        .select("doc_id", "score6").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the batch query's score6 over the same docs, same model
      val ids = sample.map(_._1).toSet
      val batch = Classifier.classifierQ(spark, sf)
        .filter(col("doc_id").isin(ids.toSeq: _*))
        .filter(col("score6") >= 500000L)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(streamed === batch)
      assert(!streamed.contains(990001L))
    } finally q.stop()
  }
}
