package graft.textanalysis

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The distributed kernel of BPE tokenizer training: adjacent-symbol
  * pair counting over the corpus vocabulary (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units" —
  * public algorithm). Training proper is inherently sequential (each
  * merge changes the next round's counts), so like the k-means trainer
  * ([[graft.similarity.KMeans]]) the engine ships the per-iteration
  * kernel and the driver loops: count pairs → pick the top merge →
  * re-segment → repeat.
  *
  * Scale shape (100 TB): the only corpus-sized work is the word-count
  * aggregate — one shuffle with full map-side combine, and the result
  * is the VOCABULARY (distinct words × frequency), orders of magnitude
  * smaller than the corpus. Pair explosion and the pair aggregate run
  * over the vocabulary, so every BPE iteration after the first scan is
  * corpus-free: re-segmenting cached word counts, never re-reading
  * 100 TB.
  */
object Bpe {

  val TopMerges = 20

  /** Corpus vocabulary: distinct word × occurrence count, shared
    * byte-stable tokenization ([[TextAnalysis.words]]).
    */
  def vocabulary(docs: DataFrame): DataFrame =
    docs.select(explode(TextAnalysis.words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Per-(doc, word) counts for the GATED corpus queries, derived from
    * the stored postings index ([[graft.search.Search.postingsCk]] —
    * the same byte-stable tokenizer, [[TextAnalysis.words]], so
    * (doc_id, term, tf) IS (doc_id, w, c)): the only corpus-sized input
    * of the encode family is already an ingest artifact, and query-time
    * work stays vocabulary-sized. The arbitrary-docs path
    * ([[encodeOf]]) keeps its own one-pass build.
    */
  private def wcCk(s: SparkSession, d: String): DataFrame =
    graft.search.Search.postingsCk(s, d)
      .select(col("doc_id"), col("term").as("w"), col("tf").as("c"))

  /** Corpus vocabulary rolled up from the postings artifact — the
    * occurrence count per distinct word equals the sum of its per-doc
    * term frequencies.
    */
  private def vocabCk(s: SparkSession, d: String): DataFrame =
    wcCk(s, d).groupBy(col("w")).agg(sum(col("c")).as("freq"))

  /** Adjacent character-pair counts weighted by word frequency — the
    * first-iteration merge candidates ("aaa" counts (a,a) twice, like
    * the reference algorithm's per-occurrence scan). Words shorter
    * than 2 symbols emit nothing.
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(length(col("w")) >= 2)
      .select(col("freq"),
        explode(transform(sequence(lit(1), length(col("w")) - 1),
          i => struct(col("w").substr(i, lit(1)).as("a"),
            col("w").substr(i + 1, lit(1)).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Top merge candidates, fully tiebroken (count desc, pair asc) so
    * the chosen merges are deterministic across engines and runs —
    * a tokenizer trained twice must be the same tokenizer.
    */
  def bpeQ(s: SparkSession, d: String): DataFrame =
    pairCounts(vocabCk(s, d))
      .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
      .limit(TopMerges)

  // ------------------------------------------------------------- training

  /** Symbol sequences are strings with DOUBLE-underscore boundaries
    * ("__a__ab__c__", '_' is outside the [a-z0-9] alphabet), and a
    * merge of (a, b) is the exact-string replace of `_a__b_` with
    * `_ab_`: the pattern consumes only the INNER half of each boundary,
    * so adjacent occurrences keep their shared boundary's outer half
    * and a single left-to-right replace pass merges ALL non-overlapping
    * occurrences — true simultaneous BPE merge application. (With
    * single-separator boundaries the shared '_' is consumed by the
    * previous match and `abab` under-merges to [ab, a, b]; the
    * double-boundary form yields [ab, ab], pinned in BpeSpec.)
    */
  private val Sep = "_"

  private def toSeq0(w: Column): Column =
    concat(lit(Sep + Sep), regexp_replace(w, "(.)", "$1" + Sep + Sep))

  private def symsOf(s: Column): Column =
    filter(split(s, Sep), x => length(x) > 0)

  private def mergeSearch(a: Column, b: Column): Column =
    concat(lit(Sep), a, lit(Sep + Sep), b, lit(Sep))

  private def mergeRepl(a: Column, b: Column): Column =
    concat(lit(Sep), a, b, lit(Sep))

  /** TRUE sequential BPE training: the driver loops merge selection
    * (each merge changes the next round's counts — inherently serial),
    * but every iteration is a VOCABULARY-only Spark job: pair counts of
    * the current segmentation → argmax (1 collected row) → re-segment.
    * The corpus itself is touched only by the vocabulary build. Each
    * round's segmentation is checkpointed so the lineage stays flat
    * across k iterations (the k-means/connected-components rule).
    */
  def trainMerges(vocab: DataFrame, k: Int): Seq[(String, String)] = {
    var seg = vocab.select(col("freq"), symsOf(toSeq0(col("w"))).as("syms"))
      .localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var dry = false
    while (round < k && !dry) {
      val top = seg.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(
          zip_with(slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) dry = true
      else {
        val a: String = top(0).getString(0)
        val b: String = top(0).getString(1)
        out += ((a, b))
        val merged = replace(
          concat(lit(Sep + Sep), concat_ws(Sep + Sep, col("syms")),
            lit(Sep + Sep)),
          mergeSearch(lit(a), lit(b)), mergeRepl(lit(a), lit(b)))
        val next = seg.select(col("freq"), symsOf(merged).as("syms"))
          .localCheckpoint(true)
        seg.unpersist()
        seg = next
        round += 1
      }
    }
    out.toSeq
  }

  private val mergeCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Seq[(String, String)]]

  /** [[trainMerges]] once per corpus, the ordered merge list published
    * as a tiny `(rnk, a, b)` lake artifact — a tokenizer is trained
    * once and then applied everywhere (the stored-index pattern of the
    * PQ codes / trained IVF centroids); a later session folds the
    * stored chain without re-running the sequential trainer.
    */
  def trainedMergesCk(s: SparkSession, d: String): Seq[(String, String)] =
    mergeCache.getOrElseUpdate((s, d), {
      val df = graft.IndexLake.artifact(s, d, "bpe_merges") {
        import s.implicits._
        // vocab rolls up from the postings artifact: ingest trains the
        // tokenizer without a second corpus tokenization pass
        trainMerges(vocabCk(s, d), TopMerges)
          .zipWithIndex.map { case ((a, b), i) => (i, a, b) }
          .toDF("rnk", "a", "b")
      }
      df.orderBy(col("rnk")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
    })

  /** Drop cached merge lists (see graft.IndexLake). */
  def clearCache(): Unit = { mergeCache.clear(); graft.IndexLake.clearMemo() }

  // --------------------------------------------------------------- encode

  /** Merge table for the ORACLE-gated encoder: the top
    * [[TopMerges]] FIRST-round pairs ranked (cnt desc, pair asc).
    * One-shot selection instead of sequential retraining — the merge
    * APPLICATION below is exact BPE either way, and one-shot selection
    * is what keeps the whole encode expressible in the DuckDB oracle
    * (sequential selection is available via [[trainMerges]], spec-gated
    * in BpeSpec). First-round pairs are all character pairs, so rank
    * order still decides overlaps exactly like a sequential apply.
    */
  def firstRoundMerges(vocab: DataFrame): DataFrame =
    pairCounts(vocab)
      .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
      .limit(TopMerges)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("cnt").desc, col("a").asc, col("b").asc)))

  /** Corpus BPE token counts: encode each DISTINCT word once (the
    * vocabulary — the scale trick: merge application cost is
    * vocabulary-sized, never corpus-sized) by folding the ranked merge
    * list over the word's symbol string with exact-string replaces,
    * then join token counts back to per-document word counts. The word
    * count table is built in ONE corpus pass and checkpointed; the
    * vocabulary and everything derived roll up from it.
    */
  def encodeOf(docs: DataFrame): DataFrame =
    encodeFrom(graft.Caches.pin(TextAnalysis.withWords(docs)
      .select(col("doc_id"), explode(col("w")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))))

  /** The encode core over an already-materialized (doc_id, w, c) word
    * count table — artifact-backed for the gated query, one corpus
    * pass for arbitrary frames.
    */
  private def encodeFrom(wc: DataFrame): DataFrame = {
    val vocab = wc.groupBy(col("w")).agg(sum(col("c")).as("freq"))
    val marr = broadcast(firstRoundMerges(vocab).agg(
      transform(array_sort(collect_list(struct(col("rnk"), col("a"),
        col("b")))), e => struct(e.getField("a").as("a"),
        e.getField("b").as("b"))).as("ms")))
    val enc = aggregate(col("ms"), toSeq0(col("w")), (acc, m) =>
      replace(acc, mergeSearch(m.getField("a"), m.getField("b")),
        mergeRepl(m.getField("a"), m.getField("b"))))
    val vt = vocab.crossJoin(marr)
      .select(col("w"), size(symsOf(enc)).cast("long").as("ntok"))
    wc.join(vt, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_words"),
        sum(col("c") * col("ntok")).as("n_bpe_tokens"))
  }

  def encodeQ(s: SparkSession, d: String): DataFrame =
    encodeFrom(wcCk(s, d))

  /** Corpus token counts under the SEQUENTIALLY-trained tokenizer —
    * the artifact a pipeline actually ships (q_text_bpe_encode keeps
    * the one-shot first-round variant; this one folds the
    * [[trainMerges]] chain, where each merge was selected against the
    * segmentation its predecessors produced). Training is driver-looped
    * and cached per corpus ([[trainedMergesCk]]); the merges arrive
    * here as literals, so the encode itself is the same
    * vocabulary-sized fold as [[encodeOf]]. The oracle re-derives the
    * identical chain in SQL: [[TopMerges]] unrolled rounds of
    * pair-count → argmax → replace over the vocabulary — sequential
    * selection is expressible, just not as one relational expression.
    */
  def seqEncodeQ(s: SparkSession, d: String): DataFrame = {
    val wc = wcCk(s, d)
    val vocab = wc.groupBy(col("w")).agg(sum(col("c")).as("freq"))
    val merges = trainedMergesCk(s, d)
    val enc = merges.foldLeft(toSeq0(col("w"))) { case (acc, (a, b)) =>
      replace(acc, mergeSearch(lit(a), lit(b)), mergeRepl(lit(a), lit(b)))
    }
    val vt = vocab.select(col("w"), size(symsOf(enc)).cast("long").as("ntok"))
    wc.join(vt, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_words"),
        sum(col("c") * col("ntok")).as("n_bpe_tokens"))
  }

  // ---------------------------------------------------------------- oracle

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_bpe" -> (bpeQ _),
    "q_text_bpe_encode" -> (encodeQ _),
    "q_text_bpe_seq" -> (seqEncodeQ _))

  /** One sequential training round as SQL: pair-count the current
    * segmentation, pick the argmax (full tiebreak), apply it. The '§'
    * sentinel makes an exhausted round a no-op instead of a NULL wipe
    * (mirrors trainMerges' dry stop).
    */
  private def seqChainSql: String = (1 to TopMerges).map { k =>
    s"""sb$k AS MATERIALIZED (
        SELECT a, b FROM (
          SELECT p.a, p.b, CAST(sum(p.freq) AS BIGINT) AS cnt
          FROM (
            SELECT freq, syms[i+1] AS a, syms[i+2] AS b
            FROM (SELECT freq,
                         list_filter(string_split(s, '_'),
                           x -> length(x) > 0) AS syms
                  FROM seg${k - 1}),
                 unnest(range(len(syms) - 1)) t(i)) p
          GROUP BY p.a, p.b
          ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)),
      seg$k AS MATERIALIZED (
        SELECT w, freq, replace(s,
          coalesce((SELECT '_' || a || '__' || b || '_' FROM sb$k), '§'),
          coalesce((SELECT '_' || a || b || '_' FROM sb$k), '§')) AS s
        FROM seg${k - 1})"""
  }.mkString(",\n      ")

  /** The merge chain as [[TopMerges]] generated CTEs — each applies one
    * ranked merge with an exact-string replace on the boundary-anchored
    * symbol string (the same fold the Spark side runs). The coalesce
    * sentinel ('§', outside the alphabet) makes a missing rank a no-op
    * instead of a NULL wipe on tiny corpora.
    */
  private def encChainSql: String = (1 to TopMerges).map { k =>
    s"""enc$k AS (
        SELECT w, replace(s,
          coalesce((SELECT '_' || a || '__' || b || '_'
                    FROM merges WHERE rnk = $k), '§'),
          coalesce((SELECT '_' || a || b || '_'
                    FROM merges WHERE rnk = $k), '§')) AS s
        FROM enc${k - 1})"""
  }.mkString(",\n      ")

  val oracles: Map[String, String] = Map(
    "q_text_bpe_seq" -> s"""
      WITH words AS (
        SELECT doc_id, unnest(${TextAnalysis.wSql}) AS w FROM documents),
      wc AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w),
      vocab AS (SELECT w, CAST(sum(c) AS BIGINT) AS freq FROM wc GROUP BY w),
      seg0 AS MATERIALIZED (
        SELECT w, freq, '__' || regexp_replace(w, '(.)', '\\1__', 'g') AS s
        FROM vocab),
      $seqChainSql,
      vt AS (
        SELECT w, CAST(len(list_filter(string_split(s, '_'),
          x -> length(x) > 0)) AS BIGINT) AS ntok
        FROM seg$TopMerges)
      SELECT wc.doc_id, CAST(sum(wc.c) AS BIGINT) AS n_words,
             CAST(sum(wc.c * vt.ntok) AS BIGINT) AS n_bpe_tokens
      FROM wc JOIN vt USING (w) GROUP BY wc.doc_id""",
    "q_text_bpe_encode" -> s"""
      WITH words AS (
        SELECT doc_id, unnest(${TextAnalysis.wSql}) AS w FROM documents),
      wc AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w),
      vocab AS (SELECT w, CAST(sum(c) AS BIGINT) AS freq FROM wc GROUP BY w),
      pairs AS (
        SELECT substring(w, CAST(i AS INT), 1) AS a,
               substring(w, CAST(i + 1 AS INT), 1) AS b, freq
        FROM (SELECT * FROM vocab WHERE length(w) >= 2),
             unnest(range(1, length(w))) t(i)),
      ranked AS (
        SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt
        FROM pairs GROUP BY a, b
        ORDER BY cnt DESC, a ASC, b ASC LIMIT $TopMerges),
      merges AS (
        SELECT a, b, row_number() OVER (ORDER BY cnt DESC, a ASC, b ASC)
          AS rnk
        FROM ranked),
      enc0 AS (
        SELECT w, '__' || regexp_replace(w, '(.)', '\\1__', 'g') AS s
        FROM vocab),
      $encChainSql,
      vt AS (
        SELECT w, CAST(len(list_filter(string_split(s, '_'),
          x -> length(x) > 0)) AS BIGINT) AS ntok
        FROM enc$TopMerges)
      SELECT wc.doc_id, CAST(sum(wc.c) AS BIGINT) AS n_words,
             CAST(sum(wc.c * vt.ntok) AS BIGINT) AS n_bpe_tokens
      FROM wc JOIN vt USING (w) GROUP BY wc.doc_id""",
    "q_text_bpe" -> s"""
      WITH words AS (
        SELECT unnest(${TextAnalysis.wSql}) AS w FROM documents),
      vocab AS (SELECT w, count(*) AS freq FROM words GROUP BY w),
      pairs AS (
        SELECT substring(w, CAST(i AS INT), 1) AS a,
               substring(w, CAST(i + 1 AS INT), 1) AS b, freq
        FROM (SELECT * FROM vocab WHERE length(w) >= 2),
             unnest(range(1, length(w))) t(i))
      SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt
      FROM pairs GROUP BY a, b
      ORDER BY cnt DESC, a ASC, b ASC LIMIT $TopMerges""")
}
