package graft

/** One switch for every per-(session, sfDir) stored-index cache in the
  * engine — the checkpoint-cached artifacts a production lake would
  * materialize at ingest (blocker TF/entries, resolver score table,
  * wikidata snak table, trained IVF centroids, PQ codes, banded
  * corpus, winnow fingerprints, BPE merges). A long-lived session
  * iterating regenerated data directories calls this between dirs;
  * otherwise every cache would pin its checkpoints for the session's
  * lifetime and a regenerated dir would keep serving its stale index.
  */
object Caches {
  def clearAll(): Unit = {
    blocker.BlockerQueries.clearTfCache()
    resolver.ResolverQueries.clearCache()
    enrich.WikidataQueries.clearCache()
    similarity.KMeans.clearCache()
    similarity.Pq.clearCache()
    similarity.SimilarityQueries.clearCache()
    dedup.DedupQueries.clearCache()
    textanalysis.Bpe.clearCache()
  }
}
