package graft.ext

import graft.QueryDef
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over an embedding column — the codebook
  * trainer that turns the IVF index (q45) from a stand-in into a real
  * coarse quantizer. Mirrors the reference's analytics posture of
  * reproducible derived tables (every step is exact + deterministic, so
  * the DuckDB oracle can replay training bit-for-bit):
  *
  *  - init: centroids = the embeddings of the `k` smallest `vec_id`s
  *    (deterministic, oracle-able — a production run would use k-means||);
  *  - assign: nearest centroid by exact cosine (decimal-sum dot, rounded
  *    to 9 decimals), ties to the smallest centroid id, computed with the
  *    `max_by(cid, struct(sim, -cid))` partial-agg pattern so the shuffle
  *    carries ONE row per vector, never a sort — at 100 TB assignment is a
  *    broadcast-join map stage plus a keyed partial agg;
  *  - update: per-(cid, dim) mean via floor-based fixed point
  *    ([[graft.QueryDef.tavg]]) — decimal-cast rounding (HALF_UP vs
  *    HALF_EVEN) can tie on binary floats, floor cannot — one shuffle of
  *    (cid, dim) cells per round, k×dim rows out.
  *
  * Each round ends in a `localCheckpoint` of the (tiny: k rows) centroid
  * table: the iterative-algorithm pattern — without it round N's plan
  * re-derives rounds 1..N-1 on every consumer (same reasoning as
  * [[Dedup.connectedComponents]]).
  */
object KMeans {

  /** Train a `k`-centroid codebook with `iters` Lloyd rounds over
    * `emb(vec_id, embedding: array<float|double>)`.
    * Returns `(cid, ce: array<double>, cn2: double, n_vectors: long)` —
    * `n_vectors` is the size of each centroid's final assignment cell.
    * A centroid whose cell empties disappears (both engines agree).
    */
  def trainCodebook(emb: DataFrame, k: Int = 8, iters: Int = 2,
      onRound: (Int, Double) => Unit = (_, _) => ()): DataFrame = {
    val s = emb.sparkSession
    graft.functions.GraftFunctions.register(s)
    import graft.functions.GraftFunctions.dotExact
    // uniform double arrays (float→double is exact); norms once per vector;
    // materialized once — every round re-scans this, not the source parquet
    val e = emb
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      .withColumn("n2", dotExact(col("embedding"), col("embedding")))
      .localCheckpoint()
    var cents = e.where(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"),
        col("n2").as("cn2"), lit(0L).as("n_vectors"))
      .localCheckpoint()
    runLloyd(e, cents, iters, onRound)
  }

  /** The Lloyd loop shared by [[trainCodebook]] (lowest-id init) and
    * [[trainCodebookParallel]] (k-means‖ init). `e` must carry
    * (vec_id, embedding: array<double>, n2) and be materialized;
    * `cents0` must carry (cid, ce, cn2, n_vectors) with k rows.
    */
  private def runLloyd(e: DataFrame, cents0: DataFrame, iters: Int,
      onRound: (Int, Double) => Unit): DataFrame = {
    import graft.functions.GraftFunctions.dotExact
    var cents = cents0
    for (r <- 1 to iters) {
      val t0 = System.nanoTime()
      // centroids are k rows by construction — the one place a hard
      // broadcast hint is safe (bounded by a parameter, not the corpus)
      val scored = e.join(broadcast(cents.select(col("cid"), col("ce"), col("cn2"))))
        .select(col("vec_id"), col("cid"),
          Similarity.cosine(dotExact(col("embedding"), col("ce")),
            col("n2"), col("cn2")).as("c_sim"))
      val assign = scored.groupBy(col("vec_id"))
        .agg(max_by(col("cid"), struct(col("c_sim"), -col("cid"))).as("cid"))
      val cells = e.join(assign, "vec_id")
        .select(col("cid"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("cid"), col("dim"))
        .agg(QueryDef.tavg(col("v")).as("cv"), count(lit(1)).as("n_vectors"))
      cents = cells.groupBy(col("cid"))
        .agg(
          transform(array_sort(collect_list(struct(col("dim"), col("cv")))),
            _.getField("cv")).as("ce"),
          max(col("n_vectors")).as("n_vectors"))
        .withColumn("cn2", dotExact(col("ce"), col("ce")))
        .select(col("cid"), col("ce"), col("cn2"), col("n_vectors"))
        .localCheckpoint()
      // localCheckpoint is eager, so the round's full work is materialized
      // here — the callback sees true per-round wall time (scale probe)
      onRound(r, (System.nanoTime() - t0) / 1e9)
    }
    cents
  }

  /** Product-quantization trainer: `m` independent `subDim`-wide subspace
    * codebooks trained in ONE distributed pass per Lloyd round. The
    * subspace id joins every key — (vec, sub) assignment, (sub, cid, dim)
    * cell means — so all `m` trainings share each corpus scan and shuffle
    * instead of running `m` sequential Lloyd loops. At 100 TB with m = 8
    * subspaces that is 1 corpus read per round, not 8; on the local bench
    * it collapses 2× the fixed per-job overhead into one job chain.
    * Bit-identical to `m` separate [[trainCodebook]] runs over
    * `slice(embedding, i*subDim+1, subDim)` (the per-subspace math never
    * crosses the `sub` key — pinned by KMeansSpec).
    * Returns `(sub, cid, ce, cn2, n_vectors)`.
    */
  def trainProductCodebooks(emb: DataFrame, m: Int, subDim: Int,
      k: Int = 4, iters: Int = 1): DataFrame = {
    val s = emb.sparkSession
    graft.functions.GraftFunctions.register(s)
    import graft.functions.GraftFunctions.dotExact
    val subs = array((0 until m).map(i =>
      struct(lit(i).as("sub"),
        slice(col("emb"), i * subDim + 1, subDim).as("se"))): _*)
    val e = emb
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("emb"))
      .select(col("vec_id"), explode(subs).as("p"))
      .select(col("vec_id"), col("p.sub"), col("p.se").as("embedding"))
      .withColumn("n2", dotExact(col("embedding"), col("embedding")))
      .localCheckpoint()
    var cents = e.where(col("vec_id") < k)
      .select(col("sub"), col("vec_id").as("cid"), col("embedding").as("ce"),
        col("n2").as("cn2"), lit(0L).as("n_vectors"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      // m·k rows by construction — the bounded-by-parameter broadcast
      val scored = e.join(
          broadcast(cents.select(col("sub"), col("cid"), col("ce"), col("cn2"))),
          Seq("sub"))
        .select(col("vec_id"), col("sub"), col("cid"),
          Similarity.cosine(dotExact(col("embedding"), col("ce")),
            col("n2"), col("cn2")).as("c_sim"))
      val assign = scored.groupBy(col("vec_id"), col("sub"))
        .agg(max_by(col("cid"), struct(col("c_sim"), -col("cid"))).as("cid"))
      val cells = e.join(assign, Seq("vec_id", "sub"))
        .select(col("sub"), col("cid"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("sub"), col("cid"), col("dim"))
        .agg(graft.QueryDef.tavg(col("v")).as("cv"), count(lit(1)).as("n_vectors"))
      cents = cells.groupBy(col("sub"), col("cid"))
        .agg(
          transform(array_sort(collect_list(struct(col("dim"), col("cv")))),
            _.getField("cv")).as("ce"),
          max(col("n_vectors")).as("n_vectors"))
        .withColumn("cn2", dotExact(col("ce"), col("ce")))
        .select(col("sub"), col("cid"), col("ce"), col("cn2"), col("n_vectors"))
        .localCheckpoint()
    }
    cents
  }

  /** Coarse-quantize every vector to its nearest codebook centroid — the
    * IVF assignment kernel (q45's shape) as a reusable primitive shared
    * by the batch index builder ([[writePostingsBucketed]]) and the
    * streaming ingest ([[graft.streaming.EventStream.ivfMaintain]]):
    * broadcast k-row codebook join + `max_by` partial agg (one shuffled
    * row per vector, never a sort), exact-decimal cosine, ties to the
    * smallest cid. Returns `(vec_id, cid, c_sim, n2, embedding)`.
    */
  def assignPostings(emb: DataFrame, codebook: DataFrame): DataFrame = {
    val s = emb.sparkSession
    graft.functions.GraftFunctions.register(s)
    import graft.functions.GraftFunctions.dotExact
    val e = emb
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      .withColumn("n2", dotExact(col("embedding"), col("embedding")))
    val scored = e.join(
        broadcast(codebook.select(col("cid"), col("ce"), col("cn2"))))
      .select(col("vec_id"), col("embedding"), col("n2"), col("cid"),
        Similarity.cosine(dotExact(col("embedding"), col("ce")),
          col("n2"), col("cn2")).as("c_sim"))
    scored.groupBy(col("vec_id"))
      .agg(
        max_by(struct(col("cid"), col("c_sim")),
          struct(col("c_sim"), -col("cid"))).as("bm"),
        first(col("embedding")).as("embedding"),
        first(col("n2")).as("n2"))
      .select(col("vec_id"), col("bm.cid").as("cid"),
        col("bm.c_sim").as("c_sim"), col("n2"), col("embedding"))
  }

  /** The 100 TB IVF-serving layout, made executable — the
    * [[graft.ext.Dedup.writeBandIndexBucketed]] analog for vectors: the
    * assigned postings land ONCE as a table BUCKETED (and sorted) on the
    * probe-join key `cid`, so every probe ([[probePostingsBucketed]])
    * scans the postings buckets IN PLACE — the corpus-sized side never
    * shuffles again; only the (tiny) probe frame pays an Exchange.
    * PlanShapeSpec pins the property. Returns the table name.
    */
  def writePostingsBucketed(postings: DataFrame, tag: String,
      buckets: Int = 8): String = {
    val s = postings.sparkSession
    val tbl = s"graft_ivf_idx_$tag"
    val wh = s.conf.get("spark.sql.warehouse.dir")
    postings.write.mode("overwrite")
      .bucketBy(buckets, "cid")
      .sortBy("cid")
      .option("path", s"$wh/graft_bucketed/$tbl")
      .saveAsTable(tbl)
    tbl
  }

  /** Deletion propagation for the SERVED IVF postings —
    * [[graft.ext.Dedup.scrubBandIndex]]'s analog for vectors: a
    * right-to-be-forgotten list must vanish from the index ANN probes
    * read, or a deleted subject keeps coming back as someone's nearest
    * neighbor. The tombstone side broadcasts onto a LEFT-ANTI over the
    * bucketed scan (the postings never shuffle); survivors land as a
    * NEW bucketed generation. Exact by per-vector independence: a
    * posting is (vec, nearest cell of a FIXED codebook), so against the
    * same codebook scrub(index, T) ≡ assign(corpus ∖ T) row for row —
    * q331 gates the equality. Deliberately NOT a retrain: whether the
    * codebook itself should eventually re-train without the deleted
    * vectors is a policy decision (centroids carry aggregate influence,
    * not rows — the q325 recompute contract applies when policy says
    * so); the index scrub is the part that must be immediate.
    */
  def scrubPostings(indexTable: String, tombstones: DataFrame,
      tag: String, buckets: Int = 8,
      broadcastKeyLimit: Long = 4000000L): String = {
    val t = tombstones.select(col("vec_id")).localCheckpoint()
    writePostingsBucketed(
      scrubPostingsPlan(indexTable, t,
        forceBroadcast = t.count() <= broadcastKeyLimit), tag, buckets)
  }

  /** The frame [[scrubPostings]] lands — one shared implementation with
    * [[graft.ext.Dedup.scrubBandIndexPlan]] (keyed on vec_id), so the
    * bounded-broadcast policy cannot diverge between the two served-index
    * families.
    */
  private[graft] def scrubPostingsPlan(indexTable: String,
      tombstones: DataFrame,
      forceBroadcast: Boolean = true): DataFrame =
    graft.ext.Dedup.scrubBandIndexPlan(indexTable, tombstones, "vec_id",
      forceBroadcast)

  /** Probe-and-rescore against a [[writePostingsBucketed]] table: rank
    * cells per query by centroid cosine, probe the best `nprobe` via a
    * merge join INTO the bucketed layout (zero Exchange on the postings
    * side — the merge hint keeps the fixture-scale plan the same SMJ
    * shape the 100 TB plan has), exact-rescore only inside probed cells,
    * top-k per query. Same output schema as
    * [[graft.streaming.EventStream.ivfProbe]].
    */
  def probePostingsBucketed(indexTable: String, codebook: DataFrame,
      queries: DataFrame, nprobe: Int = 2, k: Int = 10): DataFrame = {
    val s = codebook.sparkSession
    graft.functions.GraftFunctions.register(s)
    import graft.functions.GraftFunctions.dotExact
    import org.apache.spark.sql.expressions.Window
    val idx = s.table(indexTable)
    val qe = queries
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), x => x.cast("double")).as("q_emb"))
      .withColumn("q_n2", dotExact(col("q_emb"), col("q_emb")))
    val bySim = Window.partitionBy(col("query_id"))
      .orderBy(col("c_sim").desc, col("cid").asc)
    val probes = qe.join(
        broadcast(codebook.select(col("cid"), col("ce"), col("cn2"))))
      .select(col("query_id"), col("q_emb"), col("q_n2"), col("cid"),
        Similarity.cosine(dotExact(col("q_emb"), col("ce")),
          col("q_n2"), col("cn2")).as("c_sim"))
      .withColumn("rn", row_number().over(bySim))
      .where(col("rn") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("q_n2"), col("cid"))
    val topk = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("cand_id").asc)
    idx.hint("merge").join(probes, Seq("cid"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        Similarity.cosine(dotExact(col("q_emb"), col("embedding")),
          col("q_n2"), col("n2")).as("cosine_sim"))
      .withColumn("rank", row_number().over(topk).cast("int"))
      .where(col("rank") <= k)
  }

  /** PRODUCTION init: deterministic k-means‖ (Bahmani et al., "Scalable
    * K-Means++", VLDB'12) followed by the same Lloyd loop. Each init round
    * scores every vector against the current candidate set (broadcast,
    * bounded by ~2k·rounds) and samples new candidates with probability
    * ∝ cost — the classic sequential k-means++ pass over the data done in
    * O(initRounds) distributed scans instead of k. "Random" draws are the
    * salted 60-bit hash of vec_id, so init is fully deterministic and
    * re-runs pick identical seeds (the property every other trained
    * artifact in this repo has). The final reduction — weighting each
    * candidate by its attracted population and choosing k seeds by
    * weighted farthest-first traversal — runs driver-side on the
    * candidate set only (≤ 1 + 2k·initRounds rows: control-plane sized).
    *
    * Not in the DuckDB gate: the gate pins the oracle-able lowest-id init
    * ([[trainCodebook]]); this is the initializer a production deployment
    * swaps in (KMeansSpec pins determinism, k-row output, and
    * no-worse-than-baseline quantization cost).
    */
  def trainCodebookParallel(emb: DataFrame, k: Int = 8, iters: Int = 2,
      initRounds: Int = 3,
      onRound: (Int, Double) => Unit = (_, _) => ()): DataFrame = {
    val s = emb.sparkSession
    graft.functions.GraftFunctions.register(s)
    import graft.functions.GraftFunctions.{dotExact, dotFast}
    val e = emb
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      .withColumn("n2", dotExact(col("embedding"), col("embedding")))
      .localCheckpoint()
    // init scoring uses the FAST native dot: seeding quality needs no
    // bit-exact decimals (nothing here is oracle-gated — the Lloyd rounds
    // that produce the codebook still run the exact kernel), and the init
    // cost passes score every vector against up to 1 + 2k·rounds
    // candidates, which is where the decimal kernel's cost explodes
    def fastCos(dot: Column, na: Column, nb: Column): Column =
      when(na > 0.0 && nb > 0.0, dot / (sqrt(na) * sqrt(nb))).otherwise(0.0)
    def drawHash(salt: String) = TextAnalysis.hash60Fast(s,
      concat(col("vec_id").cast("string"), lit(salt)))
    // first center: the deterministic pseudo-random draw (min salted hash)
    var cand = e
      .orderBy(drawHash(":kpp-seed").asc, col("vec_id").asc).limit(1)
      .select(col("vec_id"), col("embedding"), col("n2"))
      .localCheckpoint()
    val l = 2.0 * k // oversampling factor per round (the paper's ~2k)
    for (r <- 1 to initRounds) {
      // cost(x) = 1 - best cosine against current candidates; candidates
      // are init-bounded so the join side is always broadcastable
      val cost = e.join(broadcast(cand.select(col("vec_id").as("ccid"),
          col("embedding").as("ce"), col("n2").as("cn2"))))
        .select(col("vec_id"),
          fastCos(dotFast(col("embedding"), col("ce")),
            col("n2"), col("cn2")).as("sim"))
        .groupBy(col("vec_id")).agg((lit(1.0) - max(col("sim"))).as("d"))
      val tot = cost.agg(sum(col("d"))).head().getDouble(0)
      if (tot > 0) {
        // sample with p = min(1, l·d/Σd) via the salted-hash uniform; a
        // point already chosen has d = 0 → p = 0, so no duplicates arise
        val picked = e.join(cost, "vec_id")
          .where((pmod(drawHash(s":kpp-$r"), lit(1000000000L)).cast("double")
            / 1e9) < least(lit(1.0), lit(l) * col("d") / lit(tot)))
          .select(col("vec_id"), col("embedding"), col("n2"))
        cand = cand.union(picked).localCheckpoint()
      }
    }
    // weight candidates by attracted population (one bounded-key agg)
    val attracted = e.join(broadcast(cand.select(col("vec_id").as("ccid"),
        col("embedding").as("ce"), col("n2").as("cn2"))))
      .select(col("vec_id"), col("ccid"),
        fastCos(dotFast(col("embedding"), col("ce")),
          col("n2"), col("cn2")).as("sim"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("ccid"), struct(col("sim"), -col("ccid"))).as("ccid"))
      .groupBy(col("ccid")).agg(count(lit(1)).as("w"))
    val candRows = cand
      .join(attracted, cand("vec_id") === attracted("ccid"), "left")
      .select(cand("vec_id"), cand("embedding"), cand("n2"),
        coalesce(col("w"), lit(0L)).as("w"))
      .collect() // control-plane sized: ≤ 1 + 2k·initRounds rows
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2),
        r.getLong(3)))
    // driver-side weighted farthest-first traversal picks the k seeds:
    // deterministic (ties to smallest id), no local k-means randomness
    def cos(a: Array[Double], na: Double, b: Array[Double], nb: Double): Double =
      if (na <= 0 || nb <= 0) 0.0
      else {
        var d = 0.0; var i = 0
        while (i < math.min(a.length, b.length)) { d += a(i) * b(i); i += 1 }
        d / (math.sqrt(na) * math.sqrt(nb))
      }
    val chosen = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double], Double, Long)]
    if (candRows.nonEmpty) {
      chosen += candRows.maxBy(c => (c._4, -c._1))
      while (chosen.size < k && chosen.size < candRows.length) {
        val next = candRows.filterNot(c => chosen.exists(_._1 == c._1))
          .maxBy { c =>
            val nearest = chosen.map(ch => cos(c._2, c._3, ch._2, ch._3)).max
            (c._4.toDouble * (1.0 - nearest), -c._1.toDouble)
          }
        chosen += next
      }
    }
    // degenerate corpora can yield < k candidates — complete from the
    // lowest ids not already chosen (the baseline init), never fail
    if (chosen.size < k) {
      val have = chosen.map(_._1).toSet
      e.orderBy(col("vec_id")).limit(k + chosen.size).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2), 0L))
        .filterNot(c => have.contains(c._1)).take(k - chosen.size)
        .foreach(chosen += _)
    }
    import s.implicits._
    val cents0 = chosen.toSeq
      .map(c => (c._1, c._2.toSeq, c._3, 0L))
      .toDF("cid", "ce", "cn2", "n_vectors")
      .localCheckpoint()
    runLloyd(e, cents0, iters, onRound)
  }
}
