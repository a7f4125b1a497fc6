package graft.ext

import graft.QueryDef
import org.apache.spark.sql.DataFrame
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
}
