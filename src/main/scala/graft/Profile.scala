package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler: times each named query (or each stage of one
  * query when given name=stages) against SPARK_GRAFT_SF_DIR. Dev tool only;
  * not part of the driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s  -> $r")
      r
    }

    if (args.contains("stages")) {
      import graft.ext.Dedup
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(spark, sfDir)
      val sh = Dedup.hashedShingleRows(docs, "doc_id", "text").localCheckpoint()
      time("shingleRows count")(sh.count())
      val sigs = Dedup.minhashSignatures(sh, "doc_id")
      time("minhashSignatures")(sigs.count())
      val bands = Dedup.bandRows(sigs, "doc_id")
      time("bandRows")(bands.count())
      val cands = Dedup.candidatePairs(bands, "doc_id").cache()
      time("candidatePairs")(cands.count())
      val jac = Dedup.jaccardFor(cands, sh, "doc_id")
        .where(col("jaccard") >= 0.5)
      time("jaccardFor")(jac.count())
      time("full q36 again")(SparkEntry.queries("q36_minhash_lsh")(spark, sfDir).count())
    } else if (args.contains("kmeans")) {
      // scale probe for the trained codebook beyond the gated k=8/iters=2:
      // k=64, 3 Lloyd rounds — evidences the "centroid side is k rows by
      // construction" claim with measured per-round times (PLANS.md)
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      val cb = time("kmeans k=64 iters=3")(
        graft.ext.KMeans.trainCodebook(emb, k = 64, iters = 3,
          onRound = (r, sec) => println(f"PROFILE   round $r%d: $sec%.3f s")))
      println(s"PROFILE   codebook rows: ${cb.count()}")
      val cbp = time("kmeans|| init k=64 iters=3")(
        graft.ext.KMeans.trainCodebookParallel(emb, k = 64, iters = 3,
          onRound = (r, sec) => println(f"PROFILE   round $r%d: $sec%.3f s")))
      println(s"PROFILE   codebook|| rows: ${cbp.count()}")
    } else if (args.contains("pq")) {
      // scale probe for joint product-quantization training beyond the
      // gated m=2/k=4: m=8 8-dim subspaces, k=16, 2 Lloyd rounds — the
      // PQ geometry a real ANN deployment uses (64 bits/vector). Evidences
      // the "one corpus read per round for ALL m codebooks" claim.
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      val cb = time("pq m=8 k=16 iters=2")(
        graft.ext.KMeans.trainProductCodebooks(emb, m = 8, subDim = 8,
          k = 16, iters = 2))
      println(s"PROFILE   pq codebook rows: ${cb.count()} (m*k = 128)")
    } else {
      args.foreach { name =>
        SparkEntry.queries.get(name).foreach { fn =>
          time(name)(fn(spark, sfDir).count())
        }
      }
    }
    spark.stop()
  }
}
