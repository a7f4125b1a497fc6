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
    } else if (args.contains("capfp")) {
      // per-batch cost-shape probe for the capped-index fp maintainer
      // (round 16): FIXED-size waves over a growing accumulated corpus,
      // uncapped vs capped side by side. The uncapped maintainer re-reads
      // and re-aggregates the full band population every wave, so its
      // per-wave time grows with the accumulated index; the capped
      // variant consults the bounded member state and falls through only
      // for saturated buckets, so its per-wave time flattens. Fingerprint
      // fixture: groups of 4 near-identical 24-bit fps (the q308 family's
      // group structure) scattered pseudo-randomly across buckets.
      // Knobs: SPARK_GRAFT_CAPFP_WAVES (default 10) x
      // SPARK_GRAFT_CAPFP_WAVE_DOCS (default 5000).
      import org.apache.spark.sql.functions._
      val waves = sys.env.getOrElse("SPARK_GRAFT_CAPFP_WAVES", "10").toInt
      val perWave =
        sys.env.getOrElse("SPARK_GRAFT_CAPFP_WAVE_DOCS", "5000").toInt
      val root = TempDirs.create(spark, "profile_capfp")
      def fpsOf(w: Int) = spark.range(
          w.toLong * perWave, (w + 1).toLong * perWave)
        .select(col("id").as("doc_id"),
          (((col("id") / 4) * 2654435761L) % (1L << 23) * 2
            + (col("id") % 4) % 2).as("fp"))
      Seq(
        ("uncapped", (d: org.apache.spark.sql.DataFrame, st: String,
            cp: String) => graft.streaming.EventStream.fpDedupMaintain(
          spark, d, st, radius = 4, fpBits = 24, tierK = 8,
          checkpoint = Some(cp))),
        ("capped", (d: org.apache.spark.sql.DataFrame, st: String,
            cp: String) =>
          graft.streaming.EventStream.fpDedupMaintainCapped(
            spark, d, st, radius = 4, fpBits = 24, capC = 64, tierK = 8,
            checkpoint = Some(cp))),
        ("capnofall", (d: org.apache.spark.sql.DataFrame, st: String,
            cp: String) =>
          graft.streaming.EventStream.fpDedupMaintainCapped(
            spark, d, st, radius = 4, fpBits = 24, capC = 64, tierK = 8,
            checkpoint = Some(cp), fallThrough = false))
      ).foreach { case (tag, run) =>
        val ddir = s"$root/$tag/fps"
        val st = s"$root/$tag/state"
        val cp = s"$root/$tag/cp"
        (0 until waves).foreach { w =>
          fpsOf(w).coalesce(1).write.mode("append").parquet(ddir)
          val t0 = System.nanoTime()
          val fin = run(spark.readStream
            .schema(spark.read.parquet(ddir).schema)
            .option("maxFilesPerTrigger", "1").parquet(ddir), st, cp)
          val dt = (System.nanoTime() - t0) / 1e9
          val n = fin.count()
          println(f"PROFILE capfp $tag%-9s wave $w%2d " +
            f"(corpus ${(w + 1) * perWave}%7d): $dt%7.3f s " +
            f"(verdicts $n%d)")
        }
      }
    } else if (args.contains("rings")) {
      // r16 optimization probe: q284 stage decomposition — where does the
      // affinity-rings line spend its time (substrate, cap, pair join,
      // top-100, CC loop, final rollup)?
      import org.apache.spark.sql.functions._
      val buyers = time("buyers substrate")(
        graft.queries.AnalyticsQueries.orderPartCached(spark, sfDir)
          .join(Tables.orders(spark, sfDir)
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_partkey"), col("o_custkey")).distinct()
          .localCheckpoint(true,
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
      val bounded = time("bounded cap")(
        buyers.join(
          buyers.groupBy(col("l_partkey")).agg(count(lit(1)).as("nb"))
            .where(col("nb") <= 64).select(col("l_partkey")),
          "l_partkey")
          .localCheckpoint(true,
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
      val links = time("links join+agg+top100")(
        bounded.as("a").join(bounded.as("b"),
            col("a.l_partkey") === col("b.l_partkey") &&
              col("a.o_custkey") < col("b.o_custkey"))
          .groupBy(col("a.o_custkey").as("ua"), col("b.o_custkey").as("ub"))
          .agg(count(lit(1)).as("n_parts"))
          .orderBy(col("n_parts").desc, col("ua").asc, col("ub").asc)
          .limit(100)
          .localCheckpoint())
      val cc = time("cc loop")(graft.ext.Dedup.connectedComponents(
        links.select(col("ua"), col("ub")), "ua", "ub").localCheckpoint())
      time("final rollup")(
        cc.groupBy(col("cluster_id").as("ring_id"))
          .agg(count(lit(1)).as("n_users"))
          .join(cc.select(col("id").as("ua"),
            col("cluster_id").as("ring_id")), Seq("ring_id"))
          .join(links, Seq("ua"))
          .groupBy(col("ring_id"))
          .agg(max(col("n_users")).as("n_users"),
            count(lit(1)).as("n_links"),
            sum(col("n_parts")).as("n_part_links")).count())
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
