package graft.pipeline

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Golden end-to-end medallion test on reference-shaped fixtures
  * (FIXTURES.md §B): CSV/JSON landing → Bronze (audit cols, ledger,
  * idempotent skip) → Silver transforms → Gold reports, including
  * re-upload dedup (W1/W2) and idempotent re-runs.
  */
class PipelineSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def write(dir: String, name: String, content: String): String = {
    Files.createDirectories(Paths.get(dir))
    val p = Paths.get(dir, name)
    Files.writeString(p, content)
    p.toString
  }

  private lazy val root = Files.createTempDirectory("graft_wh").toString
  private lazy val landing = Files.createTempDirectory("graft_land").toString
  private lazy val catalog = new Catalog(spark, root)
  private lazy val ingestion = new Ingestion(catalog)
  private lazy val silver = new SilverTransforms(catalog)

  private lazy val config = Seq(
    Schemas.FileDetail(1, "c", "s", landing, "transactions*.csv", "bronze",
      "transactions", "CSV"),
    Schemas.FileDetail(2, "c", "s", landing, "manual_logs*.csv", "bronze",
      "manual_logs", "CSV"),
    Schemas.FileDetail(3, "c", "s", landing, "flight_logs*.csv", "bronze",
      "flight_logs", "CSV"),
    Schemas.FileDetail(4, "c", "s", landing, "sleep*.csv", "bronze",
      "fitbit_sleep_score", "CSV"),
    Schemas.FileDetail(5, "c", "s", landing, "hr*.csv", "bronze",
      "fitbit_heart_rate", "CSV"),
    Schemas.FileDetail(6, "c", "s", landing, "steps*.csv", "bronze",
      "fitbit_steps", "CSV"),
    Schemas.FileDetail(7, "c", "s", landing, "timeline*.json", "bronze",
      "google_timeline", "JSON"))

  private def seedFixtures(): Unit = {
    write(landing, "transactions_1.csv",
      """country,date,name,type,amount,comments
        |Japan,2026-02-19,Hotel Tokyo,Hotel,"$1,200.50",Shinjuku hotel
        |Japan,2026-02-19,Ramen,Food,12.00,Dinner
        |Japan,2026-02-20,JR Pass,Travel,300.00,NULL
        |Japan,2026-02-20,Museum,,25.00,
        |Japan,not-a-date,Ghost,Misc,10.00,bad date row
        |""".stripMargin)
    write(landing, "manual_logs_1.csv",
      """day,date,flag,country,city,description,comments,food,travel,hotel
        |1,2026-02-19,1.0,Japan,Tokyo,Arrival day,Long flight,Ramen,Flight,Shinjuku
        |2,2026-02-20,0.0,Japan,Tokyo,Museum day,,Sushi,Train,Shinjuku
        |""".stripMargin)
    write(landing, "flight_logs_1.csv",
      ("date,flight_number,from,to,dep_time,arr_time,duration,airline,aircraft," +
        "registration,seat_number,seat_type,flight_class,flight_reason,note," +
        "dep_id,arr_id,airline_id,aircraft_id\n" +
        "2026-02-18,NH110,LHR,HND,09:00,17:30,11:30,ANA,B789,JA890A,32A," +
        "window,economy,leisure,,1,2,3,4\n" +
        "2026-02-18,NH006,HND,KIX,19:00,20:15,01:15,ANA,B738,JA301B,12C," +
        "aisle,economy,leisure,,2,5,3,6\n"))
    write(landing, "sleep_1.csv",
      """sleep_log_entry_id,timestamp,overall_score,composition_score,revitalization_score,duration_score,deep_sleep_in_minutes,resting_heart_rate,restlessness
        |100,2026-02-19 07:30:00,65,20.0,18,25.0,45,52,0.12
        |101,2026-02-20 08:00:00,90,28.0,27,30.0,80,48,0.05
        |""".stripMargin)
    write(landing, "hr_1.csv",
      """timestamp,beats_per_minute,data_source
        |2026-02-19 10:00:05,55.0,fitbit
        |2026-02-19 10:00:35,57.0,fitbit
        |2026-02-19 10:01:10,110.0,fitbit
        |2026-02-19 11:00:10,135.0,fitbit
        |""".stripMargin)
    write(landing, "steps_1.csv",
      """timestamp,steps,data_source
        |2026-02-19 10:05:00,500,fitbit
        |2026-02-19 10:40:00,250,fitbit
        |2026-02-19 12:00:00,1000,fitbit
        |""".stripMargin)
    write(landing, "timeline_1.json",
      """{ "semanticSegments": [
        |  { "startTime": "2026-02-19T09:00:00", "endTime": "2026-02-19T10:30:00",
        |    "visit": { "probability": 0.93,
        |      "topCandidate": { "placeId": "ChIJ123",
        |        "placeLocation": { "latLng": "35.6586° , 139.7454°" } } } },
        |  { "startTime": "2026-02-19T11:00:00", "endTime": "2026-02-19T11:45:00",
        |    "activity": { "distanceMeters": 1234.5,
        |      "topCandidate": { "type": "WALKING", "probability": 0.87 },
        |      "start": { "latLng": "35.65°, 139.74°" },
        |      "end":   { "latLng": "35.66°, 139.75°" } } },
        |  { "startTime": "2026-02-19T12:00:00", "endTime": "2026-02-19T12:10:00",
        |    "visit": { "probability": 0.5,
        |      "topCandidate": { "placeId": "ChIJ999",
        |        "placeLocation": "garbage location" } } },
        |  { "startTime": "2026-02-19T13:00:00", "endTime": "2026-02-19T13:05:00" }
        |] }
        |""".stripMargin)
  }

  test("e2e: ingest -> silver -> gold with dedup and idempotency") {
    import spark.implicits._
    seedFixtures()
    val r1 = ingestion.ingestAll(config)
    assert(r1("transactions").size == 1)
    val txRows = catalog.read("bronze", "transactions")
    assert(txRows.count() == 5)
    assert(txRows.columns.contains("_source_file"))

    // idempotent: second run loads nothing
    val r2 = ingestion.ingestAll(config)
    assert(r2.values.forall(_.isEmpty), s"unexpected reloads: $r2")
    assert(catalog.read("bronze", "transactions").count() == 5)

    // silver
    silver.runAll()
    val stx = catalog.read("silver", "transactions")
    assert(stx.where($"type" === "uncategorized").count() == 1)
    assert(stx.where($"name" === "Hotel Tokyo").select("amount")
      .as[Double].head() == 1200.50)
    assert(stx.where($"name" === "Ghost").select("date").head().isNullAt(0))
    // NULL_IF: the literal string "NULL" landed as SQL NULL
    assert(stx.where($"name" === "JR Pass").select("comments").head().isNullAt(0))

    val hrMin = catalog.read("silver", "heart_rate_minute")
    assert(hrMin.count() == 3) // 10:00 (2 readings), 10:01, 11:00
    assert(hrMin.where($"hr_zone" === "Resting").count() == 1) // mean 56
    assert(hrMin.where($"hr_zone" === "High").count() == 1) // 135

    val steps = catalog.read("silver", "steps_hourly")
    assert(steps.count() == 24) // scaffold: 1 date x 24 hours
    assert(steps.where($"hour" === 10).select("steps").as[Long].head() == 750)
    assert(steps.where($"hour" === 3).select("steps").as[Long].head() == 0)

    val segs = catalog.read("silver", "timeline_segments")
    assert(segs.count() == 3) // 4th segment (neither) dropped
    val visit = segs.where($"place_id" === "ChIJ123")
    assert(visit.select("visit_latitude").as[Double].head() == 35.6586)
    val badLoc = segs.where($"place_id" === "ChIJ999")
    assert(badLoc.select("visit_latitude").head().isNullAt(0))
    val walk = segs.where($"segment_type" === "ACTIVITY")
    assert(walk.select("activity_type").as[String].head() == "WALKING")
    assert(walk.select("start_latitude").as[Double].head() == 35.65)

    // gold: full travel cost
    val cost = Gold.fullTravelCost(
      catalog.read("silver", "transactions"),
      catalog.read("silver", "manual_logs"))
    val rows = cost.collect()
    assert(rows.length == 2)
    val d1 = rows(0)
    assert(d1.getAs[Double]("hotel") == 1200.50)
    assert(d1.getAs[Double]("food") == 12.0)
    assert(d1.getAs[Double]("total") == 1212.50)
    val d2 = rows(1)
    assert(d2.getAs[Double]("travel") == 300.0)
    // uncategorized spend is outside the 5 pivot categories, exactly like
    // the reference's TOTAL (sum of the 5 CASE columns only)
    assert(d2.getAs[Double]("misc") == 0.0)
    assert(d2.getAs[Double]("total") == 300.0)
    assert(d2.getAs[Double]("running_total") == 1212.50 + 300.0)
    assert(d2.getAs[Double]("daily_avg") == (1212.50 + 300.0) / 2)

    // gold: tax report — flight day 02-18 joined to wake-up 02-19 (score 65)
    val tax = Gold.travelTaxReport(
      catalog.read("silver", "flight_logs"),
      catalog.read("silver", "sleep_scores"),
      catalog.read("silver", "heart_rate_hourly"))
    val taxRows = tax.orderBy("report_date").collect()
    val travelDay = taxRows.find(_.getAs[Boolean]("is_travel_day")).get
    assert(travelDay.getAs[java.sql.Date]("report_date").toString == "2026-02-18")
    assert(math.abs(travelDay.getAs[Double]("total_flight_hours") - 12.75) < 1e-9)
    assert(travelDay.getAs[Long]("flight_count") == 2)
    assert(travelDay.getAs[String]("destination_city") == "HND, KIX")
    // 12.75h flight and next-day score 65 -> High Strain
    assert(travelDay.getAs[String]("recovery_status") == "High Strain")
    // wake 02-20 score 90 -> its travel day 02-19 row: Well Recovered
    val recovered = taxRows.find(r =>
      r.getAs[java.sql.Date]("report_date").toString == "2026-02-19").get
    assert(recovered.getAs[String]("recovery_status") == "Well Recovered")
    assert(recovered.getAs[String]("destination_city") == "No Travel")

    // gold: transport mode from timeline
    val modes = Gold.transportModeAnalysis(segs).collect()
    assert(modes.length == 1)
    assert(modes(0).getAs[String]("activity_type") == "WALKING")
    assert(math.abs(modes(0).getAs[Double]("total_distance_km") - 1.2345) < 1e-9)

    // gold: daily summary JSON
    val json = Gold.dailySummary("2026-02-19",
      catalog.read("silver", "daily_spend"),
      catalog.read("silver", "steps_hourly"),
      catalog.read("silver", "sleep_scores"),
      catalog.read("silver", "manual_logs"),
      catalog.read("silver", "flight_logs"),
      segs)
    assert(json.contains("\"TOTAL_SPENT\":1212.5"))
    assert(json.contains("\"TOTAL_STEPS\":1750"))
    assert(json.contains("ChIJ123") || json.contains("WALKING"))
    // A13 contract: pin the exact top-level key set the reference's
    // consumer reads (daily_travel_summary.py:32-87) so the blob shape
    // cannot drift silently (top-level keys are the only UPPERCASE ones)
    val keys = "\"([A-Z_]+)\":".r.findAllMatchIn(json).map(_.group(1)).toSet
    assert(keys == Set("DATE", "TOTAL_SPENT", "TOTAL_STEPS",
      "SPENDING_ITEMS", "SLEEP_DATA", "MANUAL_LOGS", "FLIGHTS",
      "TIMELINE_SEGMENTS"))
  }

  test("silver re-run is a no-op; Reprocess=true replays idempotently") {
    import spark.implicits._
    // all batches already SUCCESS -> nothing pending
    assert(silver.pendingLoadIds("transactions").isEmpty)
    val before = catalog.read("silver", "transactions").count()
    silver.runAll()
    assert(catalog.read("silver", "transactions").count() == before)
    // Reprocess=true replays every bronze batch; dynamic partition
    // overwrite keeps the table identical (delete+insert semantics)
    val replayIds = silver.pendingLoadIds("transactions", reprocess = true)
    assert(replayIds.nonEmpty)
    replayIds.foreach(silver.processTransactions)
    assert(catalog.read("silver", "transactions").count() == before)
  }

  test("schema reset drops and allows rebuild (S14)") {
    val scratch = new Catalog(spark, Files.createTempDirectory("graft_reset").toString)
    import spark.implicits._
    scratch.append(Seq((1L, "x")).toDF("id", "v"), "gold", "t1")
    assert(scratch.exists("gold", "t1"))
    scratch.dropSchema("gold")
    assert(!scratch.exists("gold", "t1"))
    // rebuild after reset works
    scratch.append(Seq((2L, "y")).toDF("id", "v"), "gold", "t1")
    assert(scratch.read("gold", "t1").count() == 1)
  }

  test("dashboard query surface over the warehouse (§3.2)") {
    import spark.implicits._
    val segs = catalog.read("silver", "timeline_segments")
    val tx = catalog.read("silver", "transactions")
    val (d1, d2) = ("2026-02-18", "2026-02-21")

    val v = Dashboard.visits(segs, d1, d2)
    assert(v.count() == 1) // ChIJ123 has coords; ChIJ999's are null-parsed
    assert(v.select("lat").as[Double].head() == 35.6586)

    val m = Dashboard.movements(segs, d1, d2)
    assert(m.count() == 1 &&
      m.select("activity_type").as[String].head() == "WALKING")

    assert(Dashboard.flights(
      catalog.read("silver", "flight_logs"), d1, d2).count() == 2)
    assert(Dashboard.sleep(
      catalog.read("silver", "sleep_scores"), d1, d2).count() == 2)
    assert(Dashboard.dailySteps(
      catalog.read("silver", "steps_hourly"), d1, d2)
      .agg(sum($"total_steps")).as[Long].head() == 1750)

    val spend = Dashboard.spendByType(tx, d1, d2)
    assert(spend.where($"type" === "Hotel")
      .select("total_amount").as[Double].head() == 1200.50)
    val top = Dashboard.topTransactions(tx, d1, d2, k = 2).collect()
    assert(top.length == 2 && top(0).getAs[String]("name") == "Hotel Tokyo")
    val modes = Dashboard.distanceByMode(segs, d1, d2).collect()
    assert(modes.length == 1 &&
      math.abs(modes(0).getAs[Double]("total_km") - 1.2345) < 1e-9)

    // `only` run-parameter restricts the DAG to one dataset
    val restricted = silver.runAll(reprocess = true, only = Some("manual_logs"))
    assert(restricted("manual_logs").nonEmpty)
    assert(restricted.view.filterKeys(_ != "manual_logs").values.forall(_.isEmpty))
  }

  test("CSV tolerance: short rows land with nulls (column-count mismatch)") {
    import spark.implicits._
    val land2 = Files.createTempDirectory("graft_land2").toString
    val cat2 = new Catalog(spark, Files.createTempDirectory("graft_wh2").toString)
    val ing2 = new Ingestion(cat2)
    write(land2, "transactions_x.csv",
      """country,date,name,type,amount,comments
        |Japan,2026-03-01,Full Row,Food,10.00,ok
        |Japan,2026-03-02,Short Row
        |""".stripMargin)
    ing2.ingest(Schemas.FileDetail(9, "c", "s", land2, "transactions*.csv",
      "bronze", "transactions", "CSV"))
    val rows = cat2.read("bronze", "transactions")
    assert(rows.count() == 2) // PERMISSIVE keeps the short row
    val short = rows.where($"name" === "Short Row").head()
    assert(short.isNullAt(short.fieldIndex("amount")))
  }

  test("bucketed tables join without a shuffle Exchange") {
    import spark.implicits._
    val left = (1L to 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "rv")
    catalog.writeBucketed(left, "bkt_left", "k", 4)
    catalog.writeBucketed(right, "bkt_right", "k", 4)
    // disable broadcast so the planner exercises the bucketed SMJ path the
    // way it would on two large fact tables
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = catalog.readTable("bkt_left")
        .join(catalog.readTable("bkt_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("batch-scoped reads prune load_id partitions at the scan") {
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"))
      .toDF("load_id", "v")
    catalog.appendBatched(df, "silver", "pp_probe")
    val scan = catalog.read("silver", "pp_probe").where($"load_id" === 2L)
    val plan = scan.queryExecution.executedPlan.toString
    // the batch predicate must prune PARTITION DIRECTORIES (S8's
    // batch-scoped read at 100 TB reads one load, not the table)
    assert(plan.contains("PartitionFilters: [isnotnull(load_id"),
      plan.take(1200))
    assert(scan.count() == 1)
  }

  test("re-upload: latest load wins in gold (W1/W2 dedup)") {
    import spark.implicits._
    // re-upload transactions with corrected amounts + updated manual log
    write(landing, "transactions_1.csv", // same file name => same _source_file
      """country,date,name,type,amount,comments
        |Japan,2026-02-19,Hotel Tokyo,Hotel,"$1,300.00",Corrected rate
        |Japan,2026-02-19,Ramen,Food,12.00,Dinner
        |Japan,2026-02-20,JR Pass,Travel,300.00,NULL
        |""".stripMargin)
    // force reload by clearing the ledger entry trick: new file name instead
    write(landing, "transactions_2.csv",
      """country,date,name,type,amount,comments
        |Japan,2026-02-19,Hotel Tokyo,Hotel,"$1,300.00",Corrected rate
        |""".stripMargin)
    write(landing, "manual_logs_2.csv",
      """day,date,flag,country,city,description,comments,food,travel,hotel
        |1,2026-02-19,1.0,Japan,Tokyo,Arrival day v2,Updated,Ramen,Flight,Shinjuku
        |""".stripMargin)
    ingestion.ingestAll(config)
    silver.runAll()

    val logs = catalog.read("silver", "manual_logs")
    // W2: one row per date, latest load wins
    val cost = Gold.fullTravelCost(
      catalog.read("silver", "transactions"), logs)
    val d1 = cost.collect()(0)
    assert(d1.getAs[String]("description") == "Arrival day v2")
    // transactions_2 is a NEW _source_file: its rows coexist with file 1's
    // (W1 filters per file, not per date)
    assert(d1.getAs[Double]("hotel") == 1200.50 + 1300.00)
  }

  test("compaction reduces file count and preserves content exactly") {
    import spark.implicits._
    val cat3 = new Catalog(spark, Files.createTempDirectory("graft_wh3").toString)
    // simulate many tiny append batches -> many small files
    (1L to 12L).foreach { lid =>
      cat3.appendBatched(
        (1 to 50).map(i => (lid * 100 + i, s"v$i", lid)).toDF("id", "v", "load_id"),
        "silver", "compact_me")
    }
    val before = cat3.read("silver", "compact_me").orderBy("id").collect()
    val nBefore = java.nio.file.Files.walk(
        java.nio.file.Paths.get(cat3.path("silver", "compact_me")))
      .filter(java.nio.file.Files.isRegularFile(_))
      .filter(_.getFileName.toString.endsWith(".parquet")).count()
    val nAfter = cat3.compact("silver", "compact_me")
    assert(nAfter < nBefore, s"$nAfter vs $nBefore")
    val after = cat3.read("silver", "compact_me").orderBy("id").collect()
    assert(after.toSeq == before.toSeq)
  }

  test("compaction survives map-typed columns (salt skips unhashable types)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, map, lit}
    val cat5 = new Catalog(spark, Files.createTempDirectory("graft_wh5").toString)
    (1L to 4L).foreach { lid =>
      cat5.appendBatched(
        (1 to 30).map(i => (lid * 100 + i, lid)).toDF("id", "load_id")
          .withColumn("attrs", map(lit("k"), col("id").cast("string"))),
        "silver", "compact_map")
    }
    val before = cat5.read("silver", "compact_map")
      .select("id", "load_id").orderBy("id").collect()
    // would throw inside xxhash64 if the salt hashed the map column
    cat5.compact("silver", "compact_map")
    val after = cat5.read("silver", "compact_map")
      .select("id", "load_id").orderBy("id").collect()
    assert(after.toSeq == before.toSeq)
  }

  test("compaction of a partitioned table larger than one target file " +
      "still reduces files and respects the load_id layout") {
    import spark.implicits._
    val cat4 = new Catalog(spark, Files.createTempDirectory("graft_wh4").toString)
    (1L to 6L).foreach { lid =>
      cat4.appendBatched(
        (1 to 400).map(i => (lid * 1000 + i, s"value_$i" * 8, lid))
          .toDF("id", "v", "load_id"),
        "silver", "compact_big")
    }
    val p = Paths.get(cat4.path("silver", "compact_big"))
    def parquetFiles() = java.nio.file.Files.walk(p)
      .filter(java.nio.file.Files.isRegularFile(_))
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map[String](_.toString).toArray.toSeq.map(_.toString)
    val before = cat4.read("silver", "compact_big").orderBy("id").collect()
    val nBefore = parquetFiles().size
    // tiny target => nFiles > 1, the case where a round-robin repartition
    // would EXPLODE the file count (nFiles x #partitions)
    val bytes = java.nio.file.Files.walk(p)
      .filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum()
    val target = bytes / 4
    val nAfter = cat4.compact("silver", "compact_big", targetBytes = target)
    assert(nAfter < nBefore, s"$nAfter vs $nBefore")
    // every output file must live inside exactly one load_id directory,
    // with at most ceil(perLoad/target)=1 file per partition here
    val byDir = parquetFiles().groupBy(f => f.split("/").init.last)
    assert(byDir.keySet.forall(_.startsWith("load_id=")), byDir.keySet.toString)
    byDir.foreach { case (dir, fs) =>
      assert(fs.size <= 2, s"$dir has ${fs.size} files after compaction")
    }
    val after = cat4.read("silver", "compact_big").orderBy("id").collect()
    assert(after.toSeq == before.toSeq)
  }

  test("orphaned RUNNING claims from a crashed run are reconciled to " +
      "ABANDONED at the next ingest; the files retry under fresh " +
      "load_ids and no ghost in-flight rows survive") {
    import spark.implicits._
    val land = Files.createTempDirectory("graft_orph_land").toString
    val cat = new Catalog(spark,
      Files.createTempDirectory("graft_orph_wh").toString)
    val ing = new Ingestion(cat)
    write(land, "transactions_a.csv",
      """country,date,name,type,amount,comments
        |Japan,2026-03-01,Row A,Food,10.00,ok
        |""".stripMargin)
    // simulate the crash the batched up-front claim makes possible: a
    // previous run claimed load_ids 1-2 (RUNNING for both files) and died
    // before attempting either — no terminal rows exist
    val t0 = new java.sql.Timestamp(0L)
    cat.append(Seq(
      Schemas.IngestionLog(1L, s"file:$land/transactions_a.csv",
        "transactions", "RUNNING", 0L, "", t0),
      Schemas.IngestionLog(2L, s"file:$land/transactions_never.csv",
        "transactions", "RUNNING", 0L, "", t0)).toDF(),
      "admin", "ingestion_logs")
    val res = ing.ingest(Schemas.FileDetail(9, "c", "s", land,
      "transactions*.csv", "bronze", "transactions", "CSV"))
    // the surviving file loaded under a FRESH id (3, past the claimed
    // range), not the orphaned claim's id
    assert(res.map(_._2) == Seq(3L), res.toString)
    val ledger = cat.read("admin", "ingestion_logs")
    // both orphans got terminal ABANDONED rows with their claimed ids
    val abandoned = ledger.where($"status" === "ABANDONED")
      .select($"load_id").as[Long].collect().sorted.toSeq
    assert(abandoned == Seq(1L, 2L), abandoned.toString)
    // the ledger-consumer invariant the advice asked for: zero RUNNING
    // rows without a terminal (SUCCESS/FAILURE/ABANDONED) sibling
    def inflight() = ledger.where($"status" === "RUNNING")
      .join(ledger.where(
        $"status".isin("SUCCESS", "FAILURE", "ABANDONED"))
        .select($"load_id"), Seq("load_id"), "left_anti").count()
    assert(inflight() == 0L)
    // idempotent: a second reconcile finds nothing
    assert(ing.reconcileOrphans().isEmpty)
    // and a second ingest neither re-loads nor re-abandons anything
    assert(ing.ingest(Schemas.FileDetail(9, "c", "s", land,
      "transactions*.csv", "bronze", "transactions", "CSV")).isEmpty)
    assert(cat.read("admin", "ingestion_logs")
      .where($"status" === "ABANDONED").count() == 2L)
  }
}
