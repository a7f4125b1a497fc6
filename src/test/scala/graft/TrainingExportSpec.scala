package graft

import graft.ext.TrainingExport
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The export sink must (a) partition by split with the q63 hash (so the
  * written tree agrees with the gated split operator), (b) report a
  * manifest that matches what is actually on disk, and (c) be idempotent
  * under re-run.
  */
class TrainingExportSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("export tree matches the q63 split; manifest matches disk; rerun idempotent") {
    val out = Files.createTempDirectory("graft_export").toString
    val docs = Tables.documents(spark, dir)
    val manifest = TrainingExport.writeShards(docs, out)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    // split totals agree with the gated q63 operator
    val q63 = SparkEntry.queries("q63_hash_split")(spark, dir)
      .groupBy($"split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(manifest.view.mapValues(_._1).toMap == q63)

    // the partition tree exists and read-back respects partition pruning
    val splits = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("split=")).map(_.getName).sorted
    assert(splits.toSeq == Seq("split=test", "split=train", "split=validation"))
    val train = spark.read.parquet(out).where($"split" === "train")
    assert(train.count() == manifest("train")._1)
    // token totals attested by the manifest match a recount from disk
    val diskTokens = spark.read.parquet(out).groupBy($"split")
      .agg(sum($"n_tokens")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(diskTokens == manifest.view.mapValues(_._2).toMap)

    // rerun overwrites in place to the identical manifest
    val manifest2 = TrainingExport.writeShards(docs, out)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(manifest2 == manifest)
  }
}
