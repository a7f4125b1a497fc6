package graft

import org.apache.spark.sql.functions._

/** Round-15 scale-fixture generator: purity/determinism, driver-fixture
  * schema parity through the Tables readers, the planted dedup structure,
  * and exact row-count linearity in sf (the property the sf0.01→sf0.1→sf1
  * scaling curve rests on).
  */
class DataGenSpec extends SparkSpec {

  test("every row is a pure function of (table, row, field): two " +
      "generations collect identical rows") {
    val a = DataGen.lineitem(spark, 0.001).collect().map(_.toString).sorted
    val b = DataGen.lineitem(spark, 0.001).collect().map(_.toString).sorted
    assert(a.length == 6000 && a.sameElements(b))
    val d1 = DataGen.documents(spark, 0.001).collect().map(_.toString).sorted
    val d2 = DataGen.documents(spark, 0.001).collect().map(_.toString).sorted
    assert(d1.length == 50 && d1.sameElements(d2))
    // slicing must not change content: same table at different
    // parallelism is the same multiset (purity in the partition index)
    assert(DataGen.docText(7, 1000) == DataGen.docText(7, 1000))
  }

  test("row counts scale exactly linearly in sf") {
    assert(DataGen.nLineitem(1.0) == 100 * DataGen.nLineitem(0.01))
    assert(DataGen.nOrders(1.0) == 1500000L &&
      DataGen.nCustomer(1.0) == 150000L && DataGen.nPart(1.0) == 200000L &&
      DataGen.nSupplier(1.0) == 10000L && DataGen.nEvents(1.0) == 1000000L &&
      DataGen.nDocuments(1.0) == 50000L && DataGen.nEmbeddings(1.0) == 20000L)
  }

  test("schema parity with the driver fixture through the Tables readers " +
      "(names, types, order — events after lineage normalization)") {
    val dir = java.nio.file.Files
      .createTempDirectory("datagen_spec").toString
    try {
      DataGen.write(spark, 0.001, dir)
      val drv = "/root/testdata/sf0.001"
      Tables.all.foreach { t =>
        val gen = Tables.load(spark, dir, t)
        val ref = Tables.load(spark, drv, t)
        val (gs, rs) =
          if (t == "events")
            (Tables.events(spark, dir).schema, Tables.events(spark, drv).schema)
          else (gen.schema, ref.schema)
        assert(gs.map(f => (f.name, f.dataType)) ==
          rs.map(f => (f.name, f.dataType)),
          s"$t: gen=${gs.treeString} ref=${rs.treeString}")
      }
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }

  test("planted dedup structure: ~5% near-dups carrying one 'dup' token " +
      "whose removal recovers another doc's text verbatim") {
    import spark.implicits._
    val docs = DataGen.documents(spark, 0.01).cache()
    val n = docs.count()
    assert(n == 500)
    val withDup = docs
      .where(array_contains(split($"text", " "), "dup")).as[(Long, String, String, String, Long)]
      .collect()
    // binomial(500, 0.0484): mean ~24, assert a generous band
    assert(withDup.length >= 10 && withDup.length <= 45, withDup.length)
    val texts = docs.select($"text").as[String].collect().toSet
    val recovered = withDup.count { case (_, text, _, _, _) =>
      texts.contains(
        text.split(" ").filterNot(_ == "dup").mkString(" "))
    }
    // every near-dup's base is in-corpus by construction (a base that was
    // itself rewritten as a dup/exact row is the only miss path)
    assert(recovered >= withDup.length - 5, s"$recovered/${withDup.length}")
    docs.unpersist()
  }

  test("value distributions land in the driver fixture's ranges") {
    import spark.implicits._
    val li = DataGen.lineitem(spark, 0.001)
    val r = li.agg(
      min($"l_quantity"), max($"l_quantity"),
      min($"l_discount"), max($"l_discount"),
      min($"l_tax"), max($"l_tax"),
      countDistinct($"l_returnflag"), countDistinct($"l_linestatus"))
      .head
    assert(r.getDouble(0) >= 1.0 && r.getDouble(1) <= 50.0)
    assert(r.getDouble(2) >= 0.0 && r.getDouble(3) <= 0.10 + 1e-12)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(5) <= 0.08 + 1e-12)
    assert(r.getLong(6) == 3 && r.getLong(7) == 2)
    val emb = DataGen.embeddings(spark, 0.001)
      .select(aggregate(transform($"embedding", x => x * x),
        lit(0.0d), (a, x) => a + x).as("n2"))
      .agg(min($"n2"), max($"n2")).head
    assert(math.abs(emb.getDouble(0) - 1.0) < 1e-5 &&
      math.abs(emb.getDouble(1) - 1.0) < 1e-5)
  }
}
