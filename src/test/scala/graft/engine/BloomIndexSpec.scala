package graft.engine

import java.nio.file.Files
import graft.SparkSpec
import graft.functions.BloomIndexFunctions._
import org.apache.spark.sql.functions._

/** Per-file Bloom indexes (parquet-bloom/puffin-shaped point-lookup
  * skipping): equality probes prune to few files on a key-clustered
  * layout, pruning never changes results, stale manifests stay safe,
  * and the aggregate has no false negatives under map-side merge. */
class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot = Files.createTempDirectory("wh-bloom").toString

  private def clustered(wh: Warehouse): Unit = {
    val df = (1 to 8000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    wh.overwrite(df.repartitionByRange(8, col("k")), "t")
  }

  test("point probe prunes to few files and matches the full scan") {
    val wh = new Warehouse(spark, freshRoot)
    clustered(wh)
    wh.buildBloomIndex("t", "k", expectedItemsPerFile = 2000)
    val Some((kept, unknown)) = wh.bloomPrunedFiles("t", "k", Seq(4242L))
    assert(unknown.isEmpty)
    assert(kept.size <= 2, s"kept ${kept.size} of 8 files")
    val got = wh.readBloomPruned("t", "k", Seq(4242L)).collect().toSeq
    val want = wh.read("t").filter(col("k") === 4242L).collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("multi-value probe scans the union of surviving files, exact results") {
    val wh = new Warehouse(spark, freshRoot)
    clustered(wh)
    wh.buildBloomIndex("t", "k", expectedItemsPerFile = 2000)
    val keys = Seq(10L, 4000L, 7999L)
    val got = wh.readBloomPruned("t", "k", keys)
      .orderBy("k").collect().toSeq
    val want = wh.read("t").filter(col("k").isin(keys: _*))
      .orderBy("k").collect().toSeq
    assert(got == want && got.size == 3)
  }

  test("absent key: every file may prune away, result is empty not wrong") {
    val wh = new Warehouse(spark, freshRoot)
    clustered(wh)
    wh.buildBloomIndex("t", "k", expectedItemsPerFile = 2000)
    assert(wh.readBloomPruned("t", "k", Seq(999999L)).count() == 0L)
  }

  test("files appended after the build are always scanned (stale-safe)") {
    val wh = new Warehouse(spark, freshRoot)
    clustered(wh)
    wh.buildBloomIndex("t", "k", expectedItemsPerFile = 2000)
    wh.append(Seq((999999L, "late")).toDF("k", "v"), "t")
    val Some((_, unknown)) = wh.bloomPrunedFiles("t", "k", Seq(999999L))
    assert(unknown.nonEmpty)
    val got = wh.readBloomPruned("t", "k", Seq(999999L)).collect().toSeq
    assert(got.map(_.getString(1)) == Seq("late"))
  }

  test("no index on the column: plain filtered read fallback") {
    val wh = new Warehouse(spark, freshRoot)
    clustered(wh)
    assert(wh.bloomPrunedFiles("t", "v", Seq("v7")).isEmpty)
    assert(wh.readBloomPruned("t", "v", Seq("v7")).count() == 1L)
  }

  test("probe literals reconcile with the indexed column's type: " +
      "castable cross-type probes match, uncastable ones fail loudly") {
    val wh = new Warehouse(spark, freshRoot)
    clustered(wh) // k is LONG
    wh.buildBloomIndex("t", "k", expectedItemsPerFile = 2000)
    val want = wh.read("t").filter(col("k") === 4242L).collect().toSeq
    // a STRING probe of the long column hashes in the long domain after
    // the cast — same files, same rows as the native-typed probe
    assert(wh.readBloomPruned("t", "k", Seq("4242")).collect().toSeq == want)
    // an INT probe likewise
    assert(wh.readBloomPruned("t", "k", Seq(4242)).collect().toSeq == want)
    // an unrepresentable probe raises instead of silently pruning all
    val e = intercept[IllegalArgumentException] {
      wh.readBloomPruned("t", "k", Seq("not-a-number"))
    }
    assert(e.getMessage.contains("not representable"))
    // string-typed column probed with an int: cast to string, found
    val sw = new Warehouse(spark, freshRoot)
    sw.overwrite((1 to 4000).map(i => (i.toLong, i.toString))
      .toDF("k", "s").repartitionByRange(8, col("k")), "ts")
    sw.buildBloomIndex("ts", "s", expectedItemsPerFile = 1000)
    assert(sw.readBloomPruned("ts", "s", Seq(777)).count() == 1L)
    assert(sw.readBloomPruned("ts", "s", Seq("777")).count() == 1L)
  }

  test("aggregate: no false negatives, merge-built == membership-complete, string keys") {
    val df = (1 to 5000).map(i => (i % 7, s"key$i")).toDF("g", "k")
      .repartition(13) // force map-side partial merges
    val filters = df.groupBy("g")
      .agg(bloomAgg(col("k"), 5000, 0.01).as("bloom"))
    val joined = df.join(filters, "g")
      .select(bloomProbe(col("bloom"), col("k")).as("hit"))
    assert(joined.filter(!col("hit")).count() == 0L) // Bloom guarantee
  }
}
