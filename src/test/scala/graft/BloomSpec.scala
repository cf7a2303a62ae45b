package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.TableOps

/** Bloom-filter point lookups on managed tables (the secondary-index role
  * for keys range stats cannot separate — reference bwtree_index.h): the
  * table opts key columns in via `bloom.cols`, writes embed parquet blooms
  * inline, and equality lookups/mutations/merges prune candidate files by
  * probing the blooms driver-side. The test layout is adversarial for
  * min/max pruning: keys are dealt round-robin across files, so every
  * file spans the full key range and ONLY the bloom can prune. */
class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 6 insert batches, keys interleaved (batch i gets keys ≡ i mod 6):
    * every file's [min,max] covers nearly the whole key space. */
  private def interleavedTable(root: String): TableOps = {
    val ops = new TableOps(spark, root)
    ops.create("t",
      Seq.empty[(Long, String)].toDF("k", "v").coalesce(1),
      Map("bloom.cols" -> "k"))
    (0 until 6).foreach { b =>
      ops.insert("t",
        (0 until 40).map(i => ((i * 6 + b).toLong, s"row-${i * 6 + b}"))
          .toDF("k", "v").coalesce(1))
    }
    ops
  }

  test("point lookup on an unclustered key: blooms prune what min/max cannot") {
    val ops = interleavedTable(TestSpark.tmpDir("graft-bloom"))
    // every batch file spans ~[b, 234+b] — range stats keep all 6 as
    // candidates; the bloom knows key 13 lives only in batch 13%6=1
    val hit = ops.scanWhere("t", col("k") === 13L)
    assert(hit.select("v").as[String].collect().toSeq == Seq("row-13"))
    assert(ops.lastBloomPruned >= 4,
      s"bloom pruned only ${ops.lastBloomPruned} of 6 interleaved files")
    // ≤2: the one batch file holding key 13, plus the empty create file
    // (zero row groups — nothing to probe, conservatively kept)
    assert(ops.lastPlanCandidates <= 2,
      s"candidates=${ops.lastPlanCandidates} — bloom did not narrow the scan")
    assert(hit.inputFiles.length <= 2, s"opened ${hit.inputFiles.length} files")
  }

  test("bloom pruning never loses rows: every key is found") {
    val ops = interleavedTable(TestSpark.tmpDir("graft-bloom2"))
    (0 until 240).foreach { k =>
      val got = ops.scanWhere("t", col("k") === k.toLong)
        .select("v").as[String].collect().toSeq
      assert(got == Seq(s"row-$k"), s"key $k -> $got")
    }
  }

  test("UPDATE through blooms rewrites only the file holding the key") {
    val ops = interleavedTable(TestSpark.tmpDir("graft-bloom3"))
    val before = ops.read("t").inputFiles.map(_.split('/').last).toSet
    ops.update("t", col("k") === 77L, "v", lit("updated"))
    val after = ops.read("t").inputFiles.map(_.split('/').last).toSet
    assert(ops.lastBloomPruned >= 4, s"bloomPruned=${ops.lastBloomPruned}")
    // only one data file replaced: carried = before minus 1, plus 1 new
    assert((before -- after).size == 1, s"rewrote ${(before -- after).size} files")
    assert(ops.read("t").filter(col("k") === 77L)
      .select("v").as[String].head() == "updated")
    assert(ops.read("t").count() == 240)
  }

  test("MERGE with a small source probes blooms per source key") {
    val ops = interleavedTable(TestSpark.tmpDir("graft-bloom4"))
    // two keys from the same batch file (5 and 11 are both ≡ 5 mod 6)
    ops.merge("t", Seq((5L, "m5"), (11L, "m11"), (999L, "new"))
      .toDF("k", "v"), "k", Seq("v"))
    assert(ops.lastBloomPruned >= 4, s"bloomPruned=${ops.lastBloomPruned}")
    val m = ops.read("t").filter(col("k").isin(5L, 11L, 999L))
      .orderBy("k").select("v").as[String].collect().toSeq
    assert(m == Seq("m5", "m11", "new"))
    assert(ops.read("t").count() == 241)
  }

  test("IN-list and OR-of-equalities prune to the union of the keys' files") {
    val ops = interleavedTable(TestSpark.tmpDir("graft-bloom6"))
    // keys 14 and 20 are both ≡ 2 mod 6 — one batch file holds both
    val in = ops.scanWhere("t", col("k").isin(14L, 20L))
    assert(in.select("v").as[String].collect().sorted.toSeq ==
      Seq("row-14", "row-20"))
    assert(ops.lastBloomPruned >= 4, s"IN: bloomPruned=${ops.lastBloomPruned}")
    // keys 3 and 10 live in different batch files (3%6=3, 10%6=4)
    val or = ops.scanWhere("t", col("k") === 3L || col("k") === 10L)
    assert(or.select("v").as[String].collect().sorted.toSeq ==
      Seq("row-10", "row-3"))
    assert(ops.lastBloomPruned >= 3, s"OR: bloomPruned=${ops.lastBloomPruned}")
    // an OR with a non-equality branch must NOT prune (k<1 can't be refuted)
    val mixed = ops.scanWhere("t", col("k") === 3L || col("k") < 1L)
    assert(mixed.select("v").as[String].collect().sorted.toSeq ==
      Seq("row-0", "row-3"))
    assert(ops.lastBloomPruned == 0,
      s"mixed OR must stay conservative, pruned=${ops.lastBloomPruned}")
  }

  test("tables without bloom.cols are untouched (no probes, full candidates)") {
    val ops = new TableOps(spark, TestSpark.tmpDir("graft-bloom5"))
    ops.create("t", (0 until 20).map(i => (i.toLong, s"r$i")).toDF("k", "v")
      .repartition(4))
    val r = ops.scanWhere("t", col("k") === 7L)
    assert(r.select("v").as[String].collect().toSeq == Seq("r7"))
    assert(ops.lastBloomPruned == 0)
  }
}
