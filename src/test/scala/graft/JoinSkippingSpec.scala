package graft

import org.apache.spark.sql.functions._
import graft.operators.JoinSkipping
import graft.sources.SnapshotTable

/** Join-driven dynamic file skipping: the dim side's bounded key set
  * plans the fact read through per-key band + bloom pruning. Pinned
  * here: equivalence with the plain join (points, hull, and
  * underivable-fallback paths), bloom-indexed pruning on an UNclustered
  * fact (the case bands alone cannot serve), empty-dim short circuit,
  * string keys through the lossy-prefix mapping, and MOR deletes
  * surviving the pruned plan. */
class JoinSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_joinskip_$tag")
    f.toFile.delete()
    f.toString
  }

  test("points path prunes clustered fact files; join equals the unpruned join") {
    val t = new SnapshotTable(spark, freshRoot("points"), statsCols = Seq("k"))
    Seq(0L, 100L, 200L, 300L).foreach(b => t.commitAppend(
      (b until b + 100L).map(k => (k, k * 3)).toDF("k", "v").repartition(1)))
    val dim = Seq(5L, 17L, 350L).toDF("dk")
    val pruned = JoinSkipping.prunedFact(t, "k", dim, "dk")
    assert(pruned.inputFiles.length == 2,
      s"keys {5,17,350} live in 2 of 4 band files, planned ${pruned.inputFiles.length}")
    val got = pruned.join(dim, col("k") === col("dk")).select("k", "v")
      .as[(Long, Long)].collect().toSet
    val want = t.read().join(dim, col("k") === col("dk")).select("k", "v")
      .as[(Long, Long)].collect().toSet
    assert(got == want && want == Set((5L, 15L), (17L, 51L), (350L, 1050L)))
  }

  test("bloom-indexed UNclustered fact prunes where bands cannot") {
    val root = freshRoot("bloom")
    val t = new SnapshotTable(spark, root, statsCols = Seq("k"))
    t.setTableProperties(Map("write.bloom.cols" -> "k"))
    // both files span the full key range; keys are disjoint (even/odd)
    t.commitAppend((0L until 400L by 2).map(k => (k, k)).toDF("k", "v").repartition(1))
    t.commitAppend((1L until 400L by 2).map(k => (k, k)).toDF("k", "v").repartition(1))
    val dim = Seq(10L, 44L, 202L).toDF("dk") // all even
    val pruned = JoinSkipping.prunedFact(t, "k", dim, "dk")
    assert(pruned.inputFiles.length == 1,
      "even dim keys must prune the odd file via per-file blooms")
    assert(pruned.join(dim, col("k") === col("dk")).count() == 3L)
  }

  test("hull fallback past the key cap still prunes range-localized dims") {
    val t = new SnapshotTable(spark, freshRoot("hull"), statsCols = Seq("k"))
    Seq(0L, 100L, 200L).foreach(b => t.commitAppend(
      (b until b + 100L).map(k => (k, k)).toDF("k", "v").repartition(1)))
    val dim = (120L to 180L).toDF("dk") // 61 keys > cap of 8
    val pruned = JoinSkipping.prunedFact(t, "k", dim, "dk", maxKeys = 8)
    assert(pruned.inputFiles.length == 1,
      "hull [120,180] lands in the middle file only")
    assert(pruned.join(dim, col("k") === col("dk")).count() == 61L)
  }

  test("empty dim short-circuits to an empty fact scan") {
    val t = new SnapshotTable(spark, freshRoot("empty"), statsCols = Seq("k"))
    t.commitAppend((0L until 10L).map(k => (k, k)).toDF("k", "v"))
    val dim = Seq(1L).toDF("dk").filter(col("dk") > 100L)
    val pruned = JoinSkipping.prunedFact(t, "k", dim, "dk")
    assert(pruned.count() == 0L)
  }

  test("null dim keys are dropped before deriving anything") {
    val t = new SnapshotTable(spark, freshRoot("nulls"), statsCols = Seq("k"))
    Seq(0L, 100L).foreach(b => t.commitAppend(
      (b until b + 100L).map(k => (k, k)).toDF("k", "v").repartition(1)))
    val dim = Seq[java.lang.Long](5L, null, 7L).toDF("dk")
    val pruned = JoinSkipping.prunedFact(t, "k", dim, "dk")
    assert(pruned.inputFiles.length == 1)
    assert(pruned.join(dim, col("k") === col("dk")).count() == 2L)
  }

  test("string keys prune through the lossy prefix mapping, exactly") {
    val t = new SnapshotTable(spark, freshRoot("str"), statsCols = Seq("s"))
    t.commitAppend(Seq("apple", "avocado", "banana").map(x => (x, 1L))
      .toDF("s", "v").repartition(1))
    t.commitAppend(Seq("mango", "melon", "papaya").map(x => (x, 2L))
      .toDF("s", "v").repartition(1))
    val dim = Seq("mango", "papaya").toDF("ds")
    val pruned = JoinSkipping.prunedFact(t, "s", dim, "ds")
    assert(pruned.inputFiles.length == 1,
      "m/p prefixes land only in the second file's band")
    assert(pruned.join(dim, col("s") === col("ds")).count() == 2L)
  }

  test("underivable key types degrade to the plain read, never a wrong one") {
    val t = new SnapshotTable(spark, freshRoot("double"), statsCols = Seq("k"))
    t.commitAppend(Seq((1.5, 1L), (2.5, 2L)).toDF("k", "v"))
    val dim = Seq(2.5).toDF("dk")
    val pruned = JoinSkipping.prunedFact(t, "k", dim, "dk")
    assert(pruned.join(dim, col("k") === col("dk")).count() == 1L)
  }

  test("MOR deletes apply on the pruned plan") {
    val t = new SnapshotTable(spark, freshRoot("mor"), statsCols = Seq("k"))
    Seq(0L, 100L).foreach(b => t.commitAppend(
      (b until b + 100L).map(k => (k, k)).toDF("k", "v").repartition(1)))
    t.commitDeleteByKey(Seq(5L).toDF("k"), Seq("k"))
    val dim = Seq(5L, 6L).toDF("dk")
    val pruned = JoinSkipping.prunedFact(t, "k", dim, "dk")
    assert(pruned.join(dim, col("k") === col("dk"))
      .select("k").as[Long].collect().toSet == Set(6L))
  }
}
