package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.llm.TextStats

class FfdPackingSpec extends SparkSpec {
  import spark.implicits._

  /** single-threaded reference FFD over one group */
  private def refFfd(items: Seq[(Long, Int, Long)], budget: Long): Map[(Long, Int), Long] = {
    val sorted = items.sortBy(t => (-t._3, t._1, t._2))
    val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
    sorted.map { case (doc, idx, n) =>
      var i = 0
      while (i < loads.length && loads(i) + n > budget) i += 1
      if (i == loads.length) loads += n else loads(i) += n
      (doc, idx) -> (i + 1).toLong
    }.toMap
  }

  private def chunkDf(rows: Seq[(String, Long, Int, Long)], parts: Int) =
    rows.toDF("source", "doc_id", "chunk_idx", "n_tokens").repartition(parts)

  test("matches reference FFD per group on seeded random instances") {
    val params = Gen.Parameters.default
    val rows = Gen.listOfN(300, for {
      src <- Gen.oneOf("s0", "s1", "s2")
      doc <- Gen.choose(0L, 80L)
      idx <- Gen.choose(0, 5)
      n <- Gen.choose(1L, 40L)
    } yield (src, doc, idx, n)).apply(params, Seed(42)).get
      .distinctBy(r => (r._1, r._2, r._3)) // chunk key must be unique
    val got = TextStats.packChunksFfd(chunkDf(rows, 7), budget = 64)
      .select("source", "doc_id", "chunk_idx", "bin_idx")
      .as[(String, Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3) -> r._4).toMap).toMap
    val want = rows.groupBy(_._1).view
      .mapValues(g => refFfd(g.map(r => (r._2, r._3, r._4)), 64)).toMap
    assert(got == want)
  }

  test("deterministic across partition counts; no bin over budget unless a single oversized item") {
    val rows = (0L until 50L).flatMap(d => (0 until 3).map(i =>
      ("src" + (d % 4), d, i, 1L + (d * 7 + i * 13) % 90)))
    val a = TextStats.packChunksFfd(chunkDf(rows, 1), 128).orderBy("source", "doc_id", "chunk_idx").collect().toSeq
    val b = TextStats.packChunksFfd(chunkDf(rows, 13), 128).orderBy("source", "doc_id", "chunk_idx").collect().toSeq
    assert(a == b)
    val binLoads = TextStats.packChunksFfd(chunkDf(rows, 5), 128)
      .groupBy("source", "bin_idx")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("load"),
        org.apache.spark.sql.functions.count("*").as("n"))
      .as[(String, Long, Long, Long)].collect()
    binLoads.foreach { case (src, bin, load, n) =>
      assert(load <= 128 || n == 1, s"overfull shared bin $src/$bin load=$load n=$n")
    }
  }

  test("first-fit invariant: at most one bin per group is at most half full") {
    // classic FF property — a second ≤half-full bin could never have been
    // opened, since its items would have first-fit into the first one
    val docs = Seq.tabulate(40)(d =>
      (d.toLong, Seq.fill(8 + d % 17)("w").mkString(" "), "en", "s" + (d % 3), 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val chunks = TextStats.chunkDocuments(docs, size = 8, overlap = 2)
      .join(docs.select($"doc_id", $"source"), Seq("doc_id"))
    val halfOrLess = TextStats.packChunksFfd(chunks, budget = 24)
      .groupBy("source", "bin_idx")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("load"))
      .filter($"load" <= 12)
      .groupBy("source").count()
      .as[(String, Long)].collect()
    halfOrLess.foreach { case (src, n) =>
      assert(n <= 1, s"$src has $n bins at most half full") }
  }
}
