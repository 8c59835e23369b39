package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sync.DimSync

/** FIXTURES.md §7 fixture: a value new to the dim (insert path), a dim value
  * absent from source (delete path), combination rows whose names miss a dim
  * (inner-merge drop), blue-green promote with rollback. */
class DimSyncSpec extends SparkSpec {
  import spark.implicits._

  test("insertMissing / deleteStale are the two anti-join directions (J6/J7)") {
    val source = Seq("tv", "radio", "print", null).toDF("channel")
    val dim = Seq((1, "tv"), (2, "online")).toDF("id", "name")
    val ins = DimSync.insertMissing(source, "channel", dim).as[String].collect().toSet
    assert(ins == Set("radio", "print")) // null filtered, 'tv' exists
    val del = DimSync.deleteStale(dim, source, "channel").collect()
    assert(del.map(_.getAs[String]("name")).toSet == Set("online"))
  }

  test("resolveCombinations inner-merges names to ids, drops unmatched (A2/J5/A4)") {
    val main = Seq(
      ("2024-01-01", "tv", "pub1"), ("2024-01-01", "tv", "pub1"), // dup combo
      ("2024-01-02", "radio", "pub2"),                            // 'radio' not in dim
      ("2024-01-03", "tv", "pub2")
    ).toDF("date", "channel", "publisher")
    val out = DimSync.resolveCombinations(main, Seq("date", "channel", "publisher"), Map(
      "channel" -> Seq((10L, "tv"), (11L, "online")).toDF("id", "name"),
      "publisher" -> Seq((20L, "pub1"), (21L, "pub2")).toDF("id", "name")))
    val rows = out.collect()
    assert(out.columns.toSeq == Seq("date", "channel_id", "publisher_id"))
    assert(rows.length == 2) // dup collapsed, radio row dropped
  }

  test("promote applies staging and rolls back on failed validation (C5)") {
    val dir = Files.createTempDirectory("graft_promote").toString
    val prod = s"$dir/prod"; val stage = s"$dir/stage"; val backup = s"$dir/backup"
    Seq((1, "old")).toDF("id", "v").write.parquet(prod)
    Seq((2, "new")).toDF("id", "v").write.parquet(stage)

    // failing validation -> production restored
    assert(!DimSync.promote(spark, stage, prod, backup, _ => false))
    assert(spark.read.parquet(prod).as[(Int, String)].collect().toSet == Set(1 -> "old"))

    // passing validation -> staging promoted
    assert(DimSync.promote(spark, stage, prod, backup, df => df.count() == 1))
    assert(spark.read.parquet(prod).as[(Int, String)].collect().toSet == Set(2 -> "new"))
  }
}
