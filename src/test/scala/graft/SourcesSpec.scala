package graft

import java.nio.file.Files
import org.apache.spark.sql.types._
import graft.sources.Sources

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_src").toString

  test("CSV roundtrip with declared schema (S2/S3)") {
    val dir = tmp()
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "v")
    Sources.writeCsv(df, s"$dir/csv")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("v", DoubleType)))
    val back = Sources.readCsv(spark, s"$dir/csv", schema)
    assert(back.as[(Long, String, Double)].collect().toSet == Set((1L, "a", 1.5), (2L, "b", 2.5)))
  }

  test("JSON roundtrip (Airbyte landing shape)") {
    val dir = tmp()
    val df = Seq((1L, "x")).toDF("id", "payload")
    Sources.writeJson(df, s"$dir/json")
    val schema = StructType(Seq(StructField("id", LongType), StructField("payload", StringType)))
    assert(Sources.readJson(spark, s"$dir/json", schema).count() == 1)
  }

  test("overwrite/append/truncate/backup/restore table ops (S10-S13)") {
    val dir = tmp()
    val t = s"$dir/t"
    Sources.overwriteTable(Seq((1, "a")).toDF("id", "v"), t)
    Sources.appendTable(Seq((2, "b")).toDF("id", "v"), t)
    assert(spark.read.parquet(t).count() == 2)
    Sources.backupTable(spark, t, s"$dir/bak")
    Sources.truncateTable(spark, t)
    assert(spark.read.parquet(t).count() == 0)
    assert(spark.read.parquet(t).schema.fieldNames.toSeq == Seq("id", "v")) // schema kept
    Sources.restoreTable(spark, s"$dir/bak", t)
    assert(spark.read.parquet(t).count() == 2)
  }

  test("partitioned sink lays out partition dirs (scale path)") {
    val dir = tmp()
    val df = Seq(("2024-01-01", 1), ("2024-01-02", 2)).toDF("date", "v")
    Sources.writePartitioned(df, s"$dir/p", Seq("date"))
    val dirs = new java.io.File(s"$dir/p").listFiles().map(_.getName).filter(_.startsWith("date="))
    assert(dirs.toSet == Set("date=2024-01-01", "date=2024-01-02"))
  }
}
