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

  test("ORC roundtrip preserves schema and values; filters push to the ORC scan") {
    val dir = tmp()
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)).toDF("id", "name", "v")
    Sources.writeOrc(df, s"$dir/orc")
    val back = Sources.readOrc(spark, s"$dir/orc")
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      Seq("id" -> LongType, "name" -> StringType, "v" -> DoubleType))
    assert(back.as[(Long, String, Double)].collect().toSet ==
      Set((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)))
    // scale posture: the predicate must reach the ORC scan node, same
    // as the parquet path (stripe-level skipping at real data sizes)
    val plan = back.filter($"id" > 1L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)]"), plan)
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

  test("dynamic partition overwrite replaces only the partitions present in the batch") {
    val dir = tmp()
    val full = Seq(("2024-01-01", 1), ("2024-01-02", 2)).toDF("date", "v")
    Sources.writePartitioned(full, s"$dir/p", Seq("date"))
    // backfill day 2 only: day 1 must survive, day 2 must be replaced
    val backfill = Seq(("2024-01-02", 99)).toDF("date", "v")
    Sources.overwritePartitionsDynamic(backfill, s"$dir/p", Seq("date"))
    val back = spark.read.parquet(s"$dir/p").as[(Int, String)].collect().toSet
    assert(back == Set((1, "2024-01-01"), (99, "2024-01-02")), s"got $back")
    // static overwrite of the same batch drops day 1 — the contrast that
    // makes dynamic mode the backfill-safe one
    Sources.writePartitioned(backfill, s"$dir/q", Seq("date"))
    Sources.writePartitioned(full, s"$dir/q", Seq("date"))
    Sources.writePartitioned(backfill, s"$dir/q", Seq("date"))
    assert(spark.read.parquet(s"$dir/q").count() == 1)
  }

  test("compactTable rewrites many small files into few, preserving the data") {
    val dir = tmp()
    val df = spark.range(1000).selectExpr("id", "id % 7 AS k")
    df.repartition(50).write.parquet(s"$dir/t")
    def files = new java.io.File(s"$dir/t").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files == 50)
    Sources.compactTable(spark, s"$dir/t", targetRowsPerFile = 500L)
    assert(files <= 4, s"expected <=4 files after compaction, got $files")
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 1000)
    assert(back.selectExpr("sum(id)").as[Long].head() == 499500L)
  }

  test("readCsvAudited quarantines malformed lines verbatim; good rows parse clean") {
    val dir = tmp()
    Files.write(java.nio.file.Paths.get(dir, "feed.csv"),
      "id,name,v\n1,a,1.5\noops,b,2.5\n3,c,9.9,extra\n4,d,2.0\n".getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("v", DoubleType)))
    val (good, bad) = graft.sources.Sources.readCsvAudited(spark, s"$dir/feed.csv", schema)
    assert(good.as[(Long, String, Double)].collect().toSet ==
      Set((1L, "a", 1.5), (4L, "d", 2.0)))
    assert(bad.as[String].collect().toSet == Set("oops,b,2.5", "3,c,9.9,extra"))
  }

  test("readJdbcPartitioned splits the scan into parallel range queries") {
    val url = "jdbc:derby:memory:graftsrc;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().executeUpdate(
        "CREATE TABLE facts (id BIGINT NOT NULL, amt DOUBLE NOT NULL)")
      val ps = conn.prepareStatement("INSERT INTO facts VALUES (?, ?)")
      (1L to 1000L).foreach { i => ps.setLong(1, i); ps.setDouble(2, i * 0.5); ps.addBatch() }
      ps.executeBatch()
    } finally conn.close()
    val df = graft.sources.Sources.readJdbcPartitioned(spark, url, "facts",
      new java.util.Properties(), "id", 1L, 1001L, 4)
    assert(df.rdd.getNumPartitions == 4, "four concurrent range cursors")
    assert(df.count() == 1000)
    assert(df.selectExpr("sum(id)").collect()(0).getLong(0) == 500500L)
  }

  test("readBinaryFiles ingests a media directory; glob prunes at listing time; checksums survive the pipeline") {
    val dir = tmp()
    val payloads = Map("a.img" -> Array.tabulate(300)(i => (i % 251).toByte),
      "b.img" -> Array.tabulate(77)(i => (i * 3 % 256).toByte),
      "skip.txt" -> Array[Byte](1, 2, 3))
    payloads.foreach { case (name, bytes) =>
      Files.write(java.nio.file.Paths.get(dir, name), bytes) }
    val media = graft.sources.Sources.readBinaryFiles(spark, dir, "*.img")
    val rows = media.collect()
    assert(rows.length == 2, "glob must exclude skip.txt")
    assert(rows.map(_.getAs[Long]("media_id")).distinct.length == 2)
    // byte_len comes from the file STATUS (no content scan needed to know it)
    assert(rows.map(r => r.getAs[String]("path").split('/').last -> r.getAs[Long]("byte_len")).toMap
      == Map("a.img" -> 300L, "b.img" -> 77L))
    // content flows into the decode stage; checksum matches a local md5
    val meta = graft.llm.Multimodal.decodeMetadata(media).collect()
    val expected = payloads.filterKeys(_.endsWith(".img")).values.map { b =>
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map("%02x".format(_)).mkString
    }.toSet
    assert(meta.map(_.checksum).toSet == expected)
    assert(meta.map(m => m.byte_len).toSet == Set(300L, 77L))
  }

  test("readEvolved merges drifting batch schemas; pre-evolution rows read added columns as NULL") {
    val dir = tmp()
    // batch 1: (id, name) — the original landing schema
    Seq((1L, "a"), (2L, "b")).toDF("id", "name").write.parquet(s"$dir/b1")
    // batch 2: (id, name, score) — a column added upstream
    Seq((3L, "c", 0.5)).toDF("id", "name", "score").write.parquet(s"$dir/b2")
    // batch 3: (id, score) — name dropped upstream
    Seq((4L, 0.9)).toDF("id", "score").write.parquet(s"$dir/b3")
    val ev = Sources.readEvolved(spark, s"$dir/b1", s"$dir/b2", s"$dir/b3")
    assert(ev.columns.sorted.toSeq == Seq("id", "name", "score"))
    val rows = ev.select("id", "name", "score")
      .as[(Long, Option[String], Option[Double])].collect().toSet
    assert(rows == Set(
      (1L, Some("a"), None), (2L, Some("b"), None),
      (3L, Some("c"), Some(0.5)), (4L, None, Some(0.9))), s"got $rows")
  }
}
