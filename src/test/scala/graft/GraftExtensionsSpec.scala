package graft

import org.apache.spark.sql.graft.GraftFunctions

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim is callable from SQL text after registration") {
    GraftFunctions.register(spark)
    Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(2.0f, 0.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val out = spark.sql("SELECT cosine_sim(a, b) AS c FROM vecs ORDER BY c")
      .as[Double].collect()
    assert(math.abs(out(0)) < 1e-12 && math.abs(out(1) - 1.0) < 1e-12)
  }

  test("scalar helpers are SQL-callable: surrogate_key, norm_name, comma_decimal") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT surrogate_key('a', 'b') AS sk, norm_name('RTL-Nitro') AS nn, comma_decimal('12,34') AS cd")
      .collect()(0)
    assert(r.getString(0) == java.security.MessageDigest.getInstance("MD5")
      .digest("a-b".getBytes).map("%02x".format(_)).mkString)
    assert(r.getString(1) == "rtlnitro")
    assert(r.getDouble(2) == 12.34)
  }

  test("date_spine is a SQL table function: inclusive ends, one row per day") {
    GraftFunctions.register(spark)
    val days = spark.sql(
      "SELECT day_date FROM date_spine(DATE'2021-02-26', DATE'2021-03-02')")
      .as[java.sql.Date].collect().map(_.toString).sorted
    assert(days.toSeq == Seq(
      "2021-02-26", "2021-02-27", "2021-02-28", "2021-03-01", "2021-03-02"))
    // string literals coerce; single-day spine is one row
    assert(spark.sql("SELECT * FROM date_spine('2020-06-15', '2020-06-15')")
      .count() == 1L)
    // plans as a generated Range, not a LocalRelation driver list
    val plan = spark.sql(
      "SELECT * FROM date_spine(DATE'1990-01-01', DATE'2030-12-31')")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Range"), s"expected Range-backed spine:\n$plan")
  }

  test("snapshot_at is SQL time travel: versioned reads, MOR view, joins as a relation") {
    GraftFunctions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_tvf_snap")
    dir.toFile.delete()
    val t = new graft.sources.SnapshotTable(spark, dir.toString)
    t.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    t.commitAppend(Seq((3L, "c")).toDF("id", "s"))
    t.commitDeleteByKey(Seq(2L).toDF("id"), Seq("id"))
    val p = dir.toString
    assert(spark.sql(s"SELECT count(*) FROM snapshot_at('$p', 1)").head.getLong(0) == 2L)
    assert(spark.sql(s"SELECT count(*) FROM snapshot_at('$p', 2)").head.getLong(0) == 3L)
    // default = latest, MOR delete applied in the SQL view
    assert(spark.sql(s"SELECT sort_array(collect_list(id)) FROM snapshot_at('$p')")
      .head.getSeq[Long](0) == Seq(1L, 3L))
    // composes like any relation
    assert(spark.sql(
      s"""SELECT count(*) FROM snapshot_at('$p', 1) a
          JOIN snapshot_at('$p') b ON a.id = b.id""").head.getLong(0) == 1L)
  }

  test("snapshot_history is DESCRIBE HISTORY as SQL: audit rows, filterable like a relation") {
    GraftFunctions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_tvf_hist")
    dir.toFile.delete()
    val t = new graft.sources.SnapshotTable(spark, dir.toString)
    t.commitAppend(Seq(1L, 2L).toDF("id"))
    t.commitOverwrite(Seq(9L).toDF("id"))
    t.compact(targetRowsPerFile = 10L)
    val h = spark.sql(
      s"SELECT version, action, n_rows, data_change FROM snapshot_history('${dir.toString}')")
      .as[(Long, String, Long, Boolean)].collect().sortBy(_._1)
    assert(h.toSeq == Seq((1L, "append", 2L, true), (2L, "overwrite", 1L, true),
      (3L, "compact", 1L, false)))
    // composes: count only the data-changing versions
    assert(spark.sql(
      s"SELECT count(*) FROM snapshot_history('${dir.toString}') WHERE data_change")
      .head.getLong(0) == 2L)
  }

  test("snapshot_files is the files metadata table as SQL: stats, deletes, blooms, versions") {
    GraftFunctions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_tvf_files")
    dir.toFile.delete()
    val t = new graft.sources.SnapshotTable(spark, dir.toString,
      statsCols = Seq("id"))
    t.setTableProperties(Map("write.bloom.cols" -> "id"))
    t.commitAppend((1L to 5L).toDF("id").repartition(1))
    t.commitAppend((6L to 9L).toDF("id").repartition(1))
    t.commitDeleteByKey(Seq(2L).toDF("id"), Seq("id"))
    val rows = spark.sql(
      s"""SELECT content, commit_seq, bytes,
                 element_at(min_key, 'id') AS min_k,
                 element_at(max_key, 'id') AS max_k,
                 element_at(null_count, 'id') AS nulls,
                 array_contains(bloom_cols, 'id') AS has_bloom
          FROM snapshot_files('${dir.toString}')""").collect()
    val data = rows.filter(_.getString(0) == "data").sortBy(_.getLong(1))
    assert(data.map(r => (r.getLong(1), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getBoolean(6))).toSeq ==
      Seq((1L, 1L, 5L, 0L, true), (2L, 6L, 9L, 0L, true)))
    assert(data.forall(r => r.getLong(2) > 0L)) // manifest-recorded lengths
    val dels = rows.filter(_.getString(0) == "delete")
    // delete files now carry their recorded KEY BAND (dmins/dmaxs —
    // the single deleted key 2 here) keyed by the delete-key column;
    // null_count stays absent and they carry no bloom
    assert(dels.nonEmpty && dels.forall(r => r.getLong(1) == 3L &&
      r.getLong(3) == 2L && r.getLong(4) == 2L &&
      r.isNullAt(5) && !r.getBoolean(6)))
    // data files expose their per-column NDV-sketch estimate (5 and 4
    // distinct ids here — low counts, HLL within a small envelope)
    val ndvs = spark.sql(
      s"""SELECT element_at(ndv_est, 'id') FROM snapshot_files('${dir.toString}')
          WHERE content = 'data' ORDER BY commit_seq""").collect()
      .map(_.getLong(0))
    assert(ndvs.length == 2 && math.abs(ndvs(0) - 5L) <= 1 &&
      math.abs(ndvs(1) - 4L) <= 1, s"got ${ndvs.toSeq}")
    // version argument: at v1 only the first file exists, no deletes
    assert(spark.sql(
      s"SELECT count(*) FROM snapshot_files('${dir.toString}', 1)")
      .head.getLong(0) == 1L)
    // composes as a relation: small-file debris question in one line
    assert(spark.sql(
      s"""SELECT count(*) FROM snapshot_files('${dir.toString}')
          WHERE content = 'data' AND bytes < 1024 * 1024""")
      .head.getLong(0) == 2L)
  }

  test("snapshot_stats is ANALYZE-as-SQL: exact bounds/nulls, NDV estimate, " +
      "versioned, NULL where unknown — never a guess") {
    GraftFunctions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_tvf_stats")
    dir.toFile.delete()
    val t = new graft.sources.SnapshotTable(spark, dir.toString,
      statsCols = Seq("id", "v"))
    t.commitAppend(spark.range(10, 60).selectExpr("id",
      "CASE WHEN id % 5 = 0 THEN NULL ELSE id * 2 END AS v").repartition(2))
    t.commitAppend(spark.range(60, 100).selectExpr("id",
      "id * 2 AS v").repartition(1))
    val rows = spark.sql(
      s"""SELECT column, n_rows, n_files, min_key, max_key, null_count, ndv_est
          FROM snapshot_stats('${dir.toString}')""").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("id", "v"))
    val id = rows("id")
    assert(id.getLong(1) == 90L && id.getLong(2) == 3L &&
      id.getLong(3) == 10L && id.getLong(4) == 99L && id.getLong(5) == 0L,
      s"got ${id}")
    assert(math.abs(id.getLong(6) - 90L) <= 9L, s"ndv ${id.getLong(6)}")
    val v = rows("v")
    assert(v.getLong(3) == 22L && v.getLong(4) == 198L && v.getLong(5) == 10L,
      s"got ${v}")
    // versioned: at v1 only the first append's stats
    val v1 = spark.sql(
      s"SELECT min_key, max_key FROM snapshot_stats('${dir.toString}', 1) " +
        "WHERE column = 'id'").head
    assert(v1.getLong(0) == 10L && v1.getLong(1) == 59L)
  }

  test("topk_agg is SQL-callable as a grouped aggregate") {
    GraftFunctions.register(spark)
    Seq((1L, 3.0, 10L), (1L, 5.0, 11L), (1L, 4.0, 12L), (2L, 1.0, 20L))
      .toDF("g", "s", "p").createOrReplaceTempView("tk_in")
    val out = spark.sql(
      """SELECT g, e.payload AS p, e.score AS s
         FROM (SELECT g, topk_agg(s, p, 2) AS tk FROM tk_in GROUP BY g)
         LATERAL VIEW explode(tk) AS e""")
      .as[(Long, Long, Double)].collect().toSet
    assert(out == Set((1L, 11L, 5.0), (1L, 12L, 4.0), (2L, 20L, 1.0)))
  }
}
