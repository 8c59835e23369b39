package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, V1ScanWrapper}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftFunctions, JoinSkippingRule}
import graft.sources.{GraftSnapshotScan, SnapshotTable}

/** The optimizer-integrated form of join-driven file skipping
  * (JoinSkippingRule): a PLAIN spark.sql fact⋈dim query over the
  * snapshot catalog plans fewer fact files than the table holds, with
  * values identical to the unpruned join — no JoinSkipping API call
  * anywhere. */
class JoinSkippingRuleSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private val cat = "jsr"
  override protected def beforeAll(): Unit = {
    super.beforeAll()
    val wh = java.nio.file.Files.createTempDirectory("graft_jsr_wh").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.fact (id BIGINT, v BIGINT) " +
      "USING `graft-snapshot` TBLPROPERTIES('stats_cols'='id')")
    Seq(0L, 100L, 200L).foreach { base =>
      spark.sql(s"INSERT INTO $cat.db.fact SELECT id, id * 10 AS v " +
        s"FROM range($base, ${base + 100})")
    }
  }

  private def factTable: SnapshotTable = new SnapshotTable(spark,
    s"${spark.conf.get(s"spark.sql.catalog.$cat.warehouse")}/db/fact", Seq("id"))

  private def scanOf(df: DataFrame): GraftSnapshotScan =
    df.queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation
          if r.scan.isInstanceOf[V1ScanWrapper] &&
            r.scan.asInstanceOf[V1ScanWrapper].v1Scan.isInstanceOf[GraftSnapshotScan] =>
        r.scan.asInstanceOf[V1ScanWrapper].v1Scan.asInstanceOf[GraftSnapshotScan]
    }.getOrElse(fail(s"no snapshot scan in plan:\n${df.queryExecution.optimizedPlan}"))

  private def withRuleOff[A](body: => A): A = {
    spark.conf.set(JoinSkippingRule.EnabledConf, "false")
    try body finally spark.conf.unset(JoinSkippingRule.EnabledConf)
  }

  test("a plain SQL inner fact⋈dim plans fewer fact files; values match unpruned") {
    Seq(5L, 250L).toDF("k").createOrReplaceTempView("jsr_dim")
    def q = spark.sql(
      s"SELECT f.id, f.v FROM $cat.db.fact f JOIN jsr_dim d ON f.id = d.k")
    val want = withRuleOff(q.as[(Long, Long)].collect().toSet)
    assert(want == Set((5L, 50L), (250L, 2500L)))
    val df = q
    val scan = scanOf(df)
    val all = factTable.snapshot(factTable.latestVersion()).files
    val planned = scan.plannedFiles
    assert(planned.length < all.length,
      s"join skipping must drop files: planned ${planned.length} of ${all.length}")
    assert(scan.description().contains("points=id:2"),
      s"expected a 2-key point lane, got: ${scan.description()}")
    assert(df.as[(Long, Long)].collect().toSet == want)
  }

  test("disabled by conf: no point lane, full file list") {
    Seq(5L).toDF("k").createOrReplaceTempView("jsr_dim1")
    withRuleOff {
      val df = spark.sql(
        s"SELECT f.id FROM $cat.db.fact f JOIN jsr_dim1 d ON f.id = d.k")
      val scan = scanOf(df)
      assert(scan.plannedFiles.length ==
        factTable.snapshot(factTable.latestVersion()).files.length)
    }
  }

  test("LEFT OUTER with the fact on the LEFT must NOT prune (unmatched rows survive)") {
    Seq(7L).toDF("k").createOrReplaceTempView("jsr_dim2")
    val df = spark.sql(s"SELECT f.id, d.k FROM $cat.db.fact f " +
      "LEFT JOIN jsr_dim2 d ON f.id = d.k")
    val scan = scanOf(df)
    assert(scan.plannedFiles.length ==
      factTable.snapshot(factTable.latestVersion()).files.length,
      "pruning the row-preserving side of an outer join is unsound")
    assert(df.count() == 300L)
  }

  test("RIGHT OUTER with the fact on the LEFT prunes (its non-matching rows drop)") {
    Seq(7L, 299L).toDF("k").createOrReplaceTempView("jsr_dim3")
    val df = spark.sql(s"SELECT f.id, d.k FROM $cat.db.fact f " +
      "RIGHT JOIN jsr_dim3 d ON f.id = d.k")
    val scan = scanOf(df)
    assert(scan.plannedFiles.length <
      factTable.snapshot(factTable.latestVersion()).files.length)
    assert(df.as[(Long, Long)].collect().toSet == Set((7L, 7L), (299L, 299L)))
  }

  test("an unstable dim (LIMIT / nondeterminism) stands the lane down") {
    spark.sql("SELECT id AS k FROM range(0, 5) LIMIT 3")
      .createOrReplaceTempView("jsr_dim4")
    val limited = spark.sql(
      s"SELECT f.id FROM $cat.db.fact f JOIN jsr_dim4 d ON f.id = d.k")
    assert(scanOf(limited).plannedFiles.length ==
      factTable.snapshot(factTable.latestVersion()).files.length,
      "a LIMIT dim could collect a different row set at runtime")
    spark.sql("SELECT CAST(rand() * 10 AS BIGINT) AS k FROM range(0, 3)")
      .createOrReplaceTempView("jsr_dim5")
    val rand = spark.sql(
      s"SELECT f.id FROM $cat.db.fact f JOIN jsr_dim5 d ON f.id = d.k")
    assert(scanOf(rand).plannedFiles.length ==
      factTable.snapshot(factTable.latestVersion()).files.length,
      "a nondeterministic dim must not feed plan-time keys")
  }

  test("past the key cap the lane degrades to the dim's [min,max] HULL band") {
    spark.conf.set(JoinSkippingRule.MaxKeysConf, "3")
    try {
      // 4 distinct keys > cap 3, all inside the first file's band: the
      // hull [1, 4] still prunes the clustered fact to that file
      Seq(1L, 2L, 3L, 4L).toDF("k").createOrReplaceTempView("jsr_dim6")
      val df = spark.sql(
        s"SELECT f.id FROM $cat.db.fact f JOIN jsr_dim6 d ON f.id = d.k")
      val scan = scanOf(df)
      assert(scan.plannedFiles.length <
        factTable.snapshot(factTable.latestVersion()).files.length,
        s"hull band must prune: ${scan.description()}")
      assert(scan.description().contains("id:[1,4]"),
        s"expected the hull band lane, got ${scan.description()}")
      assert(df.as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
    } finally spark.conf.unset(JoinSkippingRule.MaxKeysConf)
  }

  test("a pushed WHERE IN lane and the join lane intersect") {
    Seq(5L, 150L, 250L).toDF("k").createOrReplaceTempView("jsr_dim7")
    val df = spark.sql(s"SELECT f.id FROM $cat.db.fact f " +
      s"JOIN jsr_dim7 d ON f.id = d.k WHERE f.id IN (150, 250, 999)")
    // rows: keys in BOTH sets -> {150, 250}; the scan's single id lane
    // holds the intersection
    assert(df.as[Long].collect().toSet == Set(150L, 250L))
    val scan = scanOf(df)
    assert(scan.description().contains("points=id:2"),
      s"expected intersected 2-key lane, got: ${scan.description()}")
  }

  test("a DIM-side cast(d.k as bigint) equi-key still prunes; values hash-match") {
    // the lane evaluates the actual dim expression values, so any
    // deterministic dim-side derivation qualifies — here the implicit
    // widening Spark inserts when the dim key is INT and the fact BIGINT
    Seq(5, 250).toDF("k").select(col("k").cast("int").as("k"))
      .createOrReplaceTempView("jsr_dimcast")
    def q = spark.sql(s"SELECT f.id, f.v FROM $cat.db.fact f " +
      "JOIN jsr_dimcast d ON f.id = CAST(d.k AS BIGINT)")
    val want = withRuleOff(q.as[(Long, Long)].collect().toSet)
    assert(want == Set((5L, 50L), (250L, 2500L)))
    val scan = scanOf(q)
    assert(scan.plannedFiles.length <
      factTable.snapshot(factTable.latestVersion()).files.length,
      s"dim-side cast must not stand the lane down: ${scan.description()}")
    assert(scan.description().contains("points=id:2"),
      s"expected a 2-key point lane, got: ${scan.description()}")
    assert(q.as[(Long, Long)].collect().toSet == want)
  }

  test("a FACT-side widening cast unwraps; out-of-range dim keys drop from the lane") {
    // an INT fact joined to a BIGINT dim: Spark (or the user) wraps the
    // fact key as CAST(id AS BIGINT) — injective + order-preserving, so
    // keys narrow back into the fact column's own type; the key beyond
    // Int range matches nothing and drops
    spark.sql(s"CREATE TABLE $cat.db.facti (id INT, v BIGINT) " +
      "USING `graft-snapshot` TBLPROPERTIES('stats_cols'='id')")
    Seq(0, 100, 200).foreach { base =>
      spark.sql(s"INSERT INTO $cat.db.facti " +
        s"SELECT CAST(id AS INT), id * 10 AS v " +
        s"FROM range($base, $base + 100)")
    }
    val facti = new SnapshotTable(spark,
      s"${spark.conf.get(s"spark.sql.catalog.$cat.warehouse")}/db/facti",
      Seq("id"))
    Seq(5L, 250L, 5000000000L).toDF("k")
      .createOrReplaceTempView("jsr_dimwide")
    def q = spark.sql(s"SELECT f.id, f.v FROM $cat.db.facti f " +
      "JOIN jsr_dimwide d ON CAST(f.id AS BIGINT) = d.k")
    val want = withRuleOff(q.as[(Int, Long)].collect().toSet)
    assert(want == Set((5, 50L), (250, 2500L)))
    val scan = scanOf(q)
    assert(scan.plannedFiles.length <
      facti.snapshot(facti.latestVersion()).files.length,
      s"fact-side widening cast must unwrap and prune: ${scan.description()}")
    assert(scan.description().contains("points=id:2"),
      s"the out-of-Int-range key must drop: ${scan.description()}")
    assert(q.as[(Int, Long)].collect().toSet == want)
  }

  test("a non-injective fact-side cast (to STRING) stands the lane down") {
    Seq("5", "250").toDF("s").createOrReplaceTempView("jsr_dimstr")
    val df = spark.sql(s"SELECT f.id FROM $cat.db.fact f " +
      "JOIN jsr_dimstr d ON CAST(f.id AS STRING) = d.s")
    assert(scanOf(df).plannedFiles.length ==
      factTable.snapshot(factTable.latestVersion()).files.length,
      "a string cast is not invertible per-value — no pruning lane")
    assert(df.as[Long].collect().toSet == Set(5L, 250L))
  }
}
