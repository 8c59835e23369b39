package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** File-disjoint optimistic concurrency for pruned row-level DML: a
  * pruned UPDATE/DELETE/MERGE knows exactly the file set it read and
  * replaced, so on a lost publish race it auto-rebases past concurrent
  * commits that are provably disjoint (no shared files, no new delete
  * files, same schema) instead of surfacing a conflict — the difference
  * between one writer and many on a shared 100 TB table. Overlapping
  * rewrites, new equality deletes, and schema changes still conflict:
  * a blind retry there would erase the concurrent commit's work.
  *
  * The interleaving is DETERMINISTIC, not a timing race: the first
  * statement's SET expression parks on a latch mid-scan (after its base
  * version is pinned), the rival commits, then the latch releases. */
class DmlConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private val cat = "dmlcc"
  override protected def beforeAll(): Unit = {
    super.beforeAll()
    val wh = java.nio.file.Files.createTempDirectory("graft_dmlcc_wh").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
  }

  /** Fresh band-disjoint table: three clustered INSERTs over disjoint
    * id hundreds, so a BETWEEN inside one hundred prunes to that
    * insert's files only. */
  private def freshTable(name: String): SnapshotTable = {
    spark.sql(s"CREATE TABLE $cat.db.$name (id BIGINT, v BIGINT) " +
      "USING `graft-snapshot` TBLPROPERTIES('stats_cols'='id')")
    Seq(0L, 100L, 200L).foreach { base =>
      spark.sql(s"INSERT INTO $cat.db.$name SELECT id, id * 10 AS v " +
        s"FROM range($base, ${base + 100})")
    }
    new SnapshotTable(spark,
      s"${spark.conf.get(s"spark.sql.catalog.$cat.warehouse")}/db/$name")
  }

  /** Run `gated` (its SET expression parks on the gate after the base is
    * pinned), run `rival` while it is parked, release, and return the
    * gated statement's outcome. */
  private def race(gated: String, rival: () => Unit): Either[Throwable, Unit] = {
    DmlConcurrencySpec.entered = new CountDownLatch(1)
    DmlConcurrencySpec.proceed = new CountDownLatch(1)
    DmlConcurrencySpec.fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    // only the FIRST gate evaluation parks (one task, one slot): parking
    // every task would starve the rival's jobs under FIFO scheduling
    spark.udf.register("dmlcc_gate", (v: Long) => {
      if (DmlConcurrencySpec.fired.compareAndSet(false, true)) {
        DmlConcurrencySpec.entered.countDown()
        DmlConcurrencySpec.proceed.await(60, TimeUnit.SECONDS)
      }
      v
    })
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fut = Future(spark.sql(gated))
    assert(DmlConcurrencySpec.entered.await(60, TimeUnit.SECONDS),
      "gated DML scan never started")
    rival()
    DmlConcurrencySpec.proceed.countDown()
    try { Await.result(fut, 120.seconds); Right(()) }
    catch { case e: Throwable => Left(e) }
  }

  private def causes(t: Throwable): Seq[Throwable] =
    if (t == null) Seq.empty else t +: causes(t.getCause)

  test("two concurrent pruned UPDATEs on DISJOINT bands both commit") {
    val t = freshTable("disj")
    val v0 = t.latestVersion()
    val out = race(
      s"UPDATE $cat.db.disj SET v = dmlcc_gate(v) + 7 WHERE id BETWEEN 0 AND 99",
      () => spark.sql(
        s"UPDATE $cat.db.disj SET v = v + 11 WHERE id BETWEEN 200 AND 299"))
    assert(out.isRight, s"disjoint concurrent UPDATE must auto-rebase, got $out")
    // BOTH statements published: two update versions past the inserts
    val hist = t.history().filter(_.version > v0)
    assert(hist.map(_.action) == Seq("update", "update"),
      s"expected two update commits, got ${hist.map(_.action)}")
    // and neither statement's effect was lost
    assert(spark.table(s"$cat.db.disj").as[(Long, Long)].collect().toSet ==
      (0L until 300L).map { i =>
        val base = i * 10
        (i, if (i < 100) base + 7 else if (i >= 200) base + 11 else base)
      }.toSet)
    // the rebase re-listed the rival's replacement files by identity:
    // the gated statement's commit keeps the rival's rewrite
    val tipFiles = t.snapshot(t.latestVersion()).files.toSet
    val rivalFiles = t.snapshot(t.latestVersion() - 1).files.toSet
    assert(rivalFiles.intersect(tipFiles).nonEmpty,
      "rebased commit must carry the rival's files forward")
  }

  test("concurrent pruned UPDATEs on OVERLAPPING files still conflict") {
    val t = freshTable("ovl")
    val out = race(
      s"UPDATE $cat.db.ovl SET v = dmlcc_gate(v) + 7 WHERE id BETWEEN 0 AND 99",
      () => spark.sql(
        s"UPDATE $cat.db.ovl SET v = v + 1000 WHERE id BETWEEN 50 AND 60"))
    assert(out.isLeft, "overlapping rewrite must surface a conflict")
    assert(causes(out.left.toOption.get)
        .exists(_.isInstanceOf[java.util.ConcurrentModificationException]),
      s"expected a snapshot-isolation conflict, got ${out.left.toOption.get}")
    // the rival's commit survives untouched; the gated statement did not apply
    assert(spark.table(s"$cat.db.ovl").as[(Long, Long)].collect().toSet ==
      (0L until 300L).map { i =>
        val base = i * 10
        (i, if (i >= 50 && i <= 60) base + 1000 else base)
      }.toSet)
    // a clean re-run lands against the new tip
    spark.sql(s"UPDATE $cat.db.ovl SET v = v + 7 WHERE id BETWEEN 0 AND 99")
    assert(spark.table(s"$cat.db.ovl")
      .filter(col("id") === 55L).as[(Long, Long)].head() == ((55L, 550L + 1000L + 7L)))
  }

  test("a concurrent APPEND never conflicts with a pruned UPDATE") {
    val t = freshTable("app")
    val out = race(
      s"UPDATE $cat.db.app SET v = dmlcc_gate(v) + 7 WHERE id BETWEEN 0 AND 99",
      () => spark.sql(s"INSERT INTO $cat.db.app VALUES (5000, 1)"))
    assert(out.isRight, s"concurrent append must auto-rebase, got $out")
    // snapshot semantics: the UPDATE leaves the concurrently-inserted
    // row untouched even though a fresh run's predicate would not match
    // it anyway; both effects are present
    val rows = spark.table(s"$cat.db.app").as[(Long, Long)].collect().toSet
    assert(rows.contains((5000L, 1L)), "the rival's inserted row must survive")
    assert(rows.contains((0L, 7L)) && rows.contains((99L, 997L)))
    assert(rows.size == 301)
  }

  test("a concurrent inserted row INSIDE the statement's band survives " +
      "(write-snapshot-isolation: the statement ran against its snapshot)") {
    val t = freshTable("band")
    val out = race(
      s"UPDATE $cat.db.band SET v = dmlcc_gate(v) + 7 WHERE id BETWEEN 0 AND 99",
      () => spark.sql(s"INSERT INTO $cat.db.band VALUES (50, -1)"))
    assert(out.isRight, s"concurrent append must auto-rebase, got $out")
    val at50 = spark.table(s"$cat.db.band")
      .filter(col("id") === 50L).as[(Long, Long)].collect().toSet
    // the snapshot's id=50 row was updated; the concurrent one was not
    assert(at50 == Set((50L, 507L), (50L, -1L)), s"got $at50")
  }

  /** Fresh MERGE-ON-READ table (delta UPDATE/DELETE paths): same three
    * band-disjoint inserts, row-unique key id. */
  private def freshMorTable(name: String): SnapshotTable = {
    spark.sql(s"CREATE TABLE $cat.db.$name (id BIGINT, v BIGINT) " +
      "USING `graft-snapshot` TBLPROPERTIES('stats_cols'='id', " +
      "'write.delete.mode'='merge-on-read', " +
      "'write.update.mode'='merge-on-read', 'write.delete.key'='id')")
    Seq(0L, 100L, 200L).foreach { base =>
      spark.sql(s"INSERT INTO $cat.db.$name SELECT id, id * 10 AS v " +
        s"FROM range($base, ${base + 100})")
    }
    new SnapshotTable(spark,
      s"${spark.conf.get(s"spark.sql.catalog.$cat.warehouse")}/db/$name")
  }

  test("MOR UPDATE delta rebases past a concurrent NON-MATCHING append") {
    val t = freshMorTable("mupd")
    val out = race(
      s"UPDATE $cat.db.mupd SET v = dmlcc_gate(v) + 7 WHERE id BETWEEN 0 AND 99",
      () => spark.sql(s"INSERT INTO $cat.db.mupd VALUES (5000, 1)"))
    assert(out.isRight, s"append of a non-matched key must rebase, got $out")
    val snap = t.snapshot(t.latestVersion())
    assert(snap.action == "update_mor" && snap.deletes.nonEmpty,
      s"the delta path must have published (delete file + data), got ${snap.action}")
    val rows = spark.table(s"$cat.db.mupd").as[(Long, Long)].collect().toSet
    assert(rows.contains((5000L, 1L)) && rows.contains((0L, 7L)) &&
      rows.contains((99L, 997L)) && rows.size == 301)
  }

  test("MOR UPDATE delta conflicts when the concurrent append MATCHES its keys") {
    val t = freshMorTable("mupdx")
    val out = race(
      s"UPDATE $cat.db.mupdx SET v = dmlcc_gate(v) + 7 WHERE id BETWEEN 0 AND 99",
      // the concurrent row shares key 50: the statement's equality
      // delete (outsequencing it) would erase a row it never matched —
      // the tip RECOUNT detects it and the statement surfaces a conflict
      () => spark.sql(s"INSERT INTO $cat.db.mupdx VALUES (50, -1)"))
    assert(out.isLeft, "a matched-key append must conflict with MOR DML")
    assert(causes(out.left.toOption.get)
        .exists(_.isInstanceOf[java.util.ConcurrentModificationException]),
      s"expected a snapshot-isolation conflict, got ${out.left.toOption.get}")
    val rows = spark.table(s"$cat.db.mupdx").as[(Long, Long)].collect().toSet
    assert(rows.contains((50L, 500L)) && rows.contains((50L, -1L)),
      "neither the snapshot row nor the concurrent row was touched")
  }

  test("MOR DELETE delta rebases past a disjoint append; matching append conflicts") {
    val t = freshMorTable("mdel")
    val ok = race(
      s"DELETE FROM $cat.db.mdel WHERE id BETWEEN 0 AND 49 AND dmlcc_gate(id) >= 0",
      () => spark.sql(s"INSERT INTO $cat.db.mdel VALUES (7000, 1)"))
    assert(ok.isRight, s"disjoint append must rebase, got $ok")
    assert(spark.table(s"$cat.db.mdel").count() == 251L)
    val bad = race(
      s"DELETE FROM $cat.db.mdel WHERE id BETWEEN 200 AND 249 AND dmlcc_gate(id) >= 0",
      () => spark.sql(s"INSERT INTO $cat.db.mdel VALUES (210, -1)"))
    assert(bad.isLeft, "an append matching the deleted keys must conflict")
    assert(spark.table(s"$cat.db.mdel").count() == 252L,
      "the failed DELETE applied nothing; the rival row landed")
  }

  test("a concurrent equality-delete (MOR) commit still conflicts") {
    val t = freshTable("mor")
    val out = race(
      s"UPDATE $cat.db.mor SET v = dmlcc_gate(v) + 7 WHERE id BETWEEN 0 AND 99",
      // rival lands a delete FILE (engine-level MOR delete on id=250):
      // a delete whose key fell inside the rewritten band would be
      // silently erased by a rebase (the replacement files outsequence
      // it), and applicability is only knowable by reading the delete
      // file — so ANY new delete file conservatively conflicts
      () => { t.commitDeleteByKey(Seq(250L).toDF("id"), Seq("id")); () })
    assert(out.isLeft, "a new delete file must conflict with in-flight DML")
    assert(causes(out.left.toOption.get)
        .exists(_.isInstanceOf[java.util.ConcurrentModificationException]),
      s"expected a snapshot-isolation conflict, got ${out.left.toOption.get}")
    // the MOR delete applied; the gated update did not
    val rows = spark.table(s"$cat.db.mor").as[(Long, Long)].collect().toSet
    assert(!rows.exists(_._1 == 250L) && rows.contains((0L, 0L)))
  }
}

object DmlConcurrencySpec {
  @volatile var entered: CountDownLatch = _
  @volatile var proceed: CountDownLatch = _
  @volatile var fired: java.util.concurrent.atomic.AtomicBoolean =
    new java.util.concurrent.atomic.AtomicBoolean(false)
}
