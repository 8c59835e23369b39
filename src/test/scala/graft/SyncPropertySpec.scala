package graft

import org.scalacheck.Gen
import graft.sync.DimSync
import graft.checks._

/** Property tests for the sync algebra (SURVEY.md §5 rebuild strategy b):
  * the set-based rewrite must keep the reference's invariants for ANY
  * source/dim state, not just the fixtures. ScalaCheck generators sampled
  * directly (the scalatest bridge artifact is not in the offline cache). */
class SyncPropertySpec extends SparkSpec {
  import spark.implicits._

  private val names = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))
  private def cases: Seq[(List[String], List[String])] =
    Seq.fill(12)((names.sample.getOrElse(Nil), names.sample.getOrElse(Nil)))

  test("sync reaches fixpoint and is idempotent: dim' == distinct(source) (J6/J7)") {
    cases.foreach { case (src, dimNames) =>
      val source = src.toDF("v")
      val dim = dimNames.distinct.zipWithIndex.map { case (n, i) => (i, n) }.toDF("id", "name")
      val inserts = DimSync.insertMissing(source, "v", dim).as[String].collect().toSet
      val deletes = DimSync.deleteStale(dim, source, "v").collect().map(_.getAs[String]("name")).toSet
      val newDim = (dimNames.distinct.toSet -- deletes) ++ inserts
      assert(newDim == src.toSet, s"src=$src dim=$dimNames")
      val dim2 = newDim.toSeq.zipWithIndex.map { case (n, i) => (i, n) }.toDF("id", "name")
      assert(DimSync.insertMissing(source, "v", dim2).count() == 0)
      assert(DimSync.deleteStale(dim2, source, "v").count() == 0)
    }
  }

  test("insertMissing never creates name duplicates in the dim (Q7 invariant)") {
    cases.foreach { case (src, dimNames) =>
      val source = src.toDF("v")
      val dim = dimNames.distinct.zipWithIndex.map { case (n, i) => (i, n) }.toDF("id", "name")
      val inserts = DimSync.insertMissing(source, "v", dim).as[String].collect().toSeq
      val after = (dimNames.distinct ++ inserts).toDF("name")
      assert(Checks.evaluate(after, Seq(UniqueKey(Seq("name")))).head.passed,
        s"src=$src dim=$dimNames inserts=$inserts")
    }
  }

  test("setSyncDiff is empty iff distinct sets are equal (Q8/U2)") {
    cases.foreach { case (a, b) =>
      val d = Checks.setSyncDiff(a.toDF("v"), "v", b.toDF("w"), "w").count()
      assert((d == 0) == (a.toSet == b.toSet), s"a=$a b=$b")
    }
  }
}
