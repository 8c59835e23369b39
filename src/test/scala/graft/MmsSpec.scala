package graft

import org.apache.spark.sql.functions._
import graft.models.Mms

/** FIXTURES.md §6 fixture: publisher names that only match after
  * normalization, a pair that must NOT match, and a null ET row. */
class MmsSpec extends SparkSpec {
  import spark.implicits._

  private def sheet = Seq(
    ("05.01.2024", "M1", "RTL Nitro", "Landliebe", "P1", "E. 14-49", 20, 1.5, 0.3, "12345678"),
    ("06.01.2024", "M2", "Super RTL", "Landliebe", "P1", "E. 14-49", 30, 2.5, 0.7, "87654321")
  ).toDF("datum", "Motiv", "Sender", "Firma", "Produkt", "Audience",
    "Spot_laenge", "BRW", "GRP", "Block")

  private def costs = Seq(
    ("rtl nitro", Some(java.sql.Date.valueOf("2024-01-05")), "12345678", "IP", 10.0, 8.0, 7.0),
    ("SUP-RTL!!", Some(java.sql.Date.valueOf("2024-01-06")), "87654321", "IP", 20.0, 16.0, 14.0),
    ("ARD", None, "00000000", "AS&S", 5.0, 4.0, 3.5) // null ET -> filtered
  ).toDF("Medien", "ET", "Blockkodierung", "Vermarkter",
    "Grundpreis_AR", "Netto_AR", "N_N_AR")

  test("lbStaged parses German dates, reformats block codes (mms_lb_staged.sql)") {
    val out = Mms.lbStaged(sheet).orderBy("date").collect()
    assert(out(0).getAs[java.sql.Timestamp]("date").toString == "2024-01-05 00:00:00.0")
    assert(out(0).getAs[String]("block_code") == "12-34-56-78")
    assert(out(0).getAs[String]("media_type") == "20 second spot")
    assert(out(0).getAs[String]("channel") == "TV")
  }

  test("normalizedCosts maps variant spellings, filters null ET (normalized_costs.sql)") {
    val out = Mms.normalizedCosts(costs).collect()
    assert(out.length == 2) // ARD row dropped (null ET)
    assert(out.map(_.getString(0)).toSet == Set("RTL Nitro", "SUP-RTL!!"))
  }

  test("performanceCostCombined joins on normalized 3-part key (J2)") {
    val combined = Mms.performanceCostCombined(Mms.lbStaged(sheet), Mms.normalizedCosts(costs))
      .orderBy("date").collect()
    // RTL Nitro: 'rtl nitro' normalizes equal -> match
    assert(combined(0).getAs[Double]("gross_media_cost") == 10.0)
    // Super RTL vs 'SUP-RTL!!' -> 'superrtl' vs 'suprtl': MUST NOT match
    assert(combined(1).isNullAt(combined(1).fieldIndex("gross_media_cost")))
  }
}
