package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Remaining small operators (SURVEY.md §2.6 L1/L2, §2.7 U1): top-k with a
  * pinned order (the reference's bare LIMIT is nondeterministic — the
  * deterministic variant is the oracle-checkable one), limited projection
  * fetch (S7), and UNION ALL (U1). */
object MiscQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // L1 + ordering: top-10 orders by value. Spark executes this as a
    // TakeOrderedAndProject (per-partition heap + driver merge, no sort).
    "misc_topk_orders" -> ((s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))),

    // S7: projected, bounded fetch (selected_fields + max_results).
    "misc_limited_fetch" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_brand"), col("p_type"), col("p_partkey"))
        .orderBy(col("p_partkey").asc)
        .limit(10)),

    // S5: the universal SQL-text extract primitive (client.query(q)) —
    // spark.sql over a registered view; the result stays distributed
    // instead of collapsing to the driver as the reference's to_dataframe.
    "misc_sql_extract" -> ((s, d) => {
      Tables.events(s, d).createOrReplaceTempView("events_v")
      s.sql("""SELECT event_type, count(*) AS n, min(user_id) AS min_user
               FROM events_v WHERE event_type IS NOT NULL
               GROUP BY event_type""")
    }),

    // JSON landing-shape extraction (Airbyte payloads land as JSON text):
    // typed from_json struct access, codegen-friendly.
    "misc_json_extract" -> ((s, d) =>
      Tables.events(s, d).select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType))))("k").as("k_val"))),

    // U1: UNION ALL of two incremental slices (column-name aligned).
    "misc_union_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .unionByName(
          o.filter(col("o_orderstatus") === "O")
            .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")))
    })
  )

  val oracle: Map[String, String] = Map(
    "misc_topk_orders" -> """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",

    "misc_limited_fetch" -> """
SELECT p_brand, p_type, p_partkey FROM part ORDER BY p_partkey ASC LIMIT 10""",

    "misc_sql_extract" -> """
SELECT event_type, count(*) AS n, min(user_id) AS min_user
FROM events WHERE event_type IS NOT NULL GROUP BY event_type""",

    "misc_json_extract" -> """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
FROM events""",

    "misc_union_all" -> """
SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'F'
UNION ALL
SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'O'"""
  )
}
