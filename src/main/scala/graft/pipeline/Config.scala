package graft.pipeline

/** C7 — the variable/connection store (reference:
  * include/import_airbyte_connection_variables.py:5-20 +
  * include/airbyte_variables.json: per company × source × environment
  * connection ids; include/scripts/config.py: TABLE_MAPPINGS /
  * TABLE_SCHEMAS / MIN_ROWS). A plain immutable registry — pipelines
  * take what they need as arguments (the C4 XCom replacement).
  */
final case class ConnectionKey(company: String, source: String, environment: String)

final case class EngineConfig(
    connections: Map[ConnectionKey, String],
    tableMappings: Map[String, String],
    expectedSchemas: Map[String, Set[String]],
    minRows: Long = 100) {

  def connection(company: String, source: String, environment: String): Option[String] =
    connections.get(ConnectionKey(company, source, environment))
}

object EngineConfig {
  /** Defaults mirroring the reference's config.py shapes (values are
    * placeholders — real deployments load their own). */
  val default: EngineConfig = EngineConfig(
    connections = Map(
      ConnectionKey("dummy", "facebook", "staging") -> "conn_dummy_fb_staging",
      ConnectionKey("dummy", "facebook", "production") -> "conn_dummy_fb_production"),
    tableMappings = Map(
      "channels" -> "channel", "campaigns" -> "campaign", "publishers" -> "publisher",
      "properties" -> "property", "media_types" -> "media_type",
      "media_clusters" -> "media_cluster", "audiences" -> "audience",
      "products" -> "product", "product_groups" -> "product_group"),
    expectedSchemas = Map(
      "ads_insights" -> Set("ad_id", "campaign_id", "objective", "clicks",
        "impressions", "unique_clicks", "spend", "cpm", "cpc",
        "conversion_values", "date_start", "created_time", "updated_time",
        "account_name", "account_id", "optimization_goal"),
      "campaigns" -> Set("id", "name", "status", "objective")))
}
