package graft.sinks

import graft.model.Contracts

/** Literal-form JDBC upsert: generates the per-table
  * `INSERT … SELECT … FROM temp_<table> ON CONFLICT (keys) DO UPDATE SET`
  * statement the reference executes against Postgres
  * (src/load.py:94-119), plus the staging-table lifecycle it wraps the
  * statement in (stage `temp_<table>` before, `DROP TABLE` after;
  * src/load.py:45,121-123).
  *
  * No database ships in this image, so the generated SQL is the
  * assertable surface (UpsertSpec pins the statement text for all four
  * tables); wiring it live is `df.write.jdbc(url, tempTable)` followed by
  * `stmt.execute(upsert); stmt.execute(dropTemp)`. [[Upsert]] is the
  * same merge expressed over parquet for the in-image pipelines.
  *
  * ads_raw_leads JSONB handling (src/load.py:72-100): `field_data`
  * arrives as a JSON string and is cast to JSONB in the SELECT, with the
  * update side casting `EXCLUDED."field_data"` likewise. DIVERGENCE,
  * deliberate: the reference appends the cast column at the END of the
  * SELECT list while the INSERT column list stays in frame order
  * (load.py:77-81 vs :71) — positionally misaligned whenever
  * `field_data` is not the frame's last column. We keep the cast at
  * `field_data`'s own position so INSERT and SELECT always align.
  */
object JdbcUpsert {

  /** The three statements of one upsert batch, in execution order:
    * stage rows into `tempTable`, merge via `upsert`, `dropTemp`. */
  final case class UpsertStatements(
      tempTable: String, upsert: String, dropTemp: String)

  private def q(c: String): String = "\"" + c + "\""

  /** Generate the merge statements for `table` with the given frame
    * columns. Keys come from [[Contracts.UpsertKeys]]; an unknown table
    * errors (src/load.py:62-63). */
  def statements(table: String, columns: Seq[String]): UpsertStatements = {
    val keys = Contracts.UpsertKeys.getOrElse(table,
      throw new IllegalArgumentException(
        s"no upsert keys declared for table '$table'"))
    require(keys.forall(columns.contains),
      s"frame for '$table' is missing key columns ${keys.filterNot(columns.contains)}")
    val tempTable = s"temp_$table"
    val jsonbCols: Set[String] =
      if (table == "ads_raw_leads") Set("field_data") else Set.empty
    val insertList = columns.map(q).mkString(", ")
    val selectList = columns.map { c =>
      if (jsonbCols(c))
        s"CASE WHEN ${q(c)} IS NULL THEN NULL ELSE ${q(c)}::JSONB END AS ${q(c)}"
      else q(c)
    }.mkString(", ")
    val updateCols = columns.filterNot(keys.contains)
    // all four contract tables have non-key columns; DO NOTHING keeps the
    // generator total if a future all-key table shows up
    val conflictAction =
      if (updateCols.isEmpty) "DO NOTHING"
      else "DO UPDATE SET " + updateCols.map { c =>
        if (jsonbCols(c)) s"${q(c)} = EXCLUDED.${q(c)}::JSONB"
        else s"${q(c)} = EXCLUDED.${q(c)}"
      }.mkString(", ")
    val upsert =
      s"""INSERT INTO $table ($insertList)
         |SELECT $selectList FROM $tempTable
         |ON CONFLICT (${keys.map(q).mkString(", ")})
         |$conflictAction;""".stripMargin
    UpsertStatements(tempTable, upsert, s"DROP TABLE $tempTable;")
  }

  /** Statements for a contract table using its declared schema
    * ([[Contracts]]); lead insights appends the whitelisted action
    * columns actually present in the batch (src/transform.py:152-155). */
  def forContractTable(table: String,
      actionCols: Seq[String] = Contracts.AllowedActionColumns)
      : UpsertStatements = {
    val cols = table match {
      case "ads_dimension" => Contracts.AdsDimension.fieldNames.toSeq
      case "ads_campaign_performance" =>
        Contracts.AdsCampaignPerformance.fieldNames.toSeq
      case "ads_lead_insights" =>
        Contracts.adsLeadInsights(actionCols).fieldNames.toSeq
      case "ads_raw_leads" => Contracts.AdsRawLeads.fieldNames.toSeq
      case other => throw new IllegalArgumentException(
        s"no upsert keys declared for table '$other'")
    }
    statements(table, cols)
  }
}
