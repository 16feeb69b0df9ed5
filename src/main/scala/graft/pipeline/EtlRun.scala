package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Normalize
import graft.operators.{ChangeLog, Merge}
import graft.schema.{Cardinality, Catalog}

/** Run report for one ETL execution (reference
  * `services/etlService.js:671-691`: processed/skipped counts, error
  * samples, progress).
  */
final case class TableResult(
    table: String,
    extracted: Long,
    merged: Long,
    error: Option[String],
)

final case class RunReport(
    totalLogRecords: Long,
    skipped: Long,
    tables: Seq[TableResult],
) {
  def processed: Long = tables.map(_.extracted).sum
  def errors: Int = tables.count(_.error.isDefined)
  def errorRatePct: Double =
    if (tables.isEmpty) 0.0
    else BigDecimal(100.0 * errors / tables.size)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
}

/** The flagship end-to-end lifecycle (SURVEY.md §3 E1), Spark-first.
  *
  * The reference's run is: count the change-log, page through it,
  * group by (table, key), extract each table's rows for the touched
  * keys, normalize, merge into the target, cascade
  * `farmparcelownership → farmparcel`, and report counts
  * (`services/etlService.js:694-743`). Here each table becomes ONE
  * logical plan — `log → distinct keys → semi-join source → normalize
  * → merge` — that Catalyst optimizes end-to-end; the only driver loop
  * is over table names. Pagination is gone: Spark partitions are the
  * batches.
  *
  * Storage layout: `tablesDir/<name>.parquet` for source extracts and
  * `targetDir/<name>.parquet` for merge targets; merges publish
  * atomically (staged write + swap — the reference's per-(table,batch)
  * transaction, SURVEY.md §4).
  */
final class EtlRun(
    spark: SparkSession,
    readSource: String => DataFrame,
    readTarget: String => DataFrame,
    writeTarget: (String, DataFrame) => Unit,
) {

  /** One table's plan: keys → semi-extract → normalize → merge. */
  def planTable(log: DataFrame, table: String): DataFrame = {
    val spec = Catalog.tables.getOrElse(table,
      graft.schema.TableSpec(table, "rsbsa_no", Cardinality.OneToMany, Nil))
    val keys = ChangeLog.keysForTable(log, table)
      .withColumnRenamed("rsbsa_no", spec.key)
    val extracted =
      if (table == "farmparcel")
        // bridge cascade (S5+S6/J2): farmers → ownership → parcel
        ChangeLog.twoHopExtract(
          far = readSource("farmparcel"),
          bridge = readSource("farmparcelownership")
            .select("rsbsa_no", "parcel_id"),
          keys = ChangeLog.keysForTable(log, table),
          nearKey = "rsbsa_no", farKey = "parcel_id")
      else
        ChangeLog.keyedExtract(readSource(table), keys, spec.key)
    val normalized = Normalize.forTable(extracted, table)
    Merge.merge(table, readTarget(table), normalized)
  }

  /** Execute a full run: every table named in the change-log, with the
    * reference's cascade (a `farmparcelownership` sync re-syncs
    * `farmparcel`, `services/etlService.js:642-654`) and per-table
    * failure isolation (R8: one table failing doesn't abort the run).
    */
  def run(log: DataFrame): RunReport = {
    val total = log.count()
    val valid = log.filter(col("rsbsa_no").isNotNull && col("table").isNotNull)
    val skipped = total - valid.count()
    val named = valid.select("table").distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    // cascade: ownership implies parcel re-sync
    val tables =
      if (named.contains("farmparcelownership") && !named.contains("farmparcel"))
        named :+ "farmparcel"
      else named
    val results = tables.map { table =>
      try {
        val cascadeLog =
          if (table == "farmparcel" && !named.contains("farmparcel"))
            // parcel keys come from the ownership log entries
            valid.withColumn("table",
              when(col("table") === "farmparcelownership", lit("farmparcel"))
                .otherwise(col("table")))
          else valid
        val merged = planTable(cascadeLog, table)
        val extracted = ChangeLog.keyedExtract(
          readSource(table),
          ChangeLog.keysForTable(cascadeLog, table)
            .withColumnRenamed("rsbsa_no",
              Catalog.tables.get(table).map(_.key).getOrElse("rsbsa_no")),
          Catalog.tables.get(table).map(_.key).getOrElse("rsbsa_no")).count()
        writeTarget(table, merged)
        // count from the published state (the merged plan's target input
        // was just swapped out from under it — never re-execute it)
        TableResult(table, extracted, readTarget(table).count(), None)
      } catch {
        case e: Exception => TableResult(table, 0, 0, Some(e.getMessage))
      }
    }
    RunReport(total, skipped, results)
  }
}

object EtlRun {

  /** Parquet-directory-backed runner (targets under `targetDir`,
    * sources under `sourceDir`), merges published atomically.
    */
  def onParquet(
      spark: SparkSession, sourceDir: String, targetDir: String): EtlRun =
    new EtlRun(
      spark,
      readSource = name => spark.read.parquet(s"$sourceDir/$name.parquet"),
      readTarget = name => {
        val p = s"$targetDir/$name.parquet"
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
          spark.read.parquet(p)
        else spark.read.parquet(s"$sourceDir/$name.parquet").limit(0)
      },
      writeTarget = (name, df) =>
        Merge.atomicOverwrite(df, s"$targetDir/$name.parquet"),
    )
}
