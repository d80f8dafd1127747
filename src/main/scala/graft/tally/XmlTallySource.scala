package graft.tally

import graft.functions.TallyTypes.{TNumber, TText}
import graft.sources.{FieldSpec, TableSpec, TallyXml}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Production [[TallySource]]: every probe and extract the incremental
  * merge needs, compiled to TDL and run over a transport (live
  * [[graft.sources.TallyHttp]], canned function in tests).
  *
  * Mirrors the reference's incremental request set
  * (src/tally.mts:88-307):
  *   - watermark probe: `$AltMstId,$AltVchId` company report
  *     (src/tally.mts:406-446)
  *   - diff snapshot: a synthetic two-field (guid, alterid) spec per
  *     primary table, same collection + filters, FETCH AlterId
  *     (src/tally.mts:144-170)
  *   - incremental rows: the table's own spec with an injected
  *     `$AlterID > n` filter (src/tally.mts:194-197, 212-215)
  *   - voucher renumber re-pull: (guid, voucher_number) over Voucher
  *     filtered to auto-numbered types (src/tally.mts:262-291)
  *
  * Each call is one driver-side HTTP exchange (the Tally protocol is
  * a single response stream per report — the reference's own
  * bottleneck); everything downstream of the transport is a
  * distributed DataFrame program.
  */
final class XmlTallySource(spark: SparkSession,
    transport: String => String,
    fromDate: String = "20230401", toDate: String = "20240331",
    company: Option[String] = None,
    voucherSpec: Option[TableSpec] = None) extends TallySource {

  // one probe per sync, like the reference's single updateLastAlterId
  // call at the top of the incremental run (src/tally.mts:113)
  private lazy val alterIds: (Long, Long) =
    TallyXml.parseAlterIds(transport(TallyXml.alterIdProbeTdl(company)))
      .getOrElse((0L, 0L))

  def lastAlterIdMaster: Long = alterIds._1
  def lastAlterIdTransaction: Long = alterIds._2

  private def extract(spec: TableSpec): DataFrame =
    TallyXml.extract(spark, spec, transport, fromDate, toDate, company)

  def diffSnapshot(spec: TableSpec): DataFrame =
    extract(spec.copy(
      name = "_diff",
      fields = Seq(
        FieldSpec("guid", "Guid", TText),
        // `number`, not the reference's text: the merge compares
        // alterid against the warehouse column, which is decimal
        FieldSpec("alterid", "AlterId", TNumber)),
      fetch = Seq("AlterId"),
      cascadeUpdate = Nil, cascadeDelete = Nil))

  def incrementalRows(spec: TableSpec, since: Long): DataFrame =
    extract(spec.copy(filters = spec.filters :+ s"$$AlterID > $since"))

  /** Unfiltered extract — the full-sync path (src/tally.mts:309-360). */
  def fullRows(spec: TableSpec): DataFrame = extract(spec)

  def voucherNumbers(): DataFrame = {
    val base = voucherSpec.getOrElse(TableSpec(
      "trn_voucher", "Voucher", "Primary", fields = Nil))
    extract(base.copy(
      name = "_vchnumber",
      fields = Seq(
        FieldSpec("guid", "Guid", TText),
        FieldSpec("voucher_number", "VoucherNumber", TText)),
      fetch = Nil,
      filters = base.filters :+
        "$$IsEqual:($NumberingMethod:VoucherType:$VoucherTypeName):\"Automatic\"",
      cascadeUpdate = Nil, cascadeDelete = Nil))
  }
}

/** Full + incremental sync orchestration over a [[Warehouse]] — the
  * CLI's engine room, shared by [[graft.Main]] and tests.
  *
  * `fullLoad` mirrors the reference's full sync (truncate + reload,
  * src/tally.mts:309-360); `incremental` merges the tables the
  * warehouse already holds, then bootstraps any missing table with a
  * full extract (the reference instead refuses and tells the user to
  * run a full sync first — docs/incremental-sync.md). Merge-then-
  * bootstrap order matters: a freshly-loaded table carries live
  * alterids, and letting it into the merge's max-watermark would
  * raise the `$AlterID > n` floor past changes the stale tables still
  * need to pull.
  */
object SyncRunner {

  def fullLoad(spark: SparkSession, specs: Seq[TableSpec],
      source: XmlTallySource, warehouse: Warehouse): Unit =
    specs.foreach { spec =>
      val df = graft.operators.SurrogateFk.enrich(
        source.fullRows(spec), spec,
        t => if (warehouse.exists(t)) Some(warehouse.read(t)) else None)
      warehouse.write(spec.name, df)
    }

  def incremental(spark: SparkSession, masters: Seq[TableSpec],
      transactions: Seq[TableSpec], source: XmlTallySource,
      warehouse: Warehouse): SyncReport = {
    def existing(specs: Seq[TableSpec]) =
      specs.filter(s => warehouse.exists(s.name))
    val report = new MergeJob(spark, existing(masters),
      existing(transactions), source, warehouse).run()
    val missing = (masters ++ transactions).filterNot(s =>
      warehouse.exists(s.name))
    fullLoad(spark, missing, source, warehouse)
    report
  }
}
