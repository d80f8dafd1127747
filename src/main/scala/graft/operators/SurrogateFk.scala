package graft.operators

import graft.functions.TdlExpr
import graft.sources.TableSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Extract-time surrogate-FK enrichment (SURVEY §2.2 P15; reference
  * `$Guid:Collection:$Name` fields in
  * tally-export-config-incremental.yaml:298,408,627).
  *
  * The reference's incremental schema carries `_parent`/`_ledger`/
  * `_item`… columns holding the GUID of the master row whose name the
  * child references; Tally resolves them server-side during extract.
  * When the engine computes Spark-side, the same resolution is a
  * BROADCAST join per FK field against the named master's (name →
  * guid) projection — masters are dims, so the child never shuffles.
  * The enriched columns are exactly what the cascade-update consumer
  * ([[Cdc.cascadeUpdate]]) joins through.
  *
  * Guarded lookups (`if $$IsEmpty:$X then "" else $Guid:C:$X` and the
  * `$$SysName:Primary` parent-root form) resolve to "" for empty/root
  * names, mirroring the reference YAML's own wrappers. Unmatched names
  * also land as "" (Tally's behavior for a failed lookup) so the FK
  * column is never null.
  */
object SurrogateFk {

  /** TDL collection name → master table name (the reference's own
    * collection↔table pairing in tally-export-config.yaml). */
  val collectionTable: Map[String, String] = Map(
    "Group" -> "mst_group",
    "Ledger" -> "mst_ledger",
    "VoucherType" -> "mst_vouchertype",
    "Unit" -> "mst_uom",
    "Godown" -> "mst_godown",
    "StockGroup" -> "mst_stock_group",
    "StockItem" -> "mst_stock_item",
    "CostCategory" -> "mst_cost_category",
    "CostCentre" -> "mst_cost_centre")

  /** One declared FK field: output column, parsed lookup, and the
    * CHILD column carrying the name to resolve (the sibling field
    * extracting the same Tally attribute, falling back to the
    * lower-cased attribute name). */
  final case class FkField(fkCol: String, lookup: TdlExpr.Lookup,
      nameCol: String)

  def fkFields(spec: TableSpec): Seq[FkField] =
    spec.fields.flatMap { f =>
      TdlExpr.lookupPattern(f.field).map { lk =>
        val bare = TdlExpr.stripParent(lk.nameField)
        val sibling = spec.fields
          .find(s => s.name != f.name && TdlExpr.stripParent(s.field) == bare)
          .map(_.name)
        FkField(f.name, lk, sibling.getOrElse(bare.toLowerCase))
      }
    }

  /** Add every declared-but-absent FK column to `child` by broadcast
    * lookup. Columns already present (e.g. resolved server-side by a
    * live Tally) pass through untouched. `master` resolves a master
    * TABLE name to its current DataFrame (warehouse-backed in the
    * merge job); an unavailable master yields "" FKs rather than a
    * failed sync. */
  def enrich(child: DataFrame, spec: TableSpec,
      master: String => Option[DataFrame]): DataFrame =
    fkFields(spec).foldLeft(child) { (df, fk) =>
      if (df.columns.contains(fk.fkCol) ||
          !df.columns.contains(fk.nameCol)) df
      else {
        val table = collectionTable
          .getOrElse(fk.lookup.collection, fk.lookup.collection)
        master(table) match {
          case None => df.withColumn(fk.fkCol, lit(""))
          case Some(m) =>
            val keyCol = fk.lookup.keyField.toLowerCase // "Guid" → "guid"
            val nm = s"__fkn_${fk.fkCol}"
            val vl = s"__fkv_${fk.fkCol}"
            // one guid per name: a master transiently holding two rows
            // with the same name (mid-merge, dirty extract) must not
            // fan child rows out into duplicates through the join
            val dim = m.select(col("name").as(nm), col(keyCol).as(vl))
              .groupBy(nm).agg(min(col(vl)).as(vl))
            val name = df(fk.nameCol)
            // guarded lookups blank out empty names and the reserved
            // Primary root (the two reference guard shapes)
            val guard =
              if (fk.lookup.guarded)
                name.isNull.or(name === "").or(lower(name) === "primary")
              else name.isNull
            df.join(broadcast(dim), name === col(nm), "left")
              .withColumn(fk.fkCol,
                when(guard, lit("")).otherwise(coalesce(col(vl), lit(""))))
              .drop(nm, vl)
        }
      }
    }
}
