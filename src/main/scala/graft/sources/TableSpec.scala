package graft.sources

import graft.functions.TallyTypes
import graft.functions.TallyTypes.FieldType
import org.apache.spark.sql.types.{StructField, StructType}

import scala.jdk.CollectionConverters._

/** Declarative table specification — the engine's core abstraction
  * (SURVEY §7.1), YAML-compatible with the reference's export config
  * (reference src/definition.mts:39-48; tally-export-config.yaml).
  * One spec drives: TDL extraction XML, the typed schema, the
  * normalization plan, and incremental cascade behavior.
  */
final case class FieldSpec(name: String, field: String, ftype: FieldType)

final case class CascadeSpec(table: String, fields: Map[String, String])

final case class TableSpec(
    name: String,
    collection: String,
    nature: String, // "Primary" | "Derived"
    fields: Seq[FieldSpec],
    filters: Seq[String] = Nil,
    fetch: Seq[String] = Nil,
    cascadeUpdate: Seq[CascadeSpec] = Nil,
    cascadeDelete: Seq[CascadeSpec] = Nil) {

  /** Render the Spark schema — single source of truth (the reference
    * declares schemas twice, YAML + DDL; here the spec IS the DDL). */
  def schema: StructType = StructType(fields.map(f =>
    StructField(f.name, f.ftype.sparkType, nullable = true)))

  /** Collection descent path (dot-separated sub-collections →
    * PART/LINE EXPLODE nesting in TDL). */
  def collectionPath: Seq[String] = collection.split("\\.").toSeq
}

/** Loads reference-format YAML specs (top-level `master:` /
  * `transaction:` lists) via SnakeYAML (ships with Spark).
  * Reference spec shape per table: name, collection, nature, fields
  * (name/field/type), filters, fetch, cascade_update, cascade_delete.
  */
object SpecLoader {

  def load(yamlText: String): (Seq[TableSpec], Seq[TableSpec]) = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val root = yaml.load[java.util.Map[String, Any]](yamlText)
    def section(key: String): Seq[TableSpec] =
      Option(root.get(key)) match {
        case Some(l: java.util.List[_]) =>
          l.asScala.toSeq.map(t =>
            parseTable(t.asInstanceOf[java.util.Map[String, Any]]))
        case _ => Nil
      }
    (section("master"), section("transaction"))
  }

  private def parseTable(m: java.util.Map[String, Any]): TableSpec = {
    def strs(key: String): Seq[String] = Option(m.get(key)) match {
      case Some(l: java.util.List[_]) => l.asScala.toSeq.map(String.valueOf)
      case _ => Nil
    }
    def cascades(key: String): Seq[CascadeSpec] = Option(m.get(key)) match {
      case Some(l: java.util.List[_]) => l.asScala.toSeq.map { e =>
        val em = e.asInstanceOf[java.util.Map[String, Any]]
        val table = String.valueOf(em.get("table"))
        // reference shape is `{table: T, field: F}` — normalize so the
        // CascadeSpec key is always the CHILD column: for updates the
        // value is the master column refreshed from ("name",
        // src/tally.mts:236-243); for deletes the child column IS the
        // FK filtered on (src/tally.mts:183-185)
        val fields = Option(em.get("field")) match {
          case Some(f) =>
            val cf = String.valueOf(f)
            if (key == "cascade_update") Map(cf -> "name") else Map(cf -> cf)
          case None => em.asScala.toMap.collect {
            case (k, v) if k != "table" => k -> String.valueOf(v)
          }
        }
        CascadeSpec(table, fields)
      }
      case _ => Nil
    }
    val fields = Option(m.get("fields")) match {
      case Some(l: java.util.List[_]) => l.asScala.toSeq.map { f =>
        val fm = f.asInstanceOf[java.util.Map[String, Any]]
        FieldSpec(
          String.valueOf(fm.get("name")),
          String.valueOf(fm.get("field")),
          TallyTypes.fromYaml(String.valueOf(fm.get("type"))))
      }
      case _ => Nil
    }
    TableSpec(
      name = String.valueOf(m.get("name")),
      collection = String.valueOf(m.get("collection")),
      nature = Option(m.get("nature")).map(String.valueOf).getOrElse("Primary"),
      fields = fields,
      filters = strs("filters"),
      fetch = strs("fetch"),
      cascadeUpdate = cascades("cascade_update"),
      cascadeDelete = cascades("cascade_delete"))
  }
}
