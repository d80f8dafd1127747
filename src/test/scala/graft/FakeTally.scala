package graft

import graft.functions.TallyTypes

/** In-memory Tally server for end-to-end tests: interprets the TDL
  * requests the engine generates — collection routes, field SET
  * expressions (including `$Guid:Collection:$Name` lookups), and
  * filter formulae (`$AlterID > n`, the auto-numbering predicate) —
  * against mutable tabular state, and answers with Tally's pseudo-XML.
  * Exercises the full S1–S4 request loop with no live Tally.
  *
  * State is keyed by collection path (e.g. "Voucher",
  * "Voucher.AllLedgerEntries"); each row maps Tally attribute name →
  * the string Tally's SET evaluation would emit.
  */
final class FakeTally {
  var tables: Map[String, Seq[Map[String, String]]] = Map.empty
  var masterAlterId: Long = 0L
  var txnAlterId: Long = 0L
  /** Every request body seen, newest last — lets tests assert on the
    * generated TDL (e.g. that the AlterID filter was injected). */
  var requests: List[String] = Nil

  // the envelope HEADER also carries a <TYPE>Data</TYPE>; anchor on
  // the collection element
  private val typeRe =
    "<COLLECTION NAME=\"MyCollection\"><TYPE>([A-Za-z]+)</TYPE>".r
  private val repeatRe = "<REPEAT>MyLine\\d+ : ([A-Za-z]+)</REPEAT>".r
  private val fieldRe = "(?s)<FIELD NAME=\"Fld\\d+\"><SET>(.*?)</SET>".r
  private val filterRe =
    "(?s)<SYSTEM TYPE=\"Formulae\" NAME=\"Fltr\\d+\">(.*?)</SYSTEM>".r
  private val alterGtRe = """\$AlterID > (-?\d+)""".r
  private val lookupRe = """\$Guid:(\w+):\$(\w+)""".r
  private val fieldRefRe = """(?<!\$)\$(?!\$)([A-Za-z][A-Za-z0-9_]*)""".r

  def transport(request: String): String = {
    requests = requests :+ request
    if (request.contains("AlterIdProbe"))
      return s""""$masterAlterId","$txnAlterId"""" + "\r\n"

    val collectionType = typeRe.findFirstMatchIn(request).get.group(1)
    val routes = collectionType +: repeatRe.findAllMatchIn(request)
      .map(_.group(1)).filterNot(_ == "MyCollection").toSeq
    val rows = tables.getOrElse(routes.mkString("."), Nil)

    val sets = fieldRe.findAllMatchIn(request).map(_.group(1)).toSeq
    val filters = filterRe.findAllMatchIn(request).map(_.group(1)).toSeq
    val alterFloor = filters.collectFirst {
      case f if alterGtRe.findFirstIn(f).isDefined =>
        alterGtRe.findFirstMatchIn(f).get.group(1).toLong
    }

    val kept = rows.filter { r =>
      alterFloor.forall(n => r.getOrElse("AlterId", "0").toLong > n)
      // the NumberingMethod predicate passes every fixture row (the
      // fixtures are all auto-numbered); other formulae are ignored
    }
    val body = kept.map { r =>
      sets.zipWithIndex.map { case (set, i) =>
        val tag = f"F${i + 1}%02d"
        s"<$tag>${TallyTypes.escapeXml(eval(set, r))}</$tag>"
      }.mkString
    }.mkString
    s"<ENVELOPE>$body</ENVELOPE>"
  }

  /** Evaluate one SET expression against a row: lookup shapes resolve
    * against the named collection (what live Tally does server-side);
    * anything else reads the first `$Field` reference. */
  private def eval(set: String, row: Map[String, String]): String =
    lookupRe.findFirstMatchIn(set) match {
      case Some(m) =>
        val (collection, nameField) = (m.group(1), m.group(2))
        val name = row.getOrElse(nameField, "")
        tables.getOrElse(collection, Nil)
          .find(_.getOrElse("Name", "") == name)
          .flatMap(_.get("Guid")).getOrElse("")
      case None =>
        fieldRefRe.findFirstMatchIn(set) match {
          case Some(m) => row.getOrElse(m.group(1), "")
          case None => ""
        }
    }
}
