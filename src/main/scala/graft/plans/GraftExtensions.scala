package graft.plans

import graft.functions.{CosineSimilarityExpr, LshSignKeysExpr, NfcNormalizeExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql` users get them too:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * // or: spark.sql.extensions=graft.plans.GraftExtensions
  * spark.sql("SELECT cosine_similarity(a.embedding, b.embedding) ...")
  * }}}
  *
  * This is the (c)-level hook of the extension hierarchy — kept to
  * function injection because the engine's operators deliberately
  * compose Catalyst built-ins (no custom planner strategies needed;
  * SURVEY §7.3).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName,
        "cosine_similarity"),
      (children: Seq[Expression]) =>
        CosineSimilarityExpr(children(0), children(1))))
    // lsh_sign_keys(vec, planes, tables) — the fused salted-LSH key
    // kernel; the int parameters must be literals (they shape the
    // generated code). The plane matrix is sized from the vectors
    // themselves at run time — no dims argument.
    ext.injectFunction((
      FunctionIdentifier("lsh_sign_keys"),
      new ExpressionInfo(classOf[LshSignKeysExpr].getName,
        "lsh_sign_keys"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"lsh_sign_keys(vec, planes, tables) takes 3 arguments, " +
            s"got ${children.length}")
        def intLit(e: Expression, name: String): Int = e match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"lsh_sign_keys: $name must be an integer literal, got $other")
        }
        LshSignKeysExpr(children(0),
          intLit(children(1), "planes"),
          intLit(children(2), "tables"))
      }))
    // nfc_normalize(text) — Unicode NFC canonicalization (UAX #15),
    // curation step zero for crawl text
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName,
        "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"nfc_normalize(text) takes 1 argument, got ${children.length}" +
            " (only canonical composition NFC is offered — a silently" +
            " ignored form argument would corrupt downstream digests)")
        NfcNormalizeExpr(children.head)
      }))
  }
}
