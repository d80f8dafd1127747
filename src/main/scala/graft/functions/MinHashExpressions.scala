package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature — the (b)-level extension from the design
  * hierarchy, replacing the `aggregate`+`zip_with` HOF formulation on
  * the per-ROW (streaming) path.
  *
  * Why: higher-order functions are interpreted lambda machinery — the
  * HOF signature allocates two `numHashes`-element arrays and binds
  * three lambda variables PER GRAM, which measured ~20 s for a mere
  * 66k grams × 128 seeds at sf0.1 (the q102 micro-batch hot path).
  * This expression is one allocation per row and a tight two-level
  * loop; same workload ≈ 0.1 s. (The BATCH dedup family keeps its
  * exploded-gram + hash-aggregate formulation, which is faster still
  * at corpus scale — this expression serves the per-row stateless
  * shape that stream-static joins need.)
  *
  * Value compatibility: bit-identical to the HOF formula
  * `aggregate(hs, array_repeat(MaxValue, k), (acc, h) =>
  * zip_with(acc, sequence(0, k-1), (m, s) => least(m, xxhash64(h, s))))`.
  * Spark's two-argument `xxhash64(h, s)` chains its default seed 42
  * through both children — `hashInt(s, hashLong(h, 42))` — and a null
  * gram hash leaves the running seed untouched, exactly as the
  * builtin does. Both paths are pinned equal in MinHashExprSpec.
  */
case class MinHashSignatureExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> gram hashes, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var g = 0
    while (g < n) {
      // two-arg xxhash64 seed chain; null element = running seed kept
      val base =
        if (arr.isNullAt(g)) 42L else XXH64.hashLong(arr.getLong(g), 42L)
      var i = 0
      while (i < numHashes) {
        val v = XXH64.hashInt(i, base)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      g += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("sig")
      val g = ctx.freshName("g")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val base = ctx.freshName("base")
      val v = ctx.freshName("v")
      val xxh = classOf[XXH64].getName
      s"""
         |int $n = $a.numElements();
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $g = 0; $g < $n; $g++) {
         |  long $base = $a.isNullAt($g) ? 42L : $xxh.hashLong($a.getLong($g), 42L);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $v = $xxh.hashInt($i, $base);
         |    if ($v < $sig[$i]) $sig[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native 64-bit SimHash — same rationale as
  * [[MinHashSignatureExpr]]: the per-row HOF form is 64 interpreted
  * array-aggregates per document. Value-identical to that formula:
  * bit j is set iff the count of grams with bit j set strictly
  * exceeds half (Σ of ±1 > 0 ⇔ 2·cnt > n); a null gram hash
  * contributes −1 to every bit-sum — the HOF's `when` condition is
  * null for a null element, so its `otherwise(-1)` branch fires —
  * which is "counted in the total, set in no bit". */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> gram hashes, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cnt = new Array[Int](64)
    var total = 0
    var g = 0
    while (g < n) {
      if (!arr.isNullAt(g)) {
        val h = arr.getLong(g)
        var j = 0
        while (j < 64) {
          cnt(j) += ((h >>> j) & 1L).toInt
          j += 1
        }
      }
      total += 1 // null grams count toward the total, set no bit
      g += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (2 * cnt(j) > total) out |= 1L << j
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cnt = ctx.freshName("cnt")
      val total = ctx.freshName("total")
      val g = ctx.freshName("g")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |int[] $cnt = new int[64];
         |int $total = 0;
         |for (int $g = 0; $g < $n; $g++) {
         |  if (!$a.isNullAt($g)) {
         |    long $h = $a.getLong($g);
         |    for (int $j = 0; $j < 64; $j++) $cnt[$j] += (int) (($h >>> $j) & 1L);
         |  }
         |  $total++;
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if (2 * $cnt[$j] > $total) $out |= 1L << $j;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashExpressions {
  /** Column wrapper: MinHash signature of an ARRAY<BIGINT> of gram
    * hashes, value-identical to the HOF formulation it replaces. */
  def minhashSignature(gramHashes: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashSignatureExpr(ColumnBridge.expression(gramHashes), numHashes))

  /** Column wrapper: 64-bit SimHash of an ARRAY<BIGINT> of gram
    * hashes, value-identical to the HOF formulation it replaces. */
  def simhash64(gramHashes: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(gramHashes)))
}
