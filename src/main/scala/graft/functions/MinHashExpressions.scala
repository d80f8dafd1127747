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

/** MinHash signature as a NATIVE AGGREGATE over exploded gram-hash
  * rows — the scale-safe batch formulation (round-12 advice): the
  * collect_list + [[MinHashSignatureExpr]] rewrite shuffles every
  * gram hash (8 B × grams/doc) and buffers whole per-doc lists,
  * which regresses on large-doc corpora (grams ≫ numHashes). This
  * aggregate keeps BOTH wins at once: the fixed `numHashes`-long
  * buffer of the old 128-column min-agg plan (map-side partial
  * aggregation — the shuffle carries one 128-long partial per (doc,
  * map partition), never the grams) and the single tight lane loop
  * of the native expression (the 128-column plan's cold codegen cost
  * was the reason it lost). Runs under ObjectHashAggregateExec.
  *
  * Value compatibility: identical lane law — min over grams of
  * `hashInt(seed, hashLong(h, 42))`, a null gram hash contributing
  * base 42 — pinned equal to both prior formulations in
  * MinHashExprSpec. Merge is element-wise min (associative,
  * commutative ⇒ split-independent). */
case class MinHashSigAgg(child: Expression, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[Array[Long]] {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT gram hash, got $other")
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    val base = if (v == null) 42L
      else XXH64.hashLong(v.asInstanceOf[Long], 42L)
    var i = 0
    while (i < numHashes) {
      val h = XXH64.hashInt(i, base)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * numHashes)
    var i = 0
    while (i < numHashes) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
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

  /** Column wrapper: MinHash signature AGGREGATE over a BIGINT gram
    * hash column — fixed-width partials, map-side combine; see
    * [[MinHashSigAgg]]. */
  def minhashSignatureAgg(gramHash: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashSigAgg(ColumnBridge.expression(gramHash), numHashes)
        .toAggregateExpression())
}
