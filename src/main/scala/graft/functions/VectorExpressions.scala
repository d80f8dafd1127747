package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the embedding hot path — the
  * (b)-level extension from the design hierarchy: compose built-ins
  * first, custom `Expression` with `doGenCode` where built-ins can't
  * keep up, full planner extension never needed here.
  *
  * The HOF formulation (`zip_with` + `aggregate`) materializes an
  * intermediate array per pair evaluation; at O(n²) near-dup scale
  * that allocation dominates. This expression fuses dot product and
  * both norms into one allocation-free loop inside whole-stage
  * codegen. The interpreted path (`nullSafeEval`) accumulates in the
  * same index order, so both paths produce bit-identical doubles.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, " +
        s"got ${left.dataType} and ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance between two float arrays in one allocation-free
  * codegen loop — the PQ assignment metric
  * ([[graft.operators.Similarity]]'s per-subspace k-means): training
  * evaluates it corpus × m × ks times per Lloyd round, which as a
  * `zip_with`+`aggregate` HOF paid the interpreted-lambda machinery
  * this repo measured at ~200× a native loop (q131's clustered build
  * was the visible cost). Interpreted and generated paths accumulate
  * in the same index order — bit-identical doubles. */
case class L2SquaredExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_squared"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, " +
        s"got ${left.dataType} and ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All `tables` salted LSH sign-pattern keys of a vector in ONE fused
  * loop — replaces the posexplode → (planes×tables)-buffer hash
  * aggregate formulation, which cost a full shuffle of dims rows per
  * vector plus per-buffer aggregation overhead. The plane matrix
  * (splitmix64-derived, identical values to
  * [[graft.operators.Similarity]]'s literal planes) is precomputed
  * once per expression instance and shared via a codegen reference;
  * per row the kernel is `tables×planes` dot products over the float
  * array — allocation-free, inside whole-stage codegen, no shuffle.
  * Interpreted and codegen paths accumulate in the same index order →
  * bit-identical signs. */
case class LshSignKeysExpr(child: Expression, planes: Int, tables: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "lsh_sign_keys"

  // Plan-time validation (also covers spark.sql callers of the
  // registered function): a plane index >= 32 would collide 1L << j
  // with the table-salt high word (t << 32) and silently corrupt keys.
  override def checkInputDataTypes(): TypeCheckResult =
    if (planes < 1 || planes > 32)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: planes must be in [1, 32] (sign bits share a " +
          s"64-bit key with the table salt), got $planes")
    else if (tables < 1)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: tables must be >= 1, got $tables")
    else child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<FLOAT>, got $other")
    }

  /** Row-major [plane][dim] hyperplane-component cache, sized lazily
    * from the first observed vector length. Component (p, i) is
    * `mix64((p << 32) | i)` — independent of the vector length — so
    * keys are identical to the former explicit-`dims` formulation and
    * NO driver-side dims probe is needed to build the plan (the cache
    * is a per-executor-instance memo, rebuilt only if the observed
    * length changes; LSH over genuinely ragged vectors is undefined
    * anyway). Benign race: the tuple swap is atomic and the build is
    * idempotent. */
  @transient private var cached: (Int, Array[Double]) = null
  def matrixFor(n: Int): Array[Double] = {
    val c = cached
    if (c != null && c._1 == n) c._2
    else {
      val m = new Array[Double](tables * planes * n)
      var p = 0
      while (p < tables * planes) {
        var i = 0
        while (i < n) {
          m(p * n + i) = VectorExpressions
            .mix64((p.toLong << 32) | i.toLong).toDouble /
            Long.MaxValue.toDouble
          i += 1
        }
        p += 1
      }
      cached = (n, m)
      m
    }
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val mat = matrixFor(n)
    val keys = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = t.toLong << 32
      var j = 0
      while (j < planes) {
        val base = (t * planes + j) * n
        var dot = 0.0
        var i = 0
        while (i < n) {
          dot += x.getFloat(i).toDouble * mat(base + i)
          i += 1
        }
        if (dot >= 0) key |= (1L << j)
        j += 1
      }
      keys(t) = key
      t += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      // reference the expression instance itself: the matrix is fetched
      // through the memo (one virtual call + branch per row — noise
      // next to the planes×tables×dims multiply loop)
      val self = ctx.addReferenceObj("lshKeys", this,
        classOf[LshSignKeysExpr].getName)
      val m = ctx.freshName("m")
      val n = ctx.freshName("n"); val keys = ctx.freshName("keys")
      val t = ctx.freshName("t"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      val key = ctx.freshName("key"); val base = ctx.freshName("base")
      s"""
         |int $n = $v.numElements();
         |double[] $m = $self.matrixFor($n);
         |long[] $keys = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $key = ((long) $t) << 32;
         |  for (int $j = 0; $j < $planes; $j++) {
         |    int $base = ($t * $planes + $j) * $n;
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += (double) $v.getFloat($i) * $m[$base + $i];
         |    }
         |    if ($dot >= 0) $key |= (1L << $j);
         |  }
         |  $keys[$t] = $key;
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column wrapper for the fused cosine kernel. */
  def cosineSimilarity(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarityExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column wrapper for the fused squared-L2 kernel. */
  def l2Squared(a: Column, b: Column): Column =
    ColumnBridge.column(L2SquaredExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** splitmix64 finalizer — deterministic, engine-independent plane
    * component source (shared with
    * [[graft.operators.Similarity]]'s literal plane vectors). */
  private[graft] def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Column wrapper for the fused salted-LSH key kernel. */
  def lshSignKeys(vec: Column, planes: Int, tables: Int): Column =
    ColumnBridge.column(LshSignKeysExpr(
      ColumnBridge.expression(vec), planes, tables))
}
