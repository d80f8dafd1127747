package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter membership as a native codegen expression — the
  * big-corpus dedup prefilter ([[graft.operators.TextDedup
  * .bloomExactIncomingIds]], q129). The filter is
  * `org.apache.spark.util.sketch.BloomFilter` — Spark's own public
  * sketch (the one `DataFrameStatFunctions.bloomFilter` builds with
  * a distributed treeAggregate and the runtime-bloom-join
  * optimization ships) — serialized into the expression and
  * deserialized ONCE per executor (transient lazy), so the per-row
  * cost is two Murmur3 hashes against a broadcast bitset. No UDF:
  * the membership test runs inside whole-stage codegen like every
  * other graft kernel, and the interpreted path calls the identical
  * method.
  *
  * Determinism: the filter's bits are a pure OR-fold of per-element
  * bit patterns, so the built sketch is independent of partitioning
  * and row order — the same corpus always yields the same filter,
  * and the expression is safely reproducible across retries. */
case class BloomMightContainExpr(child: Expression,
    filterBytes: Array[Byte]) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType}")

  @transient private lazy val filter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(filterBytes))

  /** Shared by the interpreted and generated paths. `putString` on
    * the build side hashes the UTF-8 bytes, so the probe hashes the
    * same bytes via `mightContainBinary`. */
  def mightContain(s: UTF8String): Boolean =
    filter.mightContainBinary(s.getBytes)

  override def nullSafeEval(v: Any): Any =
    mightContain(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("bloomExpr", this,
        classOf[BloomMightContainExpr].getName)
      s"${ev.value} = $self.mightContain($v);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}

object BloomExpressions {
  /** Column wrapper: does `col`'s string value might-exist in the
    * serialized Bloom filter. */
  def mightContain(col: Column, filterBytes: Array[Byte]): Column =
    ColumnBridge.column(BloomMightContainExpr(
      ColumnBridge.expression(col), filterBytes))
}
