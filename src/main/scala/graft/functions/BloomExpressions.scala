package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a native codegen expression — the
  * big-corpus dedup prefilter ([[graft.operators.TextDedup
  * .bloomExactIncomingIds]], q129). The filter is
  * `org.apache.spark.util.sketch.BloomFilter` — Spark's own public
  * sketch (the one `DataFrameStatFunctions.bloomFilter` builds and
  * the runtime-bloom-join optimization ships) — carried as a
  * BROADCAST, not as plan-embedded bytes: the expression serializes
  * a handle, each executor fetches and deserializes the bitset ONCE
  * through the block manager, and every task of every stage reuses
  * that copy. At the operator's design point (10⁸–10⁹ existing
  * docs ⇒ a 120 MB–1.2 GB filter) a per-task deserialization — what
  * plan-embedded bytes would cost, and what Spark's own
  * BloomFilterMightContain accepts for its filter-subquery result —
  * is the difference between a map-side probe and a GC storm
  * (round-15 review). Per-row cost is two Murmur3 hashes against the
  * shared bitset; no UDF — the membership test runs inside
  * whole-stage codegen like every other graft kernel, and the
  * interpreted path calls the identical method.
  *
  * Determinism: the filter's bits are a pure OR-fold of per-element
  * bit patterns, so the built sketch is independent of partitioning
  * and row order — the same corpus always yields the same filter,
  * and the expression is safely reproducible across retries. */
case class BloomMightContainExpr(child: Expression,
    filter: Broadcast[BloomFilter]) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType}")

  /** Shared by the interpreted and generated paths. `putString` on
    * the build side hashes the UTF-8 bytes, so the probe hashes the
    * same bytes via `mightContainBinary`. */
  def mightContain(s: UTF8String): Boolean =
    filter.value.mightContainBinary(s.getBytes)

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
    * broadcast Bloom filter. */
  def mightContain(col: Column,
      filter: Broadcast[BloomFilter]): Column =
    ColumnBridge.column(BloomMightContainExpr(
      ColumnBridge.expression(col), filter))
}
