package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental-sync (CDC) algebra — SURVEY §2.3 L1–L11.
  *
  * The reference's incremental sync (src/tally.mts:88-307) detects
  * deletes with a `NOT IN` anti-join against a `(guid, alterid)` diff
  * snapshot (src/tally.mts:172), changed rows with a version-mismatch
  * join (src/tally.mts:174), then deletes + re-appends the changed set
  * (src/tally.mts:177-223). Here each step is a join — all key-partition
  * co-located, so a single shuffle on the key per phase; with both
  * sides bucketed by key at rest the merge is shuffle-free.
  */
object Cdc {

  /** Change log between a target table and a source snapshot on `key`:
    * rows deleted from source → op "D"; rows whose `versionCol` differs
    * → op "U". Mirrors _delete/_diff temp-table algebra
    * (src/tally.mts:144-187). */
  def changeLog(target: DataFrame, source: DataFrame,
      key: String, versionCol: String): DataFrame = {
    val t = target.select(col(key), col(versionCol).as("__tv"))
    val sv = source.select(col(key), col(versionCol).as("__sv"))
    val deleted = t.join(sv, Seq(key), "left_anti")
      .select(lit("D").as("op"), col(key))
    val changed = t.join(sv, Seq(key), "inner")
      .filter(col("__tv") =!= col("__sv"))
      .select(lit("U").as("op"), col(key))
    deleted.unionByName(changed)
  }

  /** Source-wins upsert merge: target rows whose key is absent from
    * source, plus all source rows (the re-extracted `$AlterID > n` set,
    * src/tally.mts:190-223). Columns must align by name. */
  def merge(target: DataFrame, source: DataFrame,
      keys: Seq[String]): DataFrame = {
    val kept = target.join(source.select(keys.map(col): _*).distinct(),
      keys, "left_anti")
    kept.unionByName(source.select(kept.columns.map(col).toIndexedSeq: _*))
  }

  /** Cascade delete (L7): remove child rows whose foreign key matches a
    * deleted parent key set (src/tally.mts:180-186). */
  def cascadeDelete(child: DataFrame, deletedKeys: DataFrame,
      fk: String): DataFrame = {
    val keyCol = deletedKeys.columns.head
    child.join(deletedKeys.withColumnRenamed(keyCol, fk).select(col(fk)),
      Seq(fk), "left_anti")
  }

  /** Cascade update (L9): refresh a denormalized name column on the
    * child from the master via its surrogate FK
    * (src/tally.mts:228-245). Broadcast the master — it is a dim. */
  def cascadeUpdate(child: DataFrame, master: DataFrame,
      childFk: String, masterKey: String, masterName: String,
      childName: String): DataFrame = {
    val m = master.select(col(masterKey).as("__mk"),
      col(masterName).as("__mn"))
    child.join(broadcast(m), child(childFk) === col("__mk"), "left")
      .withColumn(childName, coalesce(col("__mn"), col(childName)))
      .drop("__mk", "__mn")
  }

  /** Voucher renumbering (L10): auto-numbered voucher types shift the
    * numbers of every LATER voucher when one is inserted or deleted in
    * between, so the reference re-pulls (key, number) for the auto
    * types and join-replaces the stored numbers
    * (src/tally.mts:248-298). Rows absent from the re-pull
    * coalesce-keep their stored number — the re-pull covers
    * auto-numbered types only; manual types never change. The re-pull
    * is two columns and dim-sized (it scales with the auto-numbered
    * voucher count of one sync window, not the corpus), hence the
    * broadcast; the voucher table itself is never shuffled. */
  def renumber(vouchers: DataFrame, numbers: DataFrame,
      key: String, numberCol: String): DataFrame = {
    val n = numbers.select(col(key), col(numberCol).as("__vn"))
    vouchers.join(broadcast(n), Seq(key), "left")
      .withColumn(numberCol, coalesce(col("__vn"), col(numberCol)))
      .drop("__vn")
  }

  /** Watermark short-circuit (L1/L2): max version across many tables —
    * the reference's `max(alterid)`-over-union probe
    * (src/tally.mts:118-124). */
  def maxWatermark(tables: Seq[DataFrame], versionCol: String): Long = {
    val maxes = tables.map(_.agg(
      max(col(versionCol).cast("long")).as("m")))
    val row = maxes.reduce(_ unionByName _).agg(max(col("m"))).head()
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }
}
