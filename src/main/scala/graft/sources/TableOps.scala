package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Snapshot-style managed parquet tables: create / insert (append) /
  * delete / update with atomic version swap.
  *
  * Reference parity (SURVEY.md §2.1 Insert/Update/Delete,
  * logical_operators.h:718,929,995): terrier mutates MVCC version chains
  * under WAL; the Spark-native equivalent is immutable snapshots — every
  * mutation writes a NEW versioned directory and atomically repoints a
  * `current` marker file, which is exactly Iceberg's commit model scaled
  * down to plain parquet (kept behind this one class so a real Iceberg
  * catalog is a drop-in swap; SURVEY.md §7.4). Readers resolve `current`
  * at read time, so concurrent readers never observe a torn table, and
  * old snapshots remain readable (time travel / resume).
  */
final class TableOps(spark: SparkSession, root: String) {

  private def currentMarker(table: String): Path =
    Paths.get(root, table, "current")

  private def versionDir(table: String, v: Long): String =
    s"$root/$table/v$v"

  def currentVersion(table: String): Long = {
    val m = currentMarker(table)
    if (Files.exists(m)) new String(Files.readAllBytes(m), "UTF-8").trim.toLong
    else -1L
  }

  private def commit(table: String, v: Long): Unit = {
    val tmp = Paths.get(root, table, s".current.tmp")
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, v.toString.getBytes("UTF-8"))
    try Files.move(tmp, currentMarker(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      Files.move(tmp, currentMarker(table), StandardCopyOption.REPLACE_EXISTING)
    }
  }

  def create(table: String, df: DataFrame): Long = {
    val v = currentVersion(table) + 1
    df.write.mode(SaveMode.Overwrite).parquet(versionDir(table, v))
    commit(table, v); v
  }

  def read(table: String): DataFrame = {
    val v = currentVersion(table)
    require(v >= 0, s"table $table does not exist under $root")
    spark.read.parquet(versionDir(table, v))
  }

  /** Read a historical snapshot (time travel). */
  def readVersion(table: String, v: Long): DataFrame =
    spark.read.parquet(versionDir(table, v))

  /** INSERT: append rows as a new snapshot (old + new files). */
  def insert(table: String, rows: DataFrame): Long = {
    val v = currentVersion(table)
    val next = v + 1
    read(table).unionByName(rows)
      .write.mode(SaveMode.Overwrite).parquet(versionDir(table, next))
    commit(table, next); next
  }

  /** DELETE WHERE cond: copy-on-write rewrite without matching rows. */
  def delete(table: String, cond: org.apache.spark.sql.Column): Long = {
    val next = currentVersion(table) + 1
    read(table).filter(!coalesce(cond, lit(false)))
      .write.mode(SaveMode.Overwrite).parquet(versionDir(table, next))
    commit(table, next); next
  }

  /** UPDATE SET col = expr WHERE cond: copy-on-write rewrite. */
  def update(table: String, cond: org.apache.spark.sql.Column,
      setCol: String, value: org.apache.spark.sql.Column): Long = {
    val next = currentVersion(table) + 1
    read(table)
      .withColumn(setCol, when(coalesce(cond, lit(false)), value).otherwise(col(setCol)))
      .write.mode(SaveMode.Overwrite).parquet(versionDir(table, next))
    commit(table, next); next
  }
}
