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
    readVersion(table, v)
  }

  /** Read a historical snapshot (time travel). Schema-delta versions (see
    * addColumn) resolve lazily: the base version's files are read and the
    * added column is filled from its default expression — no data was
    * rewritten at ALTER time. */
  def readVersion(table: String, v: Long): DataFrame = {
    val delta = Paths.get(versionDir(table, v), "schema_delta.json")
    if (Files.exists(delta)) {
      val txt = new String(Files.readAllBytes(delta), "UTF-8")
      // minimal fixed-shape JSON: {"base":N,"col":"name","defaultSql":"expr"}
      val base = """"base"\s*:\s*(\d+)""".r.findFirstMatchIn(txt).get.group(1).toLong
      val cname = """"col"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(txt).get.group(1)
      val dflt = """"defaultSql"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(txt).get.group(1)
      readVersion(table, base).withColumn(cname, expr(dflt))
    } else spark.read.parquet(versionDir(table, v))
  }

  /** ALTER TABLE ADD COLUMN with LAZY migration — the reference fork's
    * headline feature (DESIGN.md:21-76: multiple live layout versions per
    * table, defaults filled on read, tuples migrated on their next write):
    * the new version stores only a schema delta pointing at the previous
    * version's data; readers fill the default on the fly, and the next
    * mutation (insert/update/delete) materializes the evolved layout via
    * its normal copy-on-write rewrite. Older snapshots keep the old
    * schema (time travel unaffected). `defaultSql` is a SQL expression. */
  def addColumn(table: String, name: String, defaultSql: String): Long = {
    val v = currentVersion(table)
    require(v >= 0, s"table $table does not exist under $root")
    val next = v + 1
    val dir = Paths.get(versionDir(table, next))
    Files.createDirectories(dir)
    Files.write(dir.resolve("schema_delta.json"),
      s"""{"base":$v,"col":"$name","defaultSql":"$defaultSql"}"""
        .getBytes("UTF-8"))
    commit(table, next); next
  }

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
