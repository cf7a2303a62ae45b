package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation.StringLogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** Point-lookup file pruning through parquet's OWN bloom filters — the
  * secondary-index role the reference fills with per-key BwTree/hash
  * indexes maintained on every write (src/include/storage/index/
  * bwtree_index.h, index builtins in ast/builtins.h:229-231), re-expressed
  * storage-side: tables opt columns in via the `bloom.cols` property,
  * [[TableOps]]'s writer embeds a bloom per row group for those columns
  * (zero extra Spark jobs — the parquet writer builds them inline), and
  * equality lookups probe the blooms DRIVER-SIDE (one footer+bitset read
  * per candidate file, metadata I/O) to discard files the min/max stats
  * cannot rule out. That closes the case range stats are blind to: a
  * high-cardinality key written unclustered, where every file spans the
  * full key range but each key lives in exactly one file.
  *
  * Contract mirrors [[StatsPruner]]: `mayContain` returns false ONLY when
  * the file provably holds no row with the probed value — a missing bloom,
  * an unsupported type, or any decode doubt returns true (scan it).
  */
object BloomPruner {

  /** A probe against one column: the physical-typed value to hash. */
  final case class Probe(col: String, value: Any, sparkType: DataType)

  /** Probe clauses in CNF — a conjunction of disjunction clauses — mined
    * from an ANALYZED predicate. Each top-level conjunct becomes a clause
    * when it is WHOLLY equality-shaped: `col = lit` (singleton clause),
    * `col IN (lits…)`, or an OR-tree whose every leaf is `col = lit`
    * (columns may differ across disjuncts). A conjunct with any
    * non-equality branch yields no clause — it cannot refute a file.
    * Literals keep their Catalyst internal values; conversion to the
    * parquet physical domain happens at probe time against each file's
    * actual schema. */
  def cnfProbes(cond: Expression): Seq[Seq[Probe]] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    // Some(probes) = the disjunct set, None = unmineable conjunct
    def clause(e: Expression): Option[Seq[Probe]] = e match {
      case EqualTo(a: AttributeReference, l: Literal) if l.value != null =>
        Some(Seq(Probe(a.name, l.value, l.dataType)))
      case EqualTo(l: Literal, a: AttributeReference) if l.value != null =>
        Some(Seq(Probe(a.name, l.value, l.dataType)))
      case In(a: AttributeReference, vs) =>
        val lits = vs.collect { case l: Literal if l.value != null =>
          Probe(a.name, l.value, l.dataType) }
        if (lits.length == vs.length) Some(lits) else None
      case Or(l, r) =>
        for (cl <- clause(l); cr <- clause(r)) yield cl ++ cr
      case _ => None
    }
    conjuncts(cond).flatMap(clause(_))
  }

  /** Could `path` contain a row satisfying the CNF? False only when some
    * clause's EVERY disjunct is "definitely absent" in EVERY row group.
    * One footer open per call; bloom bitsets are read lazily per row group
    * and cached across the call's probes. */
  def mayContain(path: String, cnf: Seq[Seq[Probe]], conf: Configuration): Boolean =
    cnf.isEmpty || withProbeEval(path, conf)(ev =>
      cnf.forall(clause => clause.isEmpty || clause.exists(ev)))

  private def withProbeEval(path: String, conf: Configuration)(
      f: (Probe => Boolean) => Boolean): Boolean = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(path), conf))
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      // cache each (rowGroup, column)'s bloom across probes of the call
      val bloomCache = scala.collection.mutable.Map.empty[(Int, String), Option[
        org.apache.parquet.column.values.bloomfilter.BloomFilter]]
      def mayHold(p: Probe): Boolean =
        // "may contain" unless every row group definitively rejects
        blocks.isEmpty || blocks.zipWithIndex.exists { case (b, bi) =>
          b.getColumns.asScala.find(_.getPath.toDotString == p.col) match {
            case None => true // column absent from this group — stay safe
            case Some(cc) =>
              bloomCache.getOrElseUpdate((bi, p.col),
                Option(reader.getBloomFilterDataReader(b).readBloomFilter(cc))) match {
                case None => true // no bloom written — cannot rule out
                case Some(bf) =>
                  val pt = schema.getColumnDescription(cc.getPath.toArray)
                    .getPrimitiveType
                  hashFor(bf.hash(_: Object), pt, p) match {
                    case Some(h) => bf.findHash(h)
                    case None => true // type mismatch / unsupported — safe
                  }
              }
          }
        }
      f(mayHold)
    } finally reader.close()
  }

  /** Probe from an EXTERNAL (collected) value — the MERGE path collects
    * its source keys as JVM values, not Catalyst internal ones. None =
    * unconvertible, caller must stay conservative. */
  def probeExternal(colName: String, value: Any, dt: DataType): Option[Probe] =
    (dt, value) match {
      case (LongType, v: Long) => Some(Probe(colName, v, LongType))
      case (IntegerType, v: Int) => Some(Probe(colName, v, IntegerType))
      case (StringType, v: String) =>
        Some(Probe(colName, UTF8String.fromString(v), StringType))
      case _ => None
    }

  /** Hash the probe value in the column's physical domain; None when the
    * Spark literal type does not correspond to the physical type the
    * writer used (then hashing would be comparing different encodings). */
  private def hashFor(hash: Object => Long,
      pt: org.apache.parquet.schema.PrimitiveType, p: Probe): Option[Long] =
    (pt.getPrimitiveTypeName, pt.getLogicalTypeAnnotation, p.sparkType, p.value) match {
      case (PrimitiveTypeName.INT64, _, LongType, v: Long) =>
        Some(hash(java.lang.Long.valueOf(v)))
      case (PrimitiveTypeName.INT64, _, TimestampType, v: Long) =>
        Some(hash(java.lang.Long.valueOf(v))) // Spark writes micros as INT64
      case (PrimitiveTypeName.INT32, _, IntegerType, v: Int) =>
        Some(hash(java.lang.Integer.valueOf(v)))
      case (PrimitiveTypeName.INT32, _, DateType, v: Int) =>
        Some(hash(java.lang.Integer.valueOf(v))) // epoch days as INT32
      case (PrimitiveTypeName.BINARY, _: StringLogicalTypeAnnotation,
          StringType, v: UTF8String) =>
        Some(hash(Binary.fromConstantByteArray(v.getBytes)))
      case _ => None // decimals, floats (NaN hazard), widened casts: skip
    }
}
