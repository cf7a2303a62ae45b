package graft.sources

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-column statistics for ONE data file, carried in the table manifest
  * (the role Iceberg's manifest-entry `lower_bounds`/`upper_bounds`/
  * `null_value_counts` play, and the reference's per-block metadata in
  * arrow_block_metadata.h): enough information to decide from METADATA
  * whether a file can possibly contain rows matching a predicate, so
  * DELETE/UPDATE/MERGE/point-lookups plan their candidate files without
  * opening anything — at millions of files the difference between an O(1)
  * metadata decision and O(files) footer reads per mutation.
  *
  * `min`/`max` are canonical string encodings in the column's EXTERNAL
  * type domain (see [[StatsPruner.domain]]); `typ` is the Spark
  * `simpleString` of the column's type, which picks the comparison domain
  * back. A bound is None when unavailable (all-NULL file, NaN floats,
  * untruncatable string max) — the pruner treats that side as unbounded.
  */
final case class ColStats(typ: String, min: Option[String],
    max: Option[String], nulls: Long)

final case class FileStats(rows: Long, cols: Map[String, ColStats])

/** Conservative predicate-vs-file-stats evaluator: `mayMatch` returns
  * false ONLY when no row of the file can satisfy the predicate; every
  * unrecognized shape (casts, functions, non-literal comparands, unknown
  * columns) returns true. Safety is the contract — a wrong false loses
  * data in a mutation, a wrong true merely costs a scan. */
object StatsPruner {

  /** Comparison domains, chosen by the column type. */
  private sealed trait Domain {
    /** Parse a canonical stats encoding; None = treat as unbounded. */
    def parseStat(s: String): Option[Any]
    /** Convert a Catalyst literal (internal representation) from the
      * predicate; None = not comparable in this domain. */
    def parseLit(l: Literal): Option[Any]
    def lteq(a: Any, b: Any): Boolean
  }

  private object NumDomain extends Domain {
    def parseStat(s: String): Option[Any] =
      try Some(new java.math.BigDecimal(s)) catch { case _: NumberFormatException => None }
    def parseLit(l: Literal): Option[Any] = l.value match {
      case null => None
      case b: Byte => Some(java.math.BigDecimal.valueOf(b.toLong))
      case s: Short => Some(java.math.BigDecimal.valueOf(s.toLong))
      case i: Int if l.dataType == IntegerType => Some(java.math.BigDecimal.valueOf(i.toLong))
      case i: Long if l.dataType == LongType => Some(java.math.BigDecimal.valueOf(i))
      case f: Float => if (f.isNaN || f.isInfinite) None
        else Some(new java.math.BigDecimal(f.toString))
      case d: Double => if (d.isNaN || d.isInfinite) None
        else Some(java.math.BigDecimal.valueOf(d))
      case d: org.apache.spark.sql.types.Decimal => Some(d.toJavaBigDecimal)
      case _ => None
    }
    def lteq(a: Any, b: Any): Boolean =
      a.asInstanceOf[java.math.BigDecimal]
        .compareTo(b.asInstanceOf[java.math.BigDecimal]) <= 0
  }

  /** Strings compare in UTF-8 BINARY order (what parquet/Spark min/max
    * mean); java.lang.String order diverges for supplementary characters,
    * so non-ASCII operands fall back to "may match". */
  private object StrDomain extends Domain {
    private def ascii(s: String): Boolean = s.forall(_ < 128)
    def parseStat(s: String): Option[Any] = if (ascii(s)) Some(s) else None
    def parseLit(l: Literal): Option[Any] = l.value match {
      case u: UTF8String => val s = u.toString; if (ascii(s)) Some(s) else None
      case _ => None
    }
    def lteq(a: Any, b: Any): Boolean =
      a.asInstanceOf[String].compareTo(b.asInstanceOf[String]) <= 0
  }

  private object BoolDomain extends Domain {
    def parseStat(s: String): Option[Any] = s match {
      case "true" => Some(true); case "false" => Some(false); case _ => None
    }
    def parseLit(l: Literal): Option[Any] = l.value match {
      case b: Boolean => Some(b); case _ => None
    }
    def lteq(a: Any, b: Any): Boolean =
      !a.asInstanceOf[Boolean] || b.asInstanceOf[Boolean]
  }

  /** date (epoch days) / timestamp (epoch micros) — stats are stored as
    * the underlying long, and Catalyst literals already carry it. */
  private final class EpochDomain(expected: DataType) extends Domain {
    def parseStat(s: String): Option[Any] =
      try Some(s.toLong) catch { case _: NumberFormatException => None }
    def parseLit(l: Literal): Option[Any] =
      if (l.dataType != expected) None
      else l.value match {
        case i: Int => Some(i.toLong)
        case i: Long => Some(i)
        case _ => None
      }
    def lteq(a: Any, b: Any): Boolean =
      a.asInstanceOf[Long] <= b.asInstanceOf[Long]
  }

  private def domain(typ: String): Option[Domain] = typ match {
    case "tinyint" | "smallint" | "int" | "bigint" | "float" | "double" =>
      Some(NumDomain)
    case t if t.startsWith("decimal") => Some(NumDomain)
    case "string" => Some(StrDomain)
    case "boolean" => Some(BoolDomain)
    case "date" => Some(new EpochDomain(DateType))
    case "timestamp" => Some(new EpochDomain(TimestampType))
    case "timestamp_ntz" => Some(new EpochDomain(TimestampNTZType))
    case _ => None
  }

  /** Could any row of a file with stats `fs` satisfy `cond`?
    * (`cond` is an ANALYZED expression — TableOps resolves user predicates
    * first — evaluated with SQL semantics where NULL never matches, the
    * same contract TableOps mutations apply via coalesce(cond, false).) */
  def mayMatch(cond: Expression, fs: FileStats): Boolean = eval(cond, fs)

  /** A comparison literal, unwrapping the implicit cast the analyzer
    * inserts around type-promoted literals (foldable → evaluate now). */
  private object Lit {
    def unapply(e: Expression): Option[Literal] = e match {
      case l: Literal => Some(l)
      case c: Cast if c.child.isInstanceOf[Literal] && c.foldable =>
        scala.util.Try(Literal(c.eval(null), c.dataType)).toOption
      case _ => None
    }
  }

  /** Digits of an integral type's value range (for decimal-capacity checks). */
  private def integralDigits(dt: DataType): Option[Int] = dt match {
    case ByteType => Some(3)
    case ShortType => Some(5)
    case IntegerType => Some(10)
    case LongType => Some(19)
    case _ => None
  }

  /** Is `cast` injective AND order-preserving from its child's type into
    * the comparison domain? Only then can the attr be read through it:
    * a NARROWING cast (bigint→int) truncates/overflows, and integral→
    * float/double loses precision above 2^53 — both can re-order values,
    * so a "provably no match" from the child's stats would be wrong and
    * (per the file contract) silently lose rows in a mutation. Allowed:
    * integral→wider-integral, integral→decimal with enough integer
    * capacity, and decimal→decimal that widens both precision and scale
    * headroom. */
  private def orderPreservingCast(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (f, t) if integralDigits(f).isDefined && integralDigits(t).isDefined =>
        integralDigits(f).get <= integralDigits(t).get
      case (f, d: DecimalType) if integralDigits(f).isDefined =>
        d.scale >= 0 && (d.precision - d.scale) >= integralDigits(f).get
      case (df: DecimalType, dt: DecimalType) =>
        dt.scale >= df.scale &&
          (dt.precision - dt.scale) >= (df.precision - df.scale)
      case (FloatType, DoubleType) => true // exact widening
      // exact in the target's mantissa: |int| < 2^31 < 2^53, |short| < 2^24
      case (ByteType | ShortType | IntegerType, DoubleType) => true
      case (ByteType | ShortType, FloatType) => true
      case _ => false
    }

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.name)
    case a: AttributeReference => Some(a.name)
    // the attr can be read through a cast ONLY when the cast is injective
    // and order-preserving into the NumDomain (BigDecimal compare); any
    // other cast (narrowing, →float/double, date→timestamp, string→x)
    // changes the domain — stay conservative
    case c: Cast =>
      c.child match {
        case a: AttributeReference
            if orderPreservingCast(a.dataType, c.dataType) => Some(a.name)
        case _ => None // unknown/ineligible child type — conservative
      }
    case _ => None
  }

  /** The (column stats, domain, parsed bounds, literal) tuple for an
    * attr-vs-literal comparison; None = cannot reason, stay conservative. */
  private def comparison(a: Expression, l: Expression, fs: FileStats):
      Option[(ColStats, Domain, Option[Any], Option[Any], Any)] =
    for {
      name <- attrName(a)
      cs <- fs.cols.get(name)
      d <- domain(cs.typ)
      lit <- l match { case lt: Literal => Some(lt); case _ => None }
      v <- d.parseLit(lit)
    } yield (cs, d, cs.min.flatMap(d.parseStat), cs.max.flatMap(d.parseStat), v)

  /** All rows NULL ⇒ no comparison can ever be satisfied. */
  private def allNull(cs: ColStats, fs: FileStats): Boolean =
    fs.rows > 0 && cs.nulls >= fs.rows

  private def eval(e: Expression, fs: FileStats): Boolean = e match {
    case And(l, r) => eval(l, fs) && eval(r, fs)
    case Or(l, r) => eval(l, fs) || eval(r, fs)

    case EqualTo(a, Lit(l)) => evalCmp(a, l, fs, "eq")
    case EqualTo(Lit(l), a) => evalCmp(a, l, fs, "eq")
    case EqualNullSafe(a, Lit(l)) => evalCmp(a, l, fs, "eq")
    case EqualNullSafe(Lit(l), a) => evalCmp(a, l, fs, "eq")

    case LessThan(a, Lit(l)) => evalCmp(a, l, fs, "lt")
    case LessThan(Lit(l), a) => evalCmp(a, l, fs, "gt")
    case LessThanOrEqual(a, Lit(l)) => evalCmp(a, l, fs, "le")
    case LessThanOrEqual(Lit(l), a) => evalCmp(a, l, fs, "ge")
    case GreaterThan(a, Lit(l)) => evalCmp(a, l, fs, "gt")
    case GreaterThan(Lit(l), a) => evalCmp(a, l, fs, "lt")
    case GreaterThanOrEqual(a, Lit(l)) => evalCmp(a, l, fs, "ge")
    case GreaterThanOrEqual(Lit(l), a) => evalCmp(a, l, fs, "le")

    case In(a, list) if list.forall(Lit.unapply(_).isDefined) =>
      list.exists(l => evalCmp(a, Lit.unapply(l).get, fs, "eq"))
    case _: InSet =>
      // InSet literals are internal values without per-element Literal
      // wrappers; rebuilding them needs the attr type — conservative
      true

    case IsNull(a) =>
      (for { n <- attrName(a); cs <- fs.cols.get(n) } yield cs.nulls > 0)
        .getOrElse(true)
    case IsNotNull(a) =>
      (for { n <- attrName(a); cs <- fs.cols.get(n) } yield fs.rows > cs.nulls)
        .getOrElse(true)

    case Not(IsNull(a)) => eval(IsNotNull(a), fs)
    case Not(IsNotNull(a)) => eval(IsNull(a), fs)

    case StartsWith(a, Lit(l)) =>
      // strings starting with p form the range [p, p·maxChar∞); the file
      // range [mn, mx] intersects iff mx >= p (a prefix-extension of p is
      // itself >= p) and mn is not already past every p-prefixed string
      // (mn <= p, or mn itself starts with p)
      (for {
        (cs, d, mn, mx, v) <- comparison(a, l, fs)
        if d eq StrDomain
      } yield {
        if (allNull(cs, fs)) false
        else {
          val p = v.asInstanceOf[String]
          mx.forall(m => d.lteq(p, m)) &&
            mn.forall(m => d.lteq(m, p) || m.asInstanceOf[String].startsWith(p))
        }
      }).getOrElse(true)

    case Literal(v: Boolean, BooleanType) => v

    case _ => true
  }

  private def evalCmp(a: Expression, l: Literal, fs: FileStats,
      op: String): Boolean =
    comparison(a, l, fs).map { case (cs, d, mn, mx, v) =>
      if (allNull(cs, fs)) false
      else op match {
        // can some x in [mn, mx] satisfy (x op v)? missing bound = unbounded
        case "eq" => mn.forall(d.lteq(_, v)) && mx.forall(d.lteq(v, _))
        case "lt" => mn.forall(m => !d.lteq(v, m)) // possible iff min < v
        case "le" => mn.forall(d.lteq(_, v)) //      possible iff min <= v
        case "gt" => mx.forall(m => !d.lteq(m, v)) // possible iff max > v
        case "ge" => mx.forall(d.lteq(v, _)) //      possible iff max >= v
        case _ => true
      }
    }.getOrElse(true)
}
