package graft.core

import org.apache.spark.sql.types._

/** Function type of an operator — the reference's central semantic
  * invariant (reference: _internal/ops/op.py:13-16). Composition rules:
  * elementwise-of-aggregate is aggregate; elementwise-of-window is window;
  * aggregate-of-aggregate and window-inside-agg/window are errors
  * (reference: _internal/tree/col_expr.py:2478-2533).
  */
sealed trait FType
object FType {
  case object ElementWise extends FType
  case object Aggregate extends FType
  case object Window extends FType
}

/** Type utilities over Spark SQL types. The reference keeps its own scalar
  * type lattice (_internal/tree/types.py); Spark-first we reuse
  * [[org.apache.spark.sql.types.DataType]] directly and provide the
  * least-common-ancestor used for CASE branches and unions
  * (reference: types.py:189-235).
  */
object DTypes {
  val Int64: DataType = LongType
  val Float64: DataType = DoubleType

  /** Physical (runtime) Spark type of a graft dtype: [[EnumType]] and
    * [[UIntType]] exist only in the typing layer — Enum executes as
    * String, UInt as its signed carrier. */
  def physical(t: DataType): DataType = t match {
    case _: EnumType => StringType
    case u: UIntType => u.carrier
    case ArrayType(e, n) if physical(e) != e => ArrayType(physical(e), n)
    case t => t
  }

  /** UInt dissolves to its signed carrier for operator typing: unsigned
    * is a STORAGE/ingestion property (SURVEY §1.2), arithmetic and
    * aggregation compute — and type — as the carrier, exactly matching
    * the runtime schema (a deliberate, documented delta from the
    * reference, whose Polars backend keeps unsigned results). */
  def dissolveUInt(t: DataType): DataType = t match {
    case u: UIntType => u.carrier
    case t => t
  }

  def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  def isFloating(t: DataType): Boolean = t match {
    case FloatType | DoubleType => true
    case _ => false
  }
  def isNumeric(t: DataType): Boolean =
    isIntegral(t) || isFloating(t) || t.isInstanceOf[DecimalType]

  def isTimeLike(t: DataType): Boolean =
    t == TimestampType || t == TimestampNTZType || t == DateType

  def isComparable(t: DataType): Boolean = t match {
    case _ if isNumeric(t) => true
    case StringType | BooleanType | DateType | TimestampType |
        TimestampNTZType | _: DayTimeIntervalType => true
    case _: EnumType => true
    case _ => false
  }

  /** the exact decimal type covering an integral's range
    * (Spark's own forType mapping). */
  private def integralAsDecimal(t: DataType): DecimalType = t match {
    case ByteType => DecimalType(3, 0)
    case ShortType => DecimalType(5, 0)
    case IntegerType => DecimalType(10, 0)
    case _ => DecimalType(20, 0)
  }

  private def intRank(t: DataType): Int = t match {
    case ByteType => 1
    case ShortType => 2
    case IntegerType => 3
    case LongType => 4
    case _ => 0
  }

  /** Least common ancestor for branch/union typing
    * (reference: _internal/tree/types.py:189-235). Null converts to
    * anything (types.py:295-298); Int widens to Float.
    */
  def lca(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (NullType, y) => y
    case (x, NullType) => x
    // UInt family: widths unify upward (UInt8 ∪ UInt16 = UInt16,
    // reference types.py lattice); against any OTHER type a UInt acts
    // as its signed carrier (SURVEY §1.2 mapping)
    case (x: UIntType, y: UIntType) => if (x.bits >= y.bits) x else y
    case (x: UIntType, y) => lca(x.carrier, y)
    case (x, y: UIntType) => lca(x, y.carrier)
    // Enum/String family (reference types.py:201-206): identical enums
    // stay themselves (covered above); enum-vs-string and enum-vs-other-
    // enum widen to plain String
    case (_: EnumType, StringType) | (StringType, _: EnumType)
       | (_: EnumType, _: EnumType) => StringType
    case (x, y) if isIntegral(x) && isIntegral(y) =>
      if (intRank(x) >= intRank(y)) x else y
    case (x, y) if isFloating(x) && isFloating(y) =>
      if (x == DoubleType || y == DoubleType) DoubleType else FloatType
    case (x, y) if isIntegral(x) && isFloating(y) => DoubleType
    case (x, y) if isFloating(x) && isIntegral(y) => DoubleType
    // Decimal lca (reference types.py:208-216): widen to cover both the
    // integer part (max precision-scale) and the fractional part (max
    // scale); integrals enter as Decimal(p, 0) by their range
    case (x: DecimalType, y: DecimalType) =>
      val scale = math.max(x.scale, y.scale)
      val intPart = math.max(x.precision - x.scale, y.precision - y.scale)
      DecimalType(math.min(intPart + scale, DecimalType.MAX_PRECISION), scale)
    case (x: DecimalType, y) if isIntegral(y) => lca(x, integralAsDecimal(y))
    case (x, y: DecimalType) if isIntegral(x) => lca(integralAsDecimal(x), y)
    case (x: DecimalType, y) if isFloating(y) => DoubleType // Decimal→Float (0,1)
    case (x, y: DecimalType) if isFloating(x) => DoubleType
    case (DateType, TimestampType) | (TimestampType, DateType) => TimestampType
    case (DateType, TimestampNTZType) | (TimestampNTZType, DateType) => TimestampNTZType
    case (TimestampType, TimestampNTZType) | (TimestampNTZType, TimestampType) => TimestampType
    // Time unifies only with Time (reference types.py:292), widest precision
    case (x: TimeType, y: TimeType) =>
      if (x.precision >= y.precision) x else y
    case (x, y) =>
      throw new GraftTypeError(s"incompatible types $x and $y (no common supertype)")
  }

  def lcaAll(ts: Seq[DataType]): DataType = ts.reduceLeft(lca)
}

/** String restricted to a closed value set — the reference's `Enum`
  * scalar type (types.py; SURVEY §1.2 maps it to "String + check
  * constraint"). Lives purely in graft's typing layer: the runtime Spark
  * type is always String ([[DTypes.physical]]), the value set travels as
  * column metadata across verbs, membership is enforced on cast
  * (strict → raise, try_cast → null) and statically on literal
  * comparisons ([[graft.compile.Signatures]]). */
final case class EnumType(values: Seq[String]) extends DataType {
  require(values.nonEmpty, "EnumType: value set must be non-empty")
  require(values.distinct == values, "EnumType: duplicate values")
  require(values.forall(_ != null), "EnumType: null is not an enum value")
  override def defaultSize: Int = StringType.defaultSize
  override def asNullable: DataType = this
  override def typeName: String = "enum"
  override def simpleString: String = s"enum(${values.mkString(", ")})"
  override def sql: String = simpleString
  def contains(v: String): Boolean = values.contains(v)
}

/** Unsigned integer of `bits` ∈ {8, 16, 32, 64} — the reference's
  * UInt8..UInt64 scalars (types.py; SURVEY §1.2). Spark has no unsigned
  * types, so each width executes as the narrowest SIGNED carrier whose
  * range covers it: UInt8→Short, UInt16→Int, UInt32→Long,
  * UInt64→Decimal(20,0) — the same widening Spark itself applies when
  * reading parquet UINT_8/16/32/64 logical types, so unsigned columns
  * from a Polars-written parquet file ingest losslessly and can be
  * re-tagged by casting. Like [[EnumType]], UInt lives in graft's typing
  * layer: the runtime type is the carrier, range membership
  * [0, 2^bits) is enforced on cast (strict → raise, try_cast → null on
  * out-of-range), uint-ness travels as column metadata across verbs and
  * export, and operator typing dissolves to the carrier
  * ([[DTypes.dissolveUInt]]). */
final case class UIntType(bits: Int) extends DataType {
  require(bits == 8 || bits == 16 || bits == 32 || bits == 64,
    s"UIntType: bits must be 8, 16, 32 or 64 (got $bits)")
  def carrier: DataType = bits match {
    case 8 => ShortType
    case 16 => IntegerType
    case 32 => LongType
    case 64 => DecimalType(20, 0)
  }
  /** 2^bits − 1 as an exact decimal (UInt64's max exceeds Long). */
  def maxValue: java.math.BigDecimal =
    new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(bits)
      .subtract(java.math.BigInteger.ONE))
  override def defaultSize: Int = carrier.defaultSize
  override def asNullable: DataType = this
  override def typeName: String = s"uint$bits"
  override def simpleString: String = s"uint$bits"
  override def sql: String = s"UINT$bits"
}

object UIntType {
  private val MetaKey = "graft_uint_bits"
  /** Column-level metadata carrying the width — how uint-ness survives
    * projections/joins and export round-trips (same mechanism as
    * [[EnumType]]). */
  def toMetadata(u: UIntType): Metadata =
    new MetadataBuilder().putLong(MetaKey, u.bits.toLong).build()
  def fromMetadata(m: Metadata): Option[UIntType] =
    if (m.contains(MetaKey)) Some(UIntType(m.getLong(MetaKey).toInt))
    else None
}

object EnumType {
  private val MetaKey = "graft_enum_values"
  /** Column-level metadata carrying the value set — how enum-ness
    * survives projections/joins: Spark preserves field metadata on
    * pass-through columns. */
  def toMetadata(e: EnumType): Metadata =
    new MetadataBuilder().putStringArray(MetaKey, e.values.toArray).build()
  def fromMetadata(m: Metadata): Option[EnumType] =
    if (m.contains(MetaKey)) Some(EnumType(m.getStringArray(MetaKey).toSeq))
    else None
}

class GraftError(msg: String) extends RuntimeException(msg)
class GraftTypeError(msg: String) extends GraftError(msg)
class GraftColumnNotFoundError(msg: String) extends GraftError(msg)
class GraftFunctionTypeError(msg: String) extends GraftError(msg)
