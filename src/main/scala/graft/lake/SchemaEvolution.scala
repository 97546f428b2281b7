package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Catalyst-driven schema evolution: merge an incoming batch schema into the
  * lake schema before MERGE (north-star requirement). Supported evolutions,
  * mirroring what a binlog/WAL tail needs in practice:
  *
  *   - column add (new columns become nullable in the lake schema)
  *   - type widen along the safe numeric ladder
  *     byte -> short -> int -> long, float -> double, and int/long -> double
  *
  * Anything else (narrowing, incompatible changes) fails fast — silent
  * coercion is how lakes rot.
  *
  * The reference has no schema system at all (bytes in, bytes out —
  * common/.../AlreadyBytesConverter.java:20-33); this module is where the
  * Spark-native engine goes beyond it, using public StructType/Column APIs
  * only (SURVEY.md §4 "expected custom bits" (b)).
  */
object SchemaEvolution {

  private val widenRank: Map[DataType, Int] = Map(
    ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3,
    FloatType -> 10, DoubleType -> 11)

  /** Widest common type, or None if the pair is not safely mergeable. */
  def widen(a: DataType, b: DataType): Option[DataType] = (a, b) match {
    case (x, y) if x == y => Some(x)
    case (x: NumericType, y: NumericType)
        if widenRank.contains(x) && widenRank.contains(y) =>
      // int-family × float-family meets at double (exact for int32, and the
      // standard lake choice for long; documented lossy > 2^53)
      val (rx, ry) = (widenRank(x), widenRank(y))
      if ((rx < 10) == (ry < 10)) Some(if (rx >= ry) x else y)
      else Some(DoubleType)
    case _ => None
  }

  /** Merge `incoming` into `current`: current column order first, appended
    * new columns after (stable order keeps old parquet readable and file
    * diffs reviewable).
    */
  def merge(current: StructType, incoming: StructType): StructType = {
    val byName = incoming.fields.map(f => f.name -> f).toMap
    val mergedExisting = current.fields.map { f =>
      byName.get(f.name) match {
        case None => f
        case Some(in) =>
          val t = widen(f.dataType, in.dataType).getOrElse(
            throw new IllegalArgumentException(
              s"incompatible schema change for column '${f.name}': " +
                s"${f.dataType.simpleString} vs ${in.dataType.simpleString}"))
          StructField(f.name, t, f.nullable || in.nullable)
      }
    }
    val curNames = current.fieldNames.toSet
    val added = incoming.fields.filterNot(f => curNames.contains(f.name))
      .map(f => f.copy(nullable = true)) // new columns are absent in old rows
    StructType(mergedExisting ++ added)
  }

  /** Project `df` onto `target`: cast widened columns, fill missing ones
    * with nulls, keep target order. Pure Column ops — stays inside
    * whole-stage codegen.
    */
  def align(df: DataFrame, target: StructType): DataFrame = {
    val have = df.schema.fieldNames.toSet
    df.select(target.fields.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }
}
