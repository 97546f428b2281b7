package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression for the engine's portable 60-bit hash:
  * the top 60 bits of md5(bytes) as a non-negative Long — the exact value of
  * `conv(substring(md5(x), 1, 15), 16, 10)::long` (DuckDB:
  * `('0x' || substr(md5(x), 1, 15))::BIGINT`), because the first 15 hex
  * chars of the digest ARE its first 8 bytes as a big-endian word shifted
  * right by one nibble.
  *
  * Why an Expression and not the composed column: the composed form
  * materializes a 32-char hex string per row, substrings it, and runs a
  * base-16 string-to-long conversion — three allocations and a parse for
  * what is one digest and one shift. This expression participates in
  * whole-stage codegen (doGenCode below), so the fused form inlines
  * straight into the generated row loop. It is the engine's one custom
  * Catalyst extension, used where the portable hash is hot (partition
  * derivation runs on every row of every CDC query).
  */
final case class Md5Long60(child: Expression) extends UnaryExpression {

  // input is always BinaryType: the only constructor path is the registry
  // builder below, which wraps the argument in Cast(_, BinaryType)
  require(!child.resolved || child.dataType == BinaryType,
    s"md5long60 requires binary input")
  override def dataType: DataType = LongType
  override def prettyName: String = "md5long60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Long60.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Long60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long60 =
    copy(child = newChild)
}

object Md5Long60 {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** top 60 bits of md5(bytes): big-endian long of digest[0..8) >>> 4 */
  def compute(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    val be =
      ((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) |
        ((h(2) & 0xffL) << 40) | ((h(3) & 0xffL) << 32) |
        ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
        ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
    be >>> 4
  }

  /** Idempotently register `md5long60` in the session's function registry
    * (strings are cast to their UTF-8 bytes, like Spark's own md5).
    */
  def register(spark: SparkSession): Unit = {
    // skip when already present: createOrReplace logs a "replaced a
    // previously registered function" WARN per call, and this runs on every
    // md5long60 column construction. A racing double-register is harmless
    // (same builder, createOrReplace is idempotent).
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("md5long60")))
      return
    reg.createOrReplaceTempFunction(
      "md5long60",
      (args: Seq[Expression]) => {
        if (args.length != 1) throw new IllegalArgumentException(
          s"md5long60 expects exactly 1 argument, got ${args.length}")
        Md5Long60(Cast(args.head, BinaryType))
      },
      "scala_udf")
  }

  /** Column API over the registered function. */
  def md5long60(c: Column): Column = {
    register(SparkSession.active)
    call_function("md5long60", c)
  }
}
