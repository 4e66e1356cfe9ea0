package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-stage-codegen'd whitespace token count over UTF8String bytes.
  *
  * Semantics: token count = number of maximal runs of non-whitespace, with
  * whitespace = the RE2 \s class [\t\n\f\r ] (see NativeKernels.isWsByte),
  * i.e. exactly `len(regexp_extract_all(text, '\S+'))` in DuckDB. Blank
  * input counts 0 (the `split` idiom would return 1 there); NULL input
  * null-propagates to NULL, like every Catalyst null-safe expression — SQL
  * surfaces that need 0-for-null wrap it in coalesce. Counting runs directly
  * over the UTF-8 bytes with no Pattern, no String materialization and no
  * array allocation: the whitespace class is pure ASCII, and UTF-8
  * continuation/lead bytes of multibyte code points are never ASCII, so a
  * byte-level scan is exact.
  *
  * This is the preference-order (b) path of the engine contract — a native
  * Catalyst Expression with `doGenCode` where a UDF would break whole-stage
  * codegen. Registered for SQL via [[graft.plans.GraftExtensions]] (the
  * `spark.sql.extensions` production route) or
  * [[NativeFunctions.ensureRegistered]] (works on any already-built session).
  */
case class WsTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ws_token_count requires STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ws_token_count"

  override protected def nullSafeEval(input: Any): Any =
    NativeKernels.wsTokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeKernels.wsTokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): WsTokenCount =
    copy(child = newChild)
}

/** Codegen'd float-vector dot product: sum over index order of
  * double-promoted elementwise products — bit-identical to the
  * `aggregate(zip_with(a, b, (x, y) -> double(x)*double(y)), 0d, +)` HOF
  * chain (and to DuckDB's ordered list_sum) INCLUDING null semantics:
  * mismatched lengths or a null element yield NULL, exactly as zip_with's
  * null padding / null-product poisoning would. Higher-order functions are
  * CodegenFallback in Spark — on an all-pairs similarity join this
  * expression is the difference between interpreted and compiled inner
  * loops. Norm = sqrt(dot(a, a)).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_vec_dot requires ARRAY<FLOAT> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "float_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeKernels.floatVecDotOrNull(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.NativeKernels.floatVecDotOrNull($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Static kernels referenced from generated code (must be stable, public,
  * and JVM-static-reachable from the codegen'd class).
  */
object NativeKernels {

  /** Dot product with the HOF chain's null semantics: null when lengths
    * differ (zip_with null padding) or any element is null (null product
    * poisons the running sum). Null-slot probing is a bitset read on
    * UnsafeArrayData — negligible next to the multiply-adds.
    */
  def floatVecDotOrNull(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Whitespace class = RE2/DuckDB `\s` = [\t\n\f\r ]. Deliberately EXCLUDES
    * \x0B (which Java's regex \s includes) so the kernel agrees byte-for-byte
    * with the DuckDB `\S+` oracle; texts are vertical-tab-free in practice,
    * and the oracle's class is the documented contract.
    */
  @inline private def isWsByte(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\f' || b == '\r'

  def wsTokenCount(s: UTF8String): Int = {
    if (s == null) return 0
    val n = s.numBytes()
    var count = 0
    var i = 0
    while (i < n) {
      while (i < n && isWsByte(s.getByte(i))) i += 1
      if (i < n) { count += 1; while (i < n && !isWsByte(s.getByte(i))) i += 1 }
    }
    count
  }
}

/** Session-level registration helpers for the native expression library. */
object NativeFunctions {

  /** Idempotently register the native functions on an existing session —
    * covers harnesses that build the SparkSession without
    * `spark.sql.extensions` wired.
    */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ws_token_count", exprs => WsTokenCount(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_vec_dot", exprs => FloatVecDot(exprs.head, exprs(1)), "scala_udf")
  }
}
