package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the integer dot product of two
  * `array<bigint>` columns — the hot kernel of quantized-embedding
  * cosine similarity ([[graft.operators.SimilarityQueries]],
  * [[graft.operators.DedupQueries]] d05).
  *
  * The composable formulation `aggregate(zip_with(a, b, _*_), 0, _+_)`
  * is semantically identical but runs interpreted (higher-order
  * functions don't participate in whole-stage codegen) and allocates
  * an intermediate array per row; this expression generates a tight
  * JVM loop inline in the enclosing codegen stage. On a pairwise
  * similarity join the dot product executes O(pairs) times, so the
  * ~3-5x per-call difference is the whole query's bottleneck
  * (SURVEY §7.1 step 3's "custom Expression only if profiling
  * demands it" — profiling demanded it at sf0.1).
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  // inputs must be array<bigint>; ExpectsInputTypes would declare this
  // but AbstractDataType is private[sql] in Spark 4 — the engine's
  // call sites (LongDot.dot) only ever pass quantized long arrays
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_long_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += xs.getLong(i) * ys.getLong(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getLong($i) * $b.getLong($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}

object LongDot {
  private val name = "graft_long_dot"

  /** Idempotently register the function in the session (the engine's
    * operators call this so any externally-created SparkSession —
    * e.g. the driver's — gets the function without extensions
    * configuration; SparkSessionExtensions.injectFunction is the
    * spark-submit path). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name))) {
      registry.createOrReplaceTempFunction(name,
        (exprs: Seq[Expression]) => LongDotProduct(exprs(0), exprs(1)),
        "built-in")
    }
  }

  /** Codegen'd dot product column (register first via
    * [[ensureRegistered]]). */
  def dot(a: Column, b: Column): Column = call_function(name, a, b)
}
