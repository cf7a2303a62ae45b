package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two DOUBLE arrays.
  *
  * Preference order from the build guidance (compose built-ins > custom
  * Expression > custom plan > mapPartitions): the composed form
  * (`aggregate(zip_with(a, b, _*_), 0d, _+_) / (sqrt(...)*sqrt(...))`)
  * allocates an intermediate array per row and evaluates three lambda
  * chains; this expression does one fused loop, participates in whole-stage
  * codegen via doGenCode, and keeps the exact same left-to-right Double
  * summation order (so results stay bit-comparable with the SQL oracle's
  * list_dot_product).
  *
  * Reference analogue: terrier wires scalar functions as TPL builtins
  * compiled into the query (builtins.h); doGenCode is the Spark-native
  * equivalent.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    def ok(t: DataType) = t match {
      case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  // Semantics match the composed zip_with+aggregate form exactly:
  // mismatched lengths or a null element => NULL; zero norm => NULL.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      val anyNull = ctx.freshName("anyNull")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) { ${ev.isNull} = true; }
         |else {
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  boolean $anyNull = false;
         |  for (int $i = 0; $i < $n && !$anyNull; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; }
         |    else {
         |      double $xi = $a.getDouble($i);
         |      double $yi = $b.getDouble($i);
         |      $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |    }
         |  }
         |  double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |  if ($anyNull || $denom == 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $dot / $denom; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-level entry point: both inputs must be ARRAY<DOUBLE>. */
  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** SQL registration: SELECT cosine_similarity(a, b) ... */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity",
      exprs => {
        require(exprs.length == 2,
          s"cosine_similarity expects 2 arguments, got ${exprs.length}")
        CosineSimilarity(exprs(0), exprs(1))
      },
      "built-in")
}
