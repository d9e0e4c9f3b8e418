package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two array<double>
  * columns, with whole-stage codegen (doGenCode) — stays inside the
  * generated loop instead of falling back to interpreted higher-order
  * functions or a boxed Scala UDF.
  *
  * Accumulation is a single sequential pass (dot, |a|², |b|² in index
  * order), matching graft.ops.Similarity's kernels and the DuckDB
  * oracle's list_reduce folds bit-for-bit.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<double>, array<double>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"cosine_sim: vector lengths differ: ${x.length} vs ${y.length}")
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < x.length) {
      dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // read elements in place (UnsafeArrayData offset reads) — a
      // toDoubleArray() here would copy both vectors per EVALUATION,
      // gigabytes of allocation churn on a quadratic pair space
      val n = ctx.freshName("n"); val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "cosine_sim: vector lengths differ: " + $n + " vs " + $b.numElements());
         |}
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi;
         |  $nx += $xi * $xi;
         |  $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sequential-fold dot product of two array<double> columns, with
  * whole-stage codegen. Same accumulation order as [[CosineSimilarity]]
  * and the oracle's list_reduce. With per-row precomputed norms,
  * `dot_product(a,b)/(nrm_a*nrm_b)` gives bit-identical cosines to
  * [[CosineSimilarity]] at a third of the per-pair flops — the shape
  * that matters when the pair space is quadratic.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects (array<double>, array<double>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"dot_product: vector lengths differ: ${x.length} vs ${y.length}")
    var dot = 0.0; var i = 0
    while (i < x.length) { dot += x(i) * y(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // in-place element reads — see CosineSimilarity.doGenCode
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_product: vector lengths differ: " + $n + " vs " + $b.numElements());
         |}
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity over int8-QUANTIZED vectors (array<bigint>, the
  * output shape of Similarity.quantizeInt8), with whole-stage codegen.
  * Scale factors cancel in cosine, so quantized vectors score WITHOUT
  * dequantization: the accumulators are exact 64-bit integers (|q| ≤
  * 127 ⇒ no overflow below ~570M dims) — no float accumulation-order
  * concerns at all — and only the final divide is floating point.
  * This is the memory-bandwidth-optimal re-rank kernel: 8× less data
  * per vector than the double working form.
  */
case class QuantizedCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantized_cosine expects (array<bigint>, array<bigint>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quantized_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toLongArray()
    val y = b.asInstanceOf[ArrayData].toLongArray()
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"quantized_cosine: vector lengths differ: ${x.length} vs ${y.length}")
    var dot = 0L; var nx = 0L; var ny = 0L; var i = 0
    while (i < x.length) {
      dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
    }
    // an all-zero quantized vector (scale 0 in quantizeInt8) has no
    // direction: define its similarity as 0.0 rather than NaN (0/0),
    // so threshold filters drop it identically in both engines instead
    // of riding on NaN-comparison semantics
    if (nx == 0L || ny == 0L) 0.0
    else dot.toDouble / (math.sqrt(nx.toDouble) * math.sqrt(ny.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // in-place element reads — see CosineSimilarity.doGenCode
      val n = ctx.freshName("n"); val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "quantized_cosine: vector lengths differ: " + $n + " vs " + $b.numElements());
         |}
         |long $dot = 0L; long $nx = 0L; long $ny = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xi = $a.getLong($i);
         |  long $yi = $b.getLong($i);
         |  $dot += $xi * $yi;
         |  $nx += $xi * $xi;
         |  $ny += $yi * $yi;
         |}
         |${ev.value} = ($nx == 0L || $ny == 0L) ? 0.0 : ((double) $dot) /
         |  (java.lang.Math.sqrt((double) $nx) * java.lang.Math.sqrt((double) $ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session registration for graft's native SQL functions. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantized_cosine", exprs => QuantizedCosine(exprs(0), exprs(1)), "scala_udf")
  }

  /** Column API for the registered functions (register(spark) first). */
  def cosineSim(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)
  def dotProduct(a: Column, b: Column): Column =
    call_function("dot_product", a, b)
  def quantizedCosine(a: Column, b: Column): Column =
    call_function("quantized_cosine", a, b)
}
