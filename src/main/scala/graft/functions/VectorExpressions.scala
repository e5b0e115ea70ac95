package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for dense-vector math over `array<float>` /
  * `array<double>` columns.
  *
  * Spark-first re-expression of the reference's NumPy similarity kernels
  * (reference: app/core/similarity_metrics.py:16-54). Implemented as
  * `BinaryExpression`s with `doGenCode` so they stay inside
  * WholeStageCodegen — no UDF serialization, no boxing, a tight
  * primitive loop per row. At 100 TB this is the hot path of every kNN /
  * similarity-join scan, so the per-row cost is just the fused loop.
  *
  * All accumulation is in `double` regardless of input element type so the
  * DuckDB oracle (which computes on `DOUBLE[]`) agrees bit-for-bit to ~1e-15.
  *
  * Dimension mismatch THROWS (like the reference's FlatIndex dim check and
  * DuckDB's list_cosine_similarity) — silently computing over the common
  * prefix would let malformed data diverge from both.
  */
abstract class VectorBinaryOp extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  protected def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => other
  }

  @inline protected final def checkedLen(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"$prettyName: vector dimension mismatch ($n vs ${b.numElements()})")
    n
  }

  /** Codegen snippet declaring `int $n` = checked common length. */
  protected final def lenCheck(a: String, b: String, n: String): String =
    s"""int $n = $a.numElements();
       |if ($b.numElements() != $n) {
       |  throw new IllegalArgumentException(
       |    "$prettyName: vector dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
       |}""".stripMargin

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>/array<double> inputs, " +
        s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  @inline protected final def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  /** Java accessor snippet for codegen. */
  protected final def getter(v: String, i: String, t: DataType): String = t match {
    case FloatType => s"(double) $v.getFloat($i)"
    case _ => s"$v.getDouble($i)"
  }
}

/** Inner product <a, b>. */
case class VecDot(left: Expression, right: Expression) extends VectorBinaryOp {
  override def prettyName: String = "graft_dot"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = checkedLen(a, b)
    val (ta, tb) = (elemType(left), elemType(right))
    var acc = 0.0; var i = 0
    while (i < n) { acc += get(a, i, ta) * get(b, i, tb); i += 1 }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      s"""
         |${lenCheck(a, b, n)}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (${getter(a, i, elemType(left))}) * (${getter(b, i, elemType(right))});
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Cosine similarity; 0.0 when either norm is 0 (reference:
  * app/core/similarity_metrics.py:29-30). */
case class VecCosine(left: Expression, right: Expression) extends VectorBinaryOp {
  override def prettyName: String = "graft_cosine"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = checkedLen(a, b)
    val (ta, tb) = (elemType(left), elemType(right))
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = get(a, i, ta); val y = get(b, i, tb)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |${lenCheck(a, b, n)}
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${getter(a, i, elemType(left))};
         |  double $y = ${getter(b, i, elemType(right))};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Euclidean (L2) distance. */
case class VecL2(left: Expression, right: Expression) extends VectorBinaryOp {
  override def prettyName: String = "graft_l2"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = checkedLen(a, b)
    val (ta, tb) = (elemType(left), elemType(right))
    var acc = 0.0; var i = 0
    while (i < n) { val d = get(a, i, ta) - get(b, i, tb); acc += d * d; i += 1 }
    math.sqrt(acc)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |${lenCheck(a, b, n)}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (${getter(a, i, elemType(left))}) - (${getter(b, i, elemType(right))});
         |  $acc += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Manhattan (L1) distance. */
case class VecManhattan(left: Expression, right: Expression) extends VectorBinaryOp {
  override def prettyName: String = "graft_manhattan"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = checkedLen(a, b)
    val (ta, tb) = (elemType(left), elemType(right))
    var acc = 0.0; var i = 0
    while (i < n) { acc += math.abs(get(a, i, ta) - get(b, i, tb)); i += 1 }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      s"""
         |${lenCheck(a, b, n)}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Math.abs((${getter(a, i, elemType(left))}) - (${getter(b, i, elemType(right))}));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** L2 norm of a single vector (reference: app/core/indexing.py:16-22). */
case class VecNorm(child: Expression) extends UnaryExpression with Serializable {
  override def prettyName: String = "graft_norm"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  private def et: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case other => other
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_norm expects array<float>/array<double>, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var acc = 0.0; var i = 0
    val t = et
    while (i < a.numElements()) {
      val x = t match { case FloatType => a.getFloat(i).toDouble; case _ => a.getDouble(i) }
      acc += x * x; i += 1
    }
    math.sqrt(acc)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc"); val x = ctx.freshName("x")
      val getterStr = et match {
        case FloatType => s"(double) $a.getFloat($i)"
        case _ => s"$a.getDouble($i)"
      }
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $x = $getterStr;
         |  $acc += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** `graft_sq8_encode(vec)` — symmetric per-vector int8 scalar quantization:
  * `q_i = floor(x_i · 127/max|x| + ½)` as `array<tinyint>` (the v17 index
  * build kernel, one fused two-pass loop per row instead of the chained
  * HOF formulation whose collapsed projection re-evaluated the max|x|
  * subtree per element). A zero vector has no quantizable signal and
  * yields NULL — the build filters those rows, matching the oracle's
  * `WHERE maxabs > 0`. Double arithmetic with explicit floor(x+0.5), so
  * any engine reproduces the grid bit-for-bit. */
case class Sq8Encode(child: Expression) extends UnaryExpression with Serializable {
  override def prettyName: String = "graft_sq8_encode"
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def et: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case other => other
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_sq8_encode expects array<float>/array<double>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val isFloat = et == FloatType
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val ax = math.abs(x)
      if (ax > maxabs) maxabs = ax
      i += 1
    }
    if (maxabs == 0.0) null
    else {
      val s = 127.0 / maxabs
      val out = new Array[Byte](n)
      i = 0
      while (i < n) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        out(i) = math.floor(x * s + 0.5).toByte
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val maxabs = ctx.freshName("maxabs"); val x = ctx.freshName("x")
      val s = ctx.freshName("s"); val out = ctx.freshName("out")
      val getterStr = et match {
        case FloatType => s"(double) $a.getFloat($i)"
        case _ => s"$a.getDouble($i)"
      }
      s"""
         |int $n = $a.numElements();
         |double $maxabs = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = java.lang.Math.abs($getterStr);
         |  if ($x > $maxabs) { $maxabs = $x; }
         |}
         |if ($maxabs == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 127.0 / $maxabs;
         |  byte[] $out = new byte[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = (byte) java.lang.Math.floor(($getterStr) * $s + 0.5);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
