package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_vec_normalize(vec)` — unit-normalize an `array<float|double>` to
  * `array<double>`; a zero vector passes through unchanged. The reference
  * unit-normalizes before k-means accumulation (app/core/indexes/ivf.py:162
  * `Xn = X / norm`) and on ingest (app/core/indexing.py:16-22,
  * "normalize-if-needed") — this is that kernel, codegen'd so it fuses into
  * the same whole-stage loop as the aggregate that consumes it.
  */
case class VecNormalize(child: Expression) extends UnaryExpression with Serializable {
  override def prettyName: String = "graft_vec_normalize"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private def et: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case other => other
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_vec_normalize expects array<float>/array<double>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Double](n)
    val isFloat = et == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = x; acc += x * x; i += 1
    }
    if (acc > 0.0) {
      val inv = 1.0 / math.sqrt(acc)
      i = 0
      while (i < n) { out(i) *= inv; i += 1 }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val out = ctx.freshName("out")
      val inv = ctx.freshName("inv")
      val getterStr = et match {
        case FloatType => s"(double) $a.getFloat($i)"
        case _ => s"$a.getDouble($i)"
      }
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $getterStr;
         |  $acc += $out[$i] * $out[$i];
         |}
         |if ($acc > 0.0) {
         |  double $inv = 1.0 / java.lang.Math.sqrt($acc);
         |  for (int $i = 0; $i < $n; $i++) { $out[$i] *= $inv; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** `graft_nearest_centroid(vec, centroid_matrix)` — argmax-cosine over a
  * FOLDABLE k×d centroid matrix; returns `struct<idx: int, sim: double>`
  * (ties → lowest index, matching `row_number() ... ORDER BY sim DESC, cid`).
  *
  * This is the IVF assignment kernel (reference: app/core/indexes/ivf.py:39-48
  * `_assign`, and the per-iteration argmax at ivf.py:167-171) as a MAP-ONLY
  * codegen'd expression: the matrix is materialized once per task from the
  * literal, centroid norms are precomputed, and assignment costs one fused
  * k×d loop per row with NO join, NO shuffle, NO aggregate. The round-1
  * formulation (crossJoin(broadcast(centroids)) + groupBy + TopK(1)) paid an
  * O(n)-row shuffle per k-means iteration for the same answer — at 100 TB
  * that shuffle was the entire training cost.
  */
case class NearestCentroid(left: Expression, right: Expression)
  extends BinaryExpression with Serializable {

  override def prettyName: String = "graft_nearest_centroid"
  override def dataType: DataType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("sim", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true

  private def et: DataType = left.dataType match {
    case ArrayType(t, _) => t
    case other => other
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val matOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (!vecOk) TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid expects an array<float>/array<double> vector, got ${left.dataType.catalogString}")
    else if (!matOk || !right.foldable) TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid expects a foldable array<array<double>> centroid matrix, got ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  /** Centroid matrix + precomputed L2 norms, evaluated once from the literal. */
  @transient private lazy val (mat: Array[Array[Double]], norms: Array[Double]) = {
    val ad = right.eval(null).asInstanceOf[ArrayData]
    val m = Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
    (m, m.map(c => math.sqrt(c.map(x => x * x).sum)))
  }

  private def score(a: ArrayData): (Int, Double) = {
    val isFloat = et == FloatType
    val n = a.numElements()
    var na = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      na += x * x; i += 1
    }
    val sqna = math.sqrt(na)
    var best = 0; var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < mat.length) {
      val cv = mat(c)
      if (cv.length != n)
        throw new IllegalArgumentException(
          s"graft_nearest_centroid: dimension mismatch ($n vs ${cv.length})")
      var dot = 0.0
      i = 0
      while (i < n) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        dot += x * cv(i); i += 1
      }
      val s = if (sqna == 0.0 || norms(c) == 0.0) 0.0 else dot / (sqna * norms(c))
      if (s > bestSim) { bestSim = s; best = c }
      c += 1
    }
    (best, bestSim)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (best, sim) = score(l.asInstanceOf[ArrayData])
    InternalRow(best, sim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val matRef = ctx.addReferenceObj("cmat", mat, "double[][]")
      val normRef = ctx.addReferenceObj("cnorm", norms, "double[]")
      val i = ctx.freshName("i"); val c = ctx.freshName("c"); val n = ctx.freshName("n")
      val na = ctx.freshName("na"); val x = ctx.freshName("x"); val dot = ctx.freshName("dot")
      val sqna = ctx.freshName("sqna"); val s = ctx.freshName("s")
      val best = ctx.freshName("best"); val bestSim = ctx.freshName("bestSim")
      val cv = ctx.freshName("cv")
      val getterStr = et match {
        case FloatType => s"(double) $a.getFloat($i)"
        case _ => s"$a.getDouble($i)"
      }
      s"""
         |int $n = $a.numElements();
         |double $na = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $getterStr;
         |  $na += $x * $x;
         |}
         |double $sqna = java.lang.Math.sqrt($na);
         |int $best = 0; double $bestSim = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $matRef.length; $c++) {
         |  double[] $cv = $matRef[$c];
         |  if ($cv.length != $n) {
         |    throw new IllegalArgumentException(
         |      "graft_nearest_centroid: dimension mismatch (" + $n + " vs " + $cv.length + ")");
         |  }
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ($getterStr) * $cv[$i];
         |  }
         |  double $s = ($sqna == 0.0 || $normRef[$c] == 0.0) ? 0.0 : $dot / ($sqna * $normRef[$c]);
         |  if ($s > $bestSim) { $bestSim = $s; $best = $c; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $best, $bestSim });
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** `graft_nearest_centroid_grouped(vec, group_key, map<long, matrix>)` —
  * per-GROUP argmax: each row's `group_key` (e.g. its library id, or a PQ
  * subspace index) selects which centroid matrix scores it, from a
  * FOLDABLE map literal of k×d matrices. Returns
  * `struct<idx: int, sim: double>` with `idx` the position INSIDE that
  * group's matrix (ties → lowest index). `l2 = false` scores by cosine;
  * `l2 = true` by NEGATED squared L2 (so "bigger is better" and the argmax
  * loop is shared — `sim` is then −‖v−c‖²).
  *
  * This is the grouped IVF-assignment kernel (reference: one
  * `app/core/indexes/ivf.py:39-48` `_assign` per library, looped library-
  * by-library at app/core/vector_db.py:272-292): all libraries assign in
  * ONE map-only scan — no join against a centroid table, no ×k row
  * amplification, no pre-aggregation shuffle. Driver state is
  * #groups × k × d doubles (libraries are few by definition; the corpus is
  * what's big). The map is decoded once per task into sorted key/matrix
  * arrays; per-row lookup is a binary search over #groups keys followed by
  * the same fused k×d loop as [[NearestCentroid]].
  */
case class NearestCentroidGrouped(first: Expression, second: Expression, third: Expression,
                                  l2: Boolean = false)
  extends TernaryExpression with Serializable {

  override def prettyName: String = "graft_nearest_centroid_grouped"
  override def dataType: DataType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("sim", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true

  private def et: DataType = first.dataType match {
    case ArrayType(t, _) => t
    case other => other
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = first.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val mapOk = third.dataType match {
      case MapType(LongType, ArrayType(ArrayType(DoubleType, _), _), _) => true
      case _ => false
    }
    if (!vecOk) TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid_grouped expects an array<float>/array<double> vector, got ${first.dataType.catalogString}")
    else if (second.dataType != LongType) TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid_grouped expects a bigint group key, got ${second.dataType.catalogString}")
    else if (!mapOk || !third.foldable) TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid_grouped expects a foldable map<bigint, array<array<double>>>, got ${third.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  /** Group keys (sorted for binary search) + aligned matrices and norms,
    * decoded once from the literal. */
  @transient private lazy val (keys: Array[Long], mats: Array[Array[Array[Double]]],
                               norms: Array[Array[Double]]) = {
    val md = third.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
    val ks = md.keyArray().toLongArray()
    val vs = Array.tabulate(md.numElements()) { i =>
      val m = md.valueArray().getArray(i)
      Array.tabulate(m.numElements())(j => m.getArray(j).toDoubleArray())
    }
    val order = ks.indices.sortBy(i => ks(i))
    val sk = order.map(i => ks(i)).toArray
    val sm = order.map(i => vs(i)).toArray
    (sk, sm, sm.map(_.map(c => math.sqrt(c.map(x => x * x).sum))))
  }

  override def nullSafeEval(v: Any, key: Any, m: Any): Any = {
    val g = java.util.Arrays.binarySearch(keys, key.asInstanceOf[Long])
    if (g < 0)
      throw new IllegalArgumentException(
        s"graft_nearest_centroid_grouped: no centroid matrix for group key $key")
    val a = v.asInstanceOf[ArrayData]
    val mat = mats(g); val nrm = norms(g)
    val isFloat = et == FloatType
    val n = a.numElements()
    // query norm feeds only the cosine branch — skip the extra vector pass
    // in L2 mode (this is the hot assignment kernel)
    var i = 0
    val sqna = if (l2) 0.0 else {
      var na = 0.0
      while (i < n) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        na += x * x; i += 1
      }
      math.sqrt(na)
    }
    var best = 0; var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < mat.length) {
      val cv = mat(c)
      if (cv.length != n)
        throw new IllegalArgumentException(
          s"graft_nearest_centroid_grouped: dimension mismatch ($n vs ${cv.length})")
      var s = 0.0
      if (l2) {
        var acc = 0.0
        i = 0
        while (i < n) {
          val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
          val d = x - cv(i); acc += d * d; i += 1
        }
        s = -acc
      } else {
        var dot = 0.0
        i = 0
        while (i < n) {
          val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
          dot += x * cv(i); i += 1
        }
        s = if (sqna == 0.0 || nrm(c) == 0.0) 0.0 else dot / (sqna * nrm(c))
      }
      if (s > bestSim) { bestSim = s; best = c }
      c += 1
    }
    InternalRow(best, bestSim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, key, _) => {
      val keysRef = ctx.addReferenceObj("gkeys", keys, "long[]")
      val matsRef = ctx.addReferenceObj("gmats", mats, "double[][][]")
      val normsRef = ctx.addReferenceObj("gnorms", norms, "double[][]")
      val g = ctx.freshName("g"); val mat = ctx.freshName("mat"); val nrm = ctx.freshName("nrm")
      val i = ctx.freshName("i"); val c = ctx.freshName("c"); val n = ctx.freshName("n")
      val na = ctx.freshName("na"); val x = ctx.freshName("x"); val dot = ctx.freshName("dot")
      val sqna = ctx.freshName("sqna"); val s = ctx.freshName("s")
      val best = ctx.freshName("best"); val bestSim = ctx.freshName("bestSim")
      val cv = ctx.freshName("cv")
      val getterStr = et match {
        case FloatType => s"(double) $a.getFloat($i)"
        case _ => s"$a.getDouble($i)"
      }
      val scoreCode =
        if (l2)
          s"""
             |  double $dot = 0.0;
             |  for (int $i = 0; $i < $n; $i++) {
             |    double $x = ($getterStr) - $cv[$i];
             |    $dot += $x * $x;
             |  }
             |  double $s = -$dot;
           """.stripMargin
        else
          s"""
             |  double $dot = 0.0;
             |  for (int $i = 0; $i < $n; $i++) {
             |    $dot += ($getterStr) * $cv[$i];
             |  }
             |  double $s = ($sqna == 0.0 || $nrm[$c] == 0.0) ? 0.0 : $dot / ($sqna * $nrm[$c]);
           """.stripMargin
      // query norm feeds only the cosine branch — don't emit the extra
      // vector pass in L2 mode (mirrors nullSafeEval)
      val normCode =
        if (l2) ""
        else
          s"""double $na = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double $x = $getterStr;
             |  $na += $x * $x;
             |}
             |double $sqna = java.lang.Math.sqrt($na);""".stripMargin
      s"""
         |int $g = java.util.Arrays.binarySearch($keysRef, $key);
         |if ($g < 0) {
         |  throw new IllegalArgumentException(
         |    "graft_nearest_centroid_grouped: no centroid matrix for group key " + $key);
         |}
         |double[][] $mat = $matsRef[$g];
         |double[] $nrm = $normsRef[$g];
         |int $n = $a.numElements();
         |$normCode
         |int $best = 0; double $bestSim = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $mat.length; $c++) {
         |  double[] $cv = $mat[$c];
         |  if ($cv.length != $n) {
         |    throw new IllegalArgumentException(
         |      "graft_nearest_centroid_grouped: dimension mismatch (" + $n + " vs " + $cv.length + ")");
         |  }
         |  $scoreCode
         |  if ($s > $bestSim) { $bestSim = $s; $best = $c; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $best, $bestSim });
       """.stripMargin
    })
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(f, s, t)
}
