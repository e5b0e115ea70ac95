package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Deterministic "random" hyperplanes shared by the Scala expression and the
  * generated DuckDB oracle SQL.
  *
  * The reference draws Gaussian hyperplanes from a seeded NumPy RNG
  * (reference: app/core/indexes/lsh_simhash.py:45-47). For engine/oracle
  * bit-parity we instead derive plane weights from an integer LCG — exact in
  * both systems: `lcg(x) = ((1103515245·x + 12345) mod 2^31) / 2^31 − 0.5`.
  * The division is by a power of two, so every weight is an exact double;
  * products/sums then round identically in any IEEE-754 engine.
  */
object LcgPlanes {
  val A = 1103515245L
  val C = 12345L
  val M = 2147483648L // 2^31

  @inline def value(x: Long): Double = ((A * x + C) % M).toDouble / M.toDouble - 0.5

  /** Flat [tables × bits × dim] plane matrix. */
  def planes(nTables: Int, nBits: Int, dim: Int, seed: Long): Array[Double] = {
    val out = new Array[Double](nTables * nBits * dim)
    var x = 0
    while (x < out.length) { out(x) = value(seed + x); x += 1 }
    out
  }

  /** DuckDB expression for the same plane weight at flat offset `off + i`
    * with `i` the comprehension variable. */
  def sqlWeight(off: Long): String =
    s"(((${A}*(${off} + i) + ${C}) % ${M})/${M}.0 - 0.5)"
}

/** `graft_simhash_keys(vec)` → `array<bigint>` of one SimHash key per table.
  *
  * Key for table t = Σ_j 2^j · [⟨plane(t,j,·), v⟩ ≥ 0] — the reference's
  * sign-of-random-projection hash (reference: app/core/indexes/
  * lsh_simhash.py:52-58), computed as a codegen'd expression: the plane
  * matrix rides along as a reference object, the per-row work is a fused
  * tables×bits×dim loop, and nothing leaves WholeStageCodegen.
  */
case class SimhashKeys(child: Expression, nTables: Int, nBits: Int, seed: Long)
  extends UnaryExpression with Serializable {

  override def prettyName: String = "graft_simhash_keys"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_keys expects array<float>/array<double>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val keys = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var key = 0L
      var j = 0
      while (j < nBits) {
        val off = seed + (t.toLong * nBits + j) * dim
        var dot = 0.0
        var i = 0
        while (i < dim) {
          val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          dot += LcgPlanes.value(off + i) * x
          i += 1
        }
        if (dot >= 0.0) key |= (1L << j)
        j += 1
      }
      keys(t) = key
      t += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val getter = if (isFloat) s"(double) $a.getFloat(%s)" else s"$a.getDouble(%s)"
      val dim = ctx.freshName("dim"); val keys = ctx.freshName("keys")
      val t = ctx.freshName("t"); val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val key = ctx.freshName("key"); val off = ctx.freshName("off")
      val lcgA = LcgPlanes.A; val lcgC = LcgPlanes.C; val lcgM = LcgPlanes.M
      s"""
         |int $dim = $a.numElements();
         |long[] $keys = new long[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  long $key = 0L;
         |  for (int $j = 0; $j < $nBits; $j++) {
         |    long $off = ${seed}L + ((long) $t * $nBits + $j) * $dim;
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $dot += ((double)((${lcgA}L * ($off + $i) + ${lcgC}L) % ${lcgM}L) / ${lcgM}.0 - 0.5)
         |        * (${getter.format(i)});
         |    }
         |    if ($dot >= 0.0) $key |= (1L << $j);
         |  }
         |  $keys[$t] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
