package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

import graft.functions._

/** Session bootstrap: registers the graft native functions so both the
  * DataFrame API (via [[call_function]]) and `spark.sql` can use them.
  * Idempotent per session.
  */
object Graft {
  private val initialized = ConcurrentHashMap.newKeySet[Int]()

  def init(spark: SparkSession): SparkSession = {
    if (initialized.add(System.identityHashCode(spark.sessionState))) {
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction("graft_dot", es => VecDot(es(0), es(1)), "built-in")
      reg.createOrReplaceTempFunction("graft_cosine", es => VecCosine(es(0), es(1)), "built-in")
      reg.createOrReplaceTempFunction("graft_l2", es => VecL2(es(0), es(1)), "built-in")
      reg.createOrReplaceTempFunction("graft_manhattan", es => VecManhattan(es(0), es(1)), "built-in")
      reg.createOrReplaceTempFunction("graft_norm", es => VecNorm(es(0)), "built-in")
      reg.createOrReplaceTempFunction("graft_topk",
        es => TopKAgg(es(0), es(1), es(2), es(3)), "built-in")
      reg.createOrReplaceTempFunction("graft_vecsum", es => VecSumAgg(es(0)), "built-in")
      reg.createOrReplaceTempFunction("graft_simhash_keys",
        es => SimhashKeys(es(0),
          litInt(es(1), "nTables"), litInt(es(2), "nBits"), litLong(es(3), "seed")), "built-in")
    }
    spark
  }

  // Column-API sugar over the registered functions.
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)
  def l2(a: Column, b: Column): Column = call_function("graft_l2", a, b)
  def manhattan(a: Column, b: Column): Column = call_function("graft_manhattan", a, b)
  def norm(a: Column): Column = call_function("graft_norm", a)
  def topk(score: Column, id: Column, k: Column, smallestFirst: Column): Column =
    call_function("graft_topk", score, id, k, smallestFirst)
  def vecsum(v: Column): Column = call_function("graft_vecsum", v)
  def simhashKeys(v: Column, nTables: Int, nBits: Int, seed: Long): Column =
    call_function("graft_simhash_keys", v,
      org.apache.spark.sql.functions.lit(nTables),
      org.apache.spark.sql.functions.lit(nBits),
      org.apache.spark.sql.functions.lit(seed))

  private def litInt(e: org.apache.spark.sql.catalyst.expressions.Expression, name: String): Int =
    e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"$name must be an int literal, got $other")
    }
  private def litLong(e: org.apache.spark.sql.catalyst.expressions.Expression, name: String): Long =
    e.eval(null) match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(s"$name must be a long literal, got $other")
    }
}
