package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a text: tokenize on whitespace (lowercased), xxhash64
  * each token, sum each bit position as ±1 over tokens, emit the sign
  * vector as a long. Single pass per row — a native expression because the
  * pure-Column formulation needs 64 aggregate() passes over the token
  * array. Codegen stays inside whole-stage via a static call, same pattern
  * as [[KvParse]].
  */
object SimHashHelper {
  final val Seed = 42L

  def tokenHash(token: String): Long =
    XXH64.hashUTF8String(UTF8String.fromString(token), Seed)

  /** Reference model + runtime implementation (one code path). */
  def simhash(text: String): Long = {
    val counts = new Array[Int](64)
    var any = false
    var start = 0
    val s = text.toLowerCase
    val len = s.length
    var i = 0
    while (i <= len) {
      if (i == len || Character.isWhitespace(s.charAt(i))) {
        if (i > start) {
          any = true
          val h = tokenHash(s.substring(start, i))
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    if (!any) 0L
    else {
      var out = 0L
      var b = 0
      while (b < 64) {
        if (counts(b) > 0) out |= (1L << b)
        b += 1
      }
      out
    }
  }

  /** Entry point referenced from generated code. */
  def eval(s: UTF8String): Long = simhash(s.toString)
}

case class SimHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHashHelper.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashHelper.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash(exprs.head), "scala_udf")
}
