package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd SimHash signature over a token array — the hot loop
  * of [[graft.operators.Dedup.simhashPairs]] as a Catalyst `Expression`.
  *
  * Bit-identical to the declarative form (Dedup.simhash): per token the
  * md5 hex digest's two 15-nibble halves become h1/h2 (lanes 0-31 vote
  * from h1, 32-63 from h2), votes accumulate ±1 per lane, and the sign
  * bits pack into one BIGINT. md5 keeps the signature engine-
  * deterministic, so the dedup_simhash DuckDB oracle remains a full hash
  * match with this expression in the plan (SimHashSigSpec asserts
  * equality against the declarative form). The declarative version is
  * ~6 interpreted expression nodes per (token × lane); this is one
  * static-kernel call per row inside whole-stage codegen. */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(input: Any): Any =
    SimHashKernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashKernel$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

/** The per-row kernel — a plain object so generated code can call it via
  * `MODULE$` without relying on static forwarders. */
object SimHashKernel {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit halves of the md5 digest, matching
    * `conv(substring(md5(t), 1, 15), 16, 10)` /
    * `conv(substring(md5(t), 16, 15), 16, 10)`:
    * h1 = hex nibbles 0-14, h2 = nibbles 15-29. */
  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var j = 0
    while (j < n) {
      val d = md.get()
      d.reset()
      val dig = d.digest(tokens.getUTF8String(j).getBytes)
      var h1 = 0L
      var k = 0
      while (k < 7) { h1 = (h1 << 8) | (dig(k) & 0xffL); k += 1 }
      h1 = (h1 << 4) | ((dig(7) >> 4) & 0xfL)
      var h2 = dig(7) & 0xfL
      k = 8
      while (k < 15) { h2 = (h2 << 8) | (dig(k) & 0xffL); k += 1 }
      var i = 0
      while (i < 32) {
        counts(i) += (((h1 >>> i) & 1L) * 2 - 1).toInt
        counts(i + 32) += (((h2 >>> i) & 1L) * 2 - 1).toInt
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}

object SimHashSig {
  /** Column wrapper: simhash of a token array (array<string>). */
  def signature(tokens: Column): Column =
    Shim.column(SimHashSig(Shim.expression(tokens)))
}
