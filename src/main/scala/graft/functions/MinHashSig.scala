package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd MinHash signature — the hot inner loop of
  * [[graft.operators.Dedup.minhashLshPairs]] as a single Catalyst
  * `Expression` with `doGenCode`.
  *
  * The declarative form (`aggregate` + `zip_with` over a 128-constant
  * array, Dedup.minhashSignature) is semantically identical but runs on
  * the interpreted higher-order-function path: ~6 expression-tree nodes
  * evaluated per (shingle × hash-function) pair. This expression compiles
  * the same math — h = XXH64(shingle) & 0xFFFFFFFF, then
  * sigᵢ = min(sigᵢ, (h·aᵢ mod p + bᵢ) mod p) over the same seeded
  * pairwise-independent (aᵢ, bᵢ) family — to two tight Java loops inside
  * whole-stage codegen. Same inputs, same signature, same LSH buckets:
  * MinHashSigSpec asserts bit-equality against the declarative form.
  *
  * Math stays in non-negative long range: h < 2³², aᵢ < p = 2³¹−1, so
  * h·aᵢ < 2⁶³ never overflows, and `%` equals `pmod`. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  private val P = MinHashSig.P

  // input contract: array<bigint> (hashed shingles) — enforced by the
  // typed call site (MinHashSig.signature); ExpectsInputTypes is
  // private[sql] surface we deliberately avoid
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val (aArr, bArr) = MinHashSig.constants(numHashes)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = XXH64.hashLong(arr.getLong(j), 42L) & 0xFFFFFFFFL
      var i = 0
      while (i < numHashes) {
        val v = ((h * aArr(i)) % P + bArr(i)) % P
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val sig = ctx.freshName("sig")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |int ${j}n = $c.numElements();
         |for (int $j = 0; $j < ${j}n; $j++) {
         |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($c.getLong($j), 42L) & 0xFFFFFFFFL;
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $v = (($h * $aRef[$i]) % ${P}L + $bRef[$i]) % ${P}L;
         |    if ($v < $sig[$i]) $sig[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** 2³¹ − 1 (Mersenne prime) — same modulus as Dedup.minhashSignature. */
  val P = 2147483647L

  /** The SAME seeded (aᵢ, bᵢ) family as Dedup.minhashSignature — both
    * forms must produce identical signatures (and so identical LSH
    * buckets). */
  def constants(numHashes: Int): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(42)
    val ab = Seq.fill(numHashes)(
      (1L + rnd.nextLong(P - 1), rnd.nextLong(P)))
    (ab.map(_._1).toArray, ab.map(_._2).toArray)
  }

  /** Column wrapper: minhash signature of an `array<bigint>` shingle set. */
  def signature(sh: Column, numHashes: Int): Column =
    Shim.column(MinHashSig(Shim.expression(sh), numHashes))
}
