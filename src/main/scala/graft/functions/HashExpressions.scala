package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native hash-sketch expressions. */
object HashExpressions {

  /** 64-bit SimHash over an array of (token) hashes: per-bit ±1 votes,
    * sign-packed. The nested higher-order formulation
    * (aggregate(zip_with(..., transform(sequence(0,63),...)))) builds a
    * 64-element array per token interpreted; this is the same
    * computation as two tight codegen loops. */
  case class ArraySimhash(child: Expression) extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"simhash expects array<bigint>, got $t")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val votes = new Array[Int](64)
      var i = 0
      while (i < x.numElements()) {
        val h = x.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        i += 1
      }
      var sig = 0L
      var b = 0
      while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
      sig
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val votes = ctx.freshName("votes")
        val i = ctx.freshName("i")
        val b = ctx.freshName("b")
        val h = ctx.freshName("h")
        val sig = ctx.freshName("sig")
        s"""
           |int[] $votes = new int[64];
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  long $h = $a.getLong($i);
           |  for (int $b = 0; $b < 64; $b++) {
           |    $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
           |  }
           |}
           |long $sig = 0L;
           |for (int $b = 0; $b < 64; $b++) {
           |  if ($votes[$b] > 0) $sig |= (1L << $b);
           |}
           |${ev.value} = $sig;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def simhash64(tokenHashes: Column): Column =
    ColumnBridge.column(ArraySimhash(ColumnBridge.expression(tokenHashes)))

  /** k-gram shingle hashes from an array of token hashes: shingle i is
    * the rotate-xor mix of token hashes i..i+k-1 (order-sensitive, no
    * string re-concatenation); arrays shorter than k yield one shingle
    * mixing all elements. */
  case class ArrayShingleHashes(child: Expression, k: Int) extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"shingle_hashes expects array<bigint>, got $t")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "shingle_hashes"

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      val m = math.max(n - k + 1, 1)
      val out = new Array[Long](m)
      var i = 0
      while (i < m) {
        var sh = 0L
        var j = 0
        while (j < k && i + j < n) {
          sh = java.lang.Long.rotateLeft(sh, 21) ^ x.getLong(i + j)
          j += 1
        }
        out(i) = sh
        i += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n"); val m = ctx.freshName("m")
        val out = ctx.freshName("out"); val i = ctx.freshName("i")
        val j = ctx.freshName("j"); val sh = ctx.freshName("sh")
        s"""
           |int $n = $a.numElements();
           |int $m = java.lang.Math.max($n - $k + 1, 1);
           |long[] $out = new long[$m];
           |for (int $i = 0; $i < $m; $i++) {
           |  long $sh = 0L;
           |  for (int $j = 0; $j < $k && $i + $j < $n; $j++) {
           |    $sh = java.lang.Long.rotateLeft($sh, 21) ^ $a.getLong($i + $j);
           |  }
           |  $out[$i] = $sh;
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** MinHash signature over an array of shingle hashes: for each seed,
    * the minimum of a murmur-finalizer permutation of every element.
    * One codegen loop — no explode, no per-permutation expression
    * duplication, no shuffle. (Java arithmetic wraps, so the 64-bit
    * mixing needs no ANSI workarounds.) */
  case class MinHashSignature(child: Expression, seeds: Seq[Long]) extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"minhash expects array<bigint>, got $t")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_signature"

    @inline private def mix(v: Long): Long = {
      var h = v
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
      h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
      h ^ (h >>> 33)
    }

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val mins = Array.fill(seeds.length)(Long.MaxValue)
      var i = 0
      while (i < x.numElements()) {
        val h = x.getLong(i)
        var p = 0
        while (p < seeds.length) {
          val v = mix(h ^ seeds(p))
          if (v < mins(p)) mins(p) = v
          p += 1
        }
        i += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(mins)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val seedsArr = ctx.addReferenceObj("seeds", seeds.toArray, "long[]")
        val mins = ctx.freshName("mins"); val i = ctx.freshName("i")
        val p = ctx.freshName("p"); val h = ctx.freshName("h"); val v = ctx.freshName("v")
        s"""
           |long[] $mins = new long[$seedsArr.length];
           |java.util.Arrays.fill($mins, Long.MAX_VALUE);
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  long $h = $a.getLong($i);
           |  for (int $p = 0; $p < $seedsArr.length; $p++) {
           |    long $v = $h ^ $seedsArr[$p];
           |    $v ^= $v >>> 33; $v *= 0xff51afd7ed558ccdL;
           |    $v ^= $v >>> 33; $v *= 0xc4ceb9fe1a85ec53L;
           |    $v ^= $v >>> 33;
           |    if ($v < $mins[$p]) $mins[$p] = $v;
           |  }
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($mins);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def shingle_hashes(tokenHashes: Column, k: Int): Column =
    ColumnBridge.column(ArrayShingleHashes(ColumnBridge.expression(tokenHashes), k))

  def minhash_signature(shingleHashes: Column, seeds: Seq[Long]): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(shingleHashes), seeds))
}
