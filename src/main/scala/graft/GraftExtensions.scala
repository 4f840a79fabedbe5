package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{HashExpressions, VectorExpressions}

/** SparkSessionExtensions entry point — registers graft's native
  * expressions for SQL users at session build time:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.TopKPerKey.Strategy)
    e.injectOptimizerRule(_ => graft.plans.RewriteWindowTopK)
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo("graft", "vec_dot"),
      exprs => VectorExpressions.ArrayDotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("vec_norm_sq"),
      new ExpressionInfo("graft", "vec_norm_sq"),
      exprs => VectorExpressions.ArrayNormSq(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo("graft", "simhash64"),
      exprs => HashExpressions.ArraySimhash(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("md5_shingle_hashes"),
      new ExpressionInfo("graft", "md5_shingle_hashes"),
      exprs => HashExpressions.Md5ShingleHashes(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue)))
    e.injectFunction((
      FunctionIdentifier("affine_minhash"),
      new ExpressionInfo("graft", "affine_minhash"),
      exprs => {
        val params = graft.operators.Dedup.affineParams(
          exprs(1).eval().asInstanceOf[Number].intValue)
        HashExpressions.AffineMinHash(exprs(0), params.map(_._1), params.map(_._2))
      }))
  }
}
