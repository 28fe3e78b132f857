package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the graft SQL
  * functions so plain `spark.sql("SELECT graft_dot(a, b) ...")` works.
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *
  * (Column-API callers don't need this — graft.operators.Similarity
  * builds the expressions directly.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    // text kernels: int literals for k / shingle size / bits
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinhashSignature].getName, "graft_minhash_sig"),
      (children: Seq[Expression]) => MinhashSignature(children(0),
        intArg(children, 1, "numHashes"), intArg(children, 2, "shingleSize"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimHash(children(0),
        intArg(children, 1, "bits"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_srp_bucket"),
      new ExpressionInfo(classOf[SrpBucket].getName, "graft_srp_bucket"),
      (children: Seq[Expression]) => SrpBucket(children(0),
        intArg(children, 1, "planes"), intArg(children, 2, "dim"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_ngram_hashes"),
      new ExpressionInfo(classOf[NgramHashes].getName, "graft_ngram_hashes"),
      (children: Seq[Expression]) => NgramHashes(children(0),
        intArg(children, 1, "n"))))
  }

  private def intArg(children: Seq[Expression], i: Int, name: String): Int =
    children(i) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$name must be an integer literal, got $other")
    }
}
