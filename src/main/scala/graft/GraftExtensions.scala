package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}

import graft.functions.{CosineSimilarity, Md5Hash32, SortedIntersectSize}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions as SQL functions, so `spark.sql` users get the
  * same hot-path operators as the Column API
  * (`SELECT sorted_intersect_size(a, b)`, `SELECT cosine_similarity(v, q)`),
  * plus the [[graft.plans.IntervalJoinRewrite]] optimizer rule that
  * plans naive `|a − b| <= tol` theta-joins as bucketed equi-joins.
  *
  * Wire-up: `SparkSession.builder.withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.GraftExtensions` in config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.IntervalJoinRewrite)
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_size"),
      info("sorted_intersect_size",
        "sorted_intersect_size(a, b) - set-intersection size of two SORTED string arrays (duplicates count once)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "sorted_intersect_size takes exactly 2 arguments")
        // coerce like the Column API does — raw args of another array
        // type would make getUTF8String read garbage
        SortedIntersectSize(
          Cast(args(0), ArrayType(StringType)), Cast(args(1), ArrayType(StringType)))
      }: Expression))
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity",
        "cosine_similarity(a, b) - fused cosine similarity of two double arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_similarity takes exactly 2 arguments")
        // coerce to array<double>: float arrays (e.g. the embeddings
        // table) would otherwise be read through getDouble as garbage
        CosineSimilarity(
          Cast(args(0), ArrayType(DoubleType)), Cast(args(1), ArrayType(DoubleType)))
      }: Expression))
    ext.injectFunction((
      FunctionIdentifier("md5_hash32"),
      info("md5_hash32",
        "md5_hash32(s) - first 8 hex chars of md5(s) as a BIGINT in [0, 2^32) (the engine's portable hash)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "md5_hash32 takes exactly 1 argument")
        Md5Hash32(Cast(args(0), StringType))
      }: Expression))
  }
}
