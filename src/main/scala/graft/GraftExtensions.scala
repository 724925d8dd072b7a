package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions so `spark.sql("... cosine_distance
  * (a, b) ...")` works on any session configured with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or programmatically via `SparkSession.builder().withExtensions`).
  * This is the (c)-tier extension hook from the build rules — the engine's
  * operators otherwise stay plain DataFrame transformations that Catalyst
  * already optimizes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import graft.functions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    def reg(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    reg("cosine_distance", es => CosineDistance(es.head, es(1)))
    reg("l2_distance", es => L2Distance(es.head, es(1)))
    reg("dot_product", es => DotProduct(es.head, es(1)))
    reg("l2_normalize", es => L2Normalize(es.head))
    reg("hamming_distance", es => HammingDistance(es.head, es(1)))
    reg("pack_bits", es => PackBits(es.head))
    reg("fp16_encode", es => Fp16Encode(es.head))
    reg("fp16_decode", es => Fp16Decode(es.head))
    // Curation scalar surface for the SQL-only user. The column-algebra
    // builders inject the exact Catalyst tree the DataFrame API produces
    // (its unresolved function nodes resolve in the analyzer fixpoint).
    import org.apache.spark.sql.graft.Bridge
    def regCol(name: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit =
      reg(name, es => Bridge.convertedExpression(f(Bridge.column(es.head))))
    regCol("fingerprint", TextAnalysis.fingerprint)
    regCol("quality_score", TextAnalysis.qualityScore)
    regCol("canonical_url", graft.operators.Dedup.canonicalizeUrl)
    // token count under the repo's shipped merge fixture — for a TRAINED
    // table use Bpe.tokenCount(model) from the DataFrame API (SQL
    // function signatures cannot carry a model object)
    reg("bpe_token_count", es => BpeTokenCount(es.head, Bpe.fixture))
    ext.injectPlannerStrategy(_ => graft.plans.KnnStrategy)
  }
}
