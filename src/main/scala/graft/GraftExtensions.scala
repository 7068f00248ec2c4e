package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers every graft native
  * function so ANY session — including one created by `spark-submit
  * --conf spark.sql.extensions=graft.GraftExtensions` or a thrift/
  * connect server — can call them from SQL without touching Scala.
  *
  * (The imperative alternative, [[graft.functions.vectorFunctions.register]],
  * stays for sessions that already exist.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two array<double>"),
      (es: Seq[Expression]) => functions.CosineSim(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two array<double>"),
      (es: Seq[Expression]) => functions.DotProduct(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("l2_norm"),
      info("l2_norm", "l2_norm(a) - L2 norm of an array<double>"),
      (es: Seq[Expression]) => functions.L2Norm(es.head)))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(hashes) - 64-bit SimHash of array<bigint> feature hashes"),
      (es: Seq[Expression]) => functions.SimHash64(es.head)))
    ext.injectFunction((FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints", "winnow_fingerprints(tokens) - winnowing fingerprints of array<string> (k=5, w=4)"),
      (es: Seq[Expression]) => functions.WinnowTokenFingerprints(es.head, 5, 4)))
    ext.injectFunction((FunctionIdentifier("m61_token_hashes"),
      info("m61_token_hashes", "m61_token_hashes(tokens) - Mersenne-61 polynomial hash per array<string> element"),
      (es: Seq[Expression]) => functions.M61TokenHashes(es.head)))
    ext.injectFunction((FunctionIdentifier("lang_scores"),
      info("lang_scores", "lang_scores(text) - language-profile evidence scores"),
      (es: Seq[Expression]) => functions.LangScores(es.head)))
    ext.injectFunction((FunctionIdentifier("word_ngrams"),
      info("word_ngrams", "word_ngrams(tokens, n) - distinct space-joined word n-grams of array<string>"),
      (es: Seq[Expression]) => functions.WordNGrams(es.head, es(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, org.apache.spark.sql.types.IntegerType) =>
          v.asInstanceOf[Int]
        case other => throw new IllegalArgumentException(
          s"word_ngrams(tokens, n): n must be an integer literal, got $other")
      })))
    ext.injectFunction((FunctionIdentifier("kgram_span_hashes"),
      info("kgram_span_hashes", "kgram_span_hashes(tokens, k) - all k-gram rolling span hashes of array<string>, in position order"),
      (es: Seq[Expression]) => functions.KgramSpanHashes(es.head, es(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, org.apache.spark.sql.types.IntegerType) =>
          v.asInstanceOf[Int]
        case other => throw new IllegalArgumentException(
          s"kgram_span_hashes(tokens, k): k must be an integer literal, got $other")
      })))
  }
}
