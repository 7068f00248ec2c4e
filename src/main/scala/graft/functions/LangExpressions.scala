package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Language-profile data shared by the heuristic identifier: small
  * character-trigram + function-word profiles per language.
  * Deliberately compact — the operator shape is the point; production
  * profiles drop in as data. */
object LangProfiles {
  val trigrams: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "he ", " th", "ing", "and", " an", "ion", " of", "of ", " to", "to ", "ed ", " is", "is "),
    "de" -> Seq("der", "er ", " de", "ein", " ei", "und", " un", "sch", "ich", "die", "ie ", "cht", "en ", "ung"),
    "fr" -> Seq("es ", " de", "de ", "le ", " le", "ent", "que", " qu", "ue ", "les", "la ", " la", "ion", "des"),
    "es" -> Seq(" de", "de ", "la ", " la", "que", " qu", "ue ", "el ", " el", "los", "ión", "ción", "ado", "es "))

  val functionWords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "an", "of", "and", "is", "to", "in", "it", "that"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist", "zu", "den", "von", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "des", "une", "dans", "pour"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "que", "una", "en", "por"))

  /** Languages in deterministic (alphabetical) order — the score-array
    * layout of [[LangScores]]. */
  val langs: Seq[String] = trigrams.keys.toSeq.sorted
}

/** Combined language-evidence scores for a text column: per language
  * (alphabetical order), (|distinct trigrams ∩ profile| / |profile| +
  * |distinct lowercased tokens ∩ function words| / |words|) / 2 —
  * numerically identical to the higher-order-function formulation it
  * replaces (distinct-set intersections, same divisions), computed in
  * one pass over the characters instead of materializing a trigram
  * array per document and intersecting it per profile. */
case class LangScores(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lang_scores requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "lang_scores"

  override def nullSafeEval(a: Any): Any = {
    val text = a.asInstanceOf[UTF8String].toString
    val out = LangScores.score(text)
    new GenericArrayData(out)
  }

  // single-pass JVM kernel behind a codegen shim (set lookups don't
  // benefit from inlined source)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("langScoresExpr", this)
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $expr.nullSafeEval($a);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangScores {
  private val langs = LangProfiles.langs
  private val triSets: Array[java.util.HashSet[String]] = langs.map { l =>
    val s = new java.util.HashSet[String](); LangProfiles.trigrams(l).foreach(s.add); s
  }.toArray
  private val wordSets: Array[java.util.HashSet[String]] = langs.map { l =>
    val s = new java.util.HashSet[String](); LangProfiles.functionWords(l).foreach(s.add); s
  }.toArray
  private val triSizes = langs.map(l => LangProfiles.trigrams(l).size.toDouble).toArray
  private val wordSizes = langs.map(l => LangProfiles.functionWords(l).size.toDouble).toArray

  def score(text: String): Array[Double] = {
    val k = langs.size
    val triHits = Array.ofDim[java.util.HashSet[String]](k)
    val wordHits = Array.ofDim[java.util.HashSet[String]](k)
    var i = 0
    while (i < k) {
      triHits(i) = new java.util.HashSet[String]()
      wordHits(i) = new java.util.HashSet[String]()
      i += 1
    }
    // distinct trigram hits, one pass over chars
    var p = 0
    val n = text.length
    while (p + 3 <= n) {
      val tg = text.substring(p, p + 3)
      i = 0
      while (i < k) { if (triSets(i).contains(tg)) triHits(i).add(tg); i += 1 }
      p += 1
    }
    // distinct lowercase-token hits, one pass over tokens
    val lower = text.toLowerCase
    var s0 = 0
    var q = 0
    val m = lower.length
    while (q <= m) {
      if (q == m || lower.charAt(q) == ' ') {
        if (q > s0) {
          val tok = lower.substring(s0, q)
          i = 0
          while (i < k) { if (wordSets(i).contains(tok)) wordHits(i).add(tok); i += 1 }
        }
        s0 = q + 1
      }
      q += 1
    }
    val out = Array.ofDim[Double](k)
    i = 0
    while (i < k) {
      out(i) = (triHits(i).size / triSizes(i) + wordHits(i).size / wordSizes(i)) / 2.0
      i += 1
    }
    out
  }
}

object langFunctions {
  def lang_scores(text: Column): Column =
    ColumnBridge.column(LangScores(ColumnBridge.expression(text)))
}
