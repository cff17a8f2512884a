package graft.text

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Porter2 (English Snowball) stemmer — the published successor of the
  * 1980 Porter algorithm (M.F. Porter, "Snowball: A language for stemming
  * algorithms", 2001; snowballstem.org/algorithms/english/stemmer.html),
  * implemented from the published rule description as a compiled kernel.
  *
  * Purpose (round-14 verdict item 7): NARROW the declared M1 fidelity gap
  * (reference `LDA_logic.py:246-261` uses spaCy `en_core_web_lg`
  * lemmatization, which needs a model we neither ship nor depend on).
  * The suffix-rule lemma-lite (`Tokenize.LemmaRules`) stays the
  * oracle-gated surface — it is DuckDB-replayable; Porter2 is the
  * published-algorithm upgrade for consumers that want real conflation
  * classes (`porter2_stem` on the SQL surface, engine-only: the
  * region-based algorithm has no tractable SQL twin). The quantitative
  * gap is measured by m_stem_agreement (token-level agreement vs
  * lemma-lite over the corpus) and Porter2Spec's golden/property suites.
  *
  * Everything below follows the published description exactly: R1/R2
  * vowel-consonant regions (with the gener/commun/arsen R1 exception),
  * y→Y consonant marking, steps 0-5 with longest-suffix-first matching,
  * the published exceptional forms, and words of ≤ 2 letters unchanged.
  */
object Porter2Kernel {

  private val exceptional: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    // invariants
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  private val exceptional2: Set[String] = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  private def isV(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  private val doubles = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val liEnding = "cdeghkmnrt"

  /** First position AFTER the first non-vowel following a vowel, scanning
    * `from`; the word length if no such pattern. */
  private def regionAfter(w: String, from: Int): Int = {
    var i = from
    while (i + 1 < w.length) {
      if (isV(w.charAt(i)) && !isV(w.charAt(i + 1))) return i + 2
      i += 1
    }
    w.length
  }

  private def r1Of(w: String): Int =
    if (w.startsWith("gener") || w.startsWith("arsen")) 5
    else if (w.startsWith("commun")) 6
    else regionAfter(w, 0)

  /** Ends in a short syllable: vowel + non-vowel(≠ w,x,Y) preceded by a
    * non-vowel; or a 2-letter word of vowel + non-vowel. `Y` is marked
    * uppercase (consonant) by the time this runs, and isV is
    * lowercase-only, so Y tests as a non-vowel automatically. */
  private def endsShort(w: String): Boolean = {
    val n = w.length
    if (n >= 3) {
      val c = w.charAt(n - 1)
      !isV(w.charAt(n - 3)) && isV(w.charAt(n - 2)) && !isV(c) &&
        c != 'w' && c != 'x' && c != 'Y'
    } else n == 2 && isV(w.charAt(0)) && !isV(w.charAt(1))
  }

  private def hasVowelBefore(w: String, end: Int): Boolean = {
    var i = 0
    while (i < end) { if (isV(w.charAt(i))) return true; i += 1 }
    false
  }

  private def markYs(w: String): String = {
    val sb = new java.lang.StringBuilder(w)
    if (sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    var i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && isV(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
      i += 1
    }
    sb.toString
  }

  def stem(word0: String): String = {
    var w = word0
    if (w.length < 3) return w
    if (w.charAt(0) == '\'') w = w.substring(1)
    exceptional.get(w) match {
      case Some(x) => return x
      case None => ()
    }
    if (w.length < 3) return w
    // mark consonant y as Y: at start, or after a vowel
    w = markYs(w)
    val r1 = r1Of(w)
    val r2 = regionAfter(w, r1)
    def inR1(suffix: Int): Boolean = w.length - suffix >= r1
    def inR2(suffix: Int): Boolean = w.length - suffix >= r2

    // step 0: longest of ' 's 's'
    if (w.endsWith("'s'")) w = w.dropRight(3)
    else if (w.endsWith("'s")) w = w.dropRight(2)
    else if (w.endsWith("'")) w = w.dropRight(1)

    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies"))
      w = if (w.length > 4) w.dropRight(2) else w.dropRight(1)
    else if (w.endsWith("us") || w.endsWith("ss")) ()
    else if (w.endsWith("s") && hasVowelBefore(w, w.length - 2))
      w = w.dropRight(1)

    if (exceptional2.contains(w)) return w.replace('Y', 'y')

    // step 1b — longest matching suffix governs
    val s1b = Seq("eedly", "ingly", "edly", "eed", "ing", "ed")
      .find(w.endsWith)
    s1b match {
      case Some(sfx @ ("eed" | "eedly")) =>
        if (inR1(sfx.length)) w = w.dropRight(sfx.length) + "ee"
      case Some(sfx) =>
        if (hasVowelBefore(w, w.length - sfx.length)) {
          w = w.dropRight(sfx.length)
          if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz"))
            w = w + "e"
          else if (w.length >= 2 && doubles.contains(w.substring(w.length - 2)))
            w = w.dropRight(1)
          else if (endsShort(w) && r1 >= w.length) w = w + "e"
        }
      case None => ()
    }

    // step 1c: y/Y → i after a non-vowel that is not the first letter
    if (w.length > 2) {
      val last = w.charAt(w.length - 1)
      if ((last == 'y' || last == 'Y') && !isV(w.charAt(w.length - 2)))
        w = w.dropRight(1) + "i"
    }

    // step 2 (suffix must lie in R1); longest match first
    val step2: Seq[(String, String)] = Seq(
      "ational" -> "ate", "ization" -> "ize", "fulness" -> "ful",
      "ousness" -> "ous", "iveness" -> "ive",
      "tional" -> "tion", "biliti" -> "ble", "lessli" -> "less",
      "entli" -> "ent", "ation" -> "ate", "alism" -> "al",
      "aliti" -> "al", "ousli" -> "ous", "iviti" -> "ive",
      "fulli" -> "ful", "enci" -> "ence", "anci" -> "ance",
      "abli" -> "able", "izer" -> "ize", "ator" -> "ate",
      "alli" -> "al", "bli" -> "ble", "ogi" -> "og", "li" -> "")
    step2.find { case (sfx, _) => w.endsWith(sfx) } match {
      case Some((sfx, rep)) if inR1(sfx.length) =>
        if (sfx == "ogi") {
          if (w.length > 3 && w.charAt(w.length - 4) == 'l')
            w = w.dropRight(3) + rep
        } else if (sfx == "li") {
          if (w.length > 2 && liEnding.indexOf(w.charAt(w.length - 3)) >= 0)
            w = w.dropRight(2)
        } else w = w.dropRight(sfx.length) + rep
      case _ => ()
    }

    // step 3 (suffix in R1; ative additionally in R2)
    val step3: Seq[(String, String)] = Seq(
      "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
      "icate" -> "ic", "iciti" -> "ic", "ative" -> "",
      "ical" -> "ic", "ness" -> "", "ful" -> "")
    step3.find { case (sfx, _) => w.endsWith(sfx) } match {
      case Some((sfx, rep)) if inR1(sfx.length) =>
        if (sfx == "ative") { if (inR2(5)) w = w.dropRight(5) }
        else w = w.dropRight(sfx.length) + rep
      case _ => ()
    }

    // step 4 (suffix in R2)
    val step4: Seq[String] = Seq(
      "ement", "ance", "ence", "able", "ible", "ment",
      "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
      "ion", "al", "er", "ic")
    step4.find(w.endsWith) match {
      case Some(sfx) if inR2(sfx.length) =>
        if (sfx == "ion") {
          val c = if (w.length > 3) w.charAt(w.length - 4) else ' '
          if (c == 's' || c == 't') w = w.dropRight(3)
        } else w = w.dropRight(sfx.length)
      case _ => ()
    }

    // step 5
    if (w.endsWith("e") &&
        (inR2(1) || (inR1(1) && !endsShort(w.dropRight(1)))))
      w = w.dropRight(1)
    else if (w.endsWith("l") && inR2(1) && w.length > 1 &&
        w.charAt(w.length - 2) == 'l')
      w = w.dropRight(1)

    w.replace('Y', 'y')
  }

  def stem(u: UTF8String): UTF8String = UTF8String.fromString(stem(u.toString))
}

/** `porter2_stem(token)` as a native codegen'd expression (same trade as
  * LemmaTokens: static kernel call, stays inside whole-stage codegen). */
case class Porter2Stem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "porter2_stem"
  override protected def nullSafeEval(input: Any): Any =
    Porter2Kernel.stem(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.Porter2Kernel.stem($c)")
  override protected def withNewChildInternal(newChild: Expression): Porter2Stem =
    copy(child = newChild)
}

object Porter2 {
  def porter2_stem(c: Column): Column =
    GraftSqlBridge.column(Porter2Stem(GraftSqlBridge.expression(c)))
}
