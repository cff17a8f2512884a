package graft.text

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers referenced from generated code — must be stable, public,
  * and deterministic. */
object TextUtil {
  def nfkc(s: UTF8String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFKC))

  /** html.unescape-equivalent for the entity classes the reference's data
    * carries (wrangler.py:318): the 5 predefined XML entities, the common
    * named HTML entities, and decimal/hex numeric character references.
    * Single left-to-right pass — no double-unescaping of produced '&'. */
  def htmlUnescape(u: UTF8String): UTF8String = {
    val s = u.toString
    if (s.indexOf('&') < 0) return u
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          val repl: String =
            if (body.startsWith("#x") || body.startsWith("#X")) {
              try new String(Character.toChars(Integer.parseInt(body.substring(2), 16)))
              catch { case _: Exception => null }
            } else if (body.startsWith("#")) {
              try new String(Character.toChars(Integer.parseInt(body.substring(1))))
              catch { case _: Exception => null }
            } else named.getOrElse(body, null)
          if (repl != null) { out.append(repl); i = semi + 1 }
          else { out.append(c); i += 1 }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    UTF8String.fromString(out.toString)
  }

  private val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "rsquo" -> "’", "lsquo" -> "‘", "rdquo" -> "”",
    "ldquo" -> "“")
}

/** T2 `normalize_nfkc` (wrangler.py:318 `unicodedata.normalize("NFKC", s)`)
  * as a native Catalyst expression: null-safe, codegen'd via a static call —
  * stays inside WholeStageCodegen unlike a Scala UDF. */
case class NormalizeNFKC(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_nfkc"
  override protected def nullSafeEval(input: Any): Any =
    TextUtil.nfkc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextUtil.nfkc($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeNFKC =
    copy(child = newChild)
}

/** T1 `html_unescape` (wrangler.py:318 `html.unescape` per line) as a native
  * Catalyst expression (same rationale as NormalizeNFKC). */
case class HtmlUnescape(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "html_unescape"
  override protected def nullSafeEval(input: Any): Any =
    TextUtil.htmlUnescape(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextUtil.htmlUnescape($c)")
  override protected def withNewChildInternal(newChild: Expression): HtmlUnescape =
    copy(child = newChild)
}

/** Column-level API for the custom expressions. */
object TextFunctions {
  def normalize_nfkc(c: Column): Column =
    GraftSqlBridge.column(NormalizeNFKC(GraftSqlBridge.expression(c)))
  def html_unescape(c: Column): Column =
    GraftSqlBridge.column(HtmlUnescape(GraftSqlBridge.expression(c)))
}
