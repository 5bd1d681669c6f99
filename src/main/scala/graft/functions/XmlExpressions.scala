package graft.functions

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Streaming (StAX pull-parser) XML extraction kernel — the production
  * swap for the `xpath_long` leg of q_xml_extract that BASELINE.md's
  * watch list called out: the built-in xpath family materializes a DOM
  * per row and evaluates a compiled XPath over it, which at 100 TB is
  * an allocation storm (the query's documented GC tail). The kernel
  * pull-parses forward, stops at the FIRST match, and allocates only
  * the matched element's text — no tree, early exit.
  *
  * Semantics pinned to `xpath_long(xml, '/ROOT/child')` on well-formed
  * documents (XmlKernelSpec): first direct child of the named root,
  * XPath-1.0 string-value (all descendant text, CDATA included,
  * entities resolved), converted by XPath number() rules — optional
  * sign, digits, optional fraction, NO exponent/hex/'+' — then
  * truncated to long; no match or non-numeric → 0. Malformed XML → 0
  * (the built-in throws; at ingest scale a bad row must score 0 and
  * flow to quarantine, not kill the job — divergence documented and
  * pinned, the engine's source-quarantine philosophy).
  */
object XmlKernels {
  private val factory = new ThreadLocal[XMLInputFactory] {
    override def initialValue(): XMLInputFactory = {
      val f = XMLInputFactory.newInstance()
      // merge CDATA/text so string-value assembly sees one event stream;
      // never resolve DTDs/external entities (ingest hardening)
      f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
      f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
        java.lang.Boolean.FALSE)
      f
    }
  }

  /** XPath-1.0 number() lexical space, truncated to long: `-?digits
    * (.digits?)? | -?.digits`; anything else (incl. exponents, '+',
    * 'Infinity', hex) is NaN → 0. */
  private def xpathNumberToLong(s: String): Long = {
    val t = s.trim
    var i = 0
    val n = t.length
    if (n == 0) return 0L
    if (t.charAt(i) == '-') i += 1
    var digits = 0
    while (i < n && t.charAt(i) >= '0' && t.charAt(i) <= '9') { i += 1; digits += 1 }
    var frac = 0
    if (i < n && t.charAt(i) == '.') {
      i += 1
      while (i < n && t.charAt(i) >= '0' && t.charAt(i) <= '9') { i += 1; frac += 1 }
    }
    if (i != n || digits + frac == 0) return 0L
    java.lang.Double.parseDouble(t).toLong
  }

  /** First `root/child` element's string-value as a long (see class
    * doc). `path` is `"ROOT/child"` — two segments, matching the only
    * xpath shape the engine emits (`/ROW/field` over to_xml output). */
  def firstLong(xml: UTF8String, path: UTF8String): Long = {
    val p = path.toString
    val slash = p.indexOf('/')
    if (slash <= 0 || slash == p.length - 1) return 0L
    val root = p.substring(0, slash)
    val child = p.substring(slash + 1)
    var reader: XMLStreamReader = null
    try {
      reader = factory.get()
        .createXMLStreamReader(new java.io.StringReader(xml.toString))
      var depth = 0
      while (reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            depth += 1
            if (depth == 1 && reader.getLocalName != root) return 0L
            if (depth == 2 && reader.getLocalName == child) {
              // XPath string-value: every descendant text node, in order
              val sb = new java.lang.StringBuilder
              var d = 1
              while (d > 0 && reader.hasNext) {
                reader.next() match {
                  case XMLStreamConstants.START_ELEMENT => d += 1
                  case XMLStreamConstants.END_ELEMENT => d -= 1
                  case XMLStreamConstants.CHARACTERS |
                       XMLStreamConstants.CDATA |
                       XMLStreamConstants.SPACE =>
                    sb.append(reader.getText)
                  case _ => ()
                }
              }
              return xpathNumberToLong(sb.toString)
            }
          case XMLStreamConstants.END_ELEMENT => depth -= 1
          case _ => ()
        }
      }
      0L
    } catch {
      case _: Exception => 0L // malformed row scores 0, never kills the job
    } finally if (reader != null) reader.close()
  }
}

/** SQL function `graft_xml_long(xml, 'ROOT/child')` (see
  * [[GraftExtensions]]) — [[XmlKernels.firstLong]] as a codegen
  * expression; interpreted eval and generated code share the one
  * static kernel (no interpreter/codegen skew). */
case class XmlFirstLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_xml_long expects (string, string), got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(xml: Any, path: Any): Any =
    XmlKernels.firstLong(xml.asInstanceOf[UTF8String],
      path.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, p) =>
      s"graft.functions.XmlKernels.firstLong($x, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
