package graft.ops

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.spec.Json

/** Native Catalyst expression for Jinja rendering — the one operator where a
  * custom `Expression` beats a Scala UDF (SURVEY §7.3): `doGenCode` emits a
  * direct call into [[renderRow]] on a referenced instance, so rendering
  * stays inside the whole-stage-codegen loop with no ScalaUDF
  * CatalystTypeConverters round-trip per argument. The template AST compiles
  * once per executor (transient lazy), not per row.
  *
  * `children` are the context columns (cast to string upstream), ordered to
  * match `names`; JSON-typed context values are parsed to maps/lists before
  * rendering.
  */
case class JinjaRenderExpression(
    template: String,
    names: Seq[String],
    jsonNames: Set[String],
    constants: Map[String, Any],
    maxLength: Option[Long],
    children: Seq[Expression]) extends Expression {

  require(names.length == children.length,
    s"${names.length} names for ${children.length} context columns")

  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  @transient private lazy val compiled = Template.compile(template)

  /** Called per row from both interpreted eval and generated code. `values`
    * are the context columns' string renderings (null-safe). Also the SINGLE
    * source of render semantics: the runner's constants-only branch calls
    * this with zero columns, so the two paths cannot drift. */
  def renderRow(values: Array[AnyRef]): UTF8String = {
    var ctx: Map[String, Any] = constants
    var i = 0
    while (i < names.length) {
      val s = if (values(i) == null) null else values(i).toString
      val v: Any =
        if (jsonNames(names(i)) && s != null) Json.toScala(Json.parse(s)) else s
      ctx = ctx.updated(names(i), v)
      i += 1
    }
    var out = Template.render(compiled, ctx)
    maxLength.foreach { m0 =>
      // truncate by CODE POINTS like the reference's python slice — a
      // UTF-16-unit substring could split a surrogate pair into invalid text
      val m = m0.toInt
      if (out.codePointCount(0, out.length) > m)
        out = out.substring(0, out.offsetByCodePoints(0, m))
    }
    UTF8String.fromString(out)
  }

  override def eval(input: InternalRow): Any = {
    val vals = new Array[AnyRef](children.length)
    var i = 0
    while (i < children.length) {
      vals(i) = children(i).eval(input).asInstanceOf[AnyRef]
      i += 1
    }
    renderRow(vals)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jinjaExpr", this, classOf[JinjaRenderExpression].getName)
    val arr = ctx.freshName("jinjaArgs")
    val evals = children.map(_.genCode(ctx))
    val fills = evals.zipWithIndex.map { case (e, i) =>
      code"""
        ${e.code}
        $arr[$i] = ${e.isNull} ? null : (Object) ${e.value};
      """
    }.reduceOption(_ + _).getOrElse(code"")
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        Object[] $arr = new Object[${children.length}];
        $fills
        $javaType ${ev.value} = $ref.renderRow($arr);
        boolean ${ev.isNull} = false;
      """,
      isNull = ev.isNull, value = ev.value)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
