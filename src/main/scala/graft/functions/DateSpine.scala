package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, DateAdd,
  Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Range}
import org.apache.spark.sql.types.{DateType, IntegerType}

/** `graft_dates(start, end)` — a TABLE-VALUED function producing one row
  * per calendar date in [start, end]: the date spine every gap-fill /
  * resample / as-of scaffold needs, as a first-class FROM-clause source
  * (`SELECT d FROM graft_dates('2024-01-01', '2024-03-31')`) instead of
  * the `sequence()+explode` idiom buried in a subquery.
  *
  * This is the TVF extension point (`injectTableFunction`): the builder
  * receives the call's argument EXPRESSIONS at resolution time and
  * returns a LogicalPlan. The plan here is a Project over Spark's own
  * `Range` node — so the spine inherits Range's splittable, codegen'd,
  * statistics-bearing scan (a 100-year spine is 36k rows split across
  * tasks, never a driver-side collection), and each date is just
  * `date_add(start, id)` on the codegen path.
  */
object DateSpine {

  private def asDateDays(e: Expression, arg: String): Int = {
    val c = Cast(e, DateType)
    require(c.foldable, s"graft_dates: $arg must be a literal date")
    c.eval() match {
      case i: java.lang.Integer => i.intValue()
      case _ =>
        throw new IllegalArgumentException(
          s"graft_dates: $arg is not a valid date")
    }
  }

  val registration: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("graft_dates"),
    new ExpressionInfo(DateSpine.getClass.getName, "graft_dates"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_dates takes (start_date, end_date)")
      val s = asDateDays(args(0), "start_date")
      val e = asDateDays(args(1), "end_date")
      require(e >= s, s"graft_dates: end_date before start_date")
      val range = Range(0L, (e - s + 1).toLong, 1L, None)
      Project(Seq(Alias(
        DateAdd(Literal(s, DateType), Cast(range.output.head, IntegerType)),
        "d")()), range)
    })
}
