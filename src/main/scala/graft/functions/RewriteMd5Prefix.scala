package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

/** Optimizer peephole: rewrite the built-ins-only composition
  *
  *   cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint)
  *
  * into the native [[Md5Prefix64]] expression. The two are semantically
  * identical (15 hex chars of an md5 digest always fit a signed long), but
  * the composition materializes a hex string and re-parses it per row while
  * the native form reads the digest bytes inside whole-stage codegen. With
  * this rule installed (via [[GraftExtensions]] or
  * `spark.experimental.extraOptimizations`), code written portably — e.g.
  * SQL text shared with another engine — gets the fast path automatically.
  */
object RewriteMd5Prefix extends Rule[LogicalPlan] {

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, _) => Some(v)
      case _ => None
    }
  }

  /** md5(stringCol) analyzes as Md5(Cast(stringCol as binary)) — unwrap
    * that implicit cast to recover the string child Md5Prefix64 expects. */
  private object Md5OfString {
    def unapply(e: Expression): Option[Expression] = e match {
      case Md5(Cast(inner, BinaryType, _, _)) if inner.dataType == StringType => Some(inner)
      case Md5(inner) if inner.dataType == StringType => Some(inner)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case c @ Cast(
            Conv(Substring(Md5OfString(child), IntLit(1), IntLit(15)), IntLit(16), IntLit(10), _),
            LongType, _, _) if c.dataType == LongType =>
        Md5Prefix64(child)
    }
}
