package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

import graft.avro.{AvroOcf, FromAvroOcf, ToAvroOcf}

/** Optimizer rule: `from_avro_ocf(to_avro_ocf(x, s), s)` -> `x`.
  *
  * The codec pair is a lossless round-trip by construction
  * (AvroCodecSpec property), so re-decoding bytes we just encoded is
  * dead work — this erases it at plan time (SURVEY.md §4 "optional
  * polish" row). Guarded on schema equality AND on the child's struct
  * type matching the decoder's output type exactly, so a widening or
  * field-reorder through the codec is never erased incorrectly.
  */
object CodecRoundTripElimination extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case from @ FromAvroOcf(ToAvroOcf(child, s1), s2) if s1 == s2 &&
        org.apache.spark.sql.types.DataType.equalsStructurally(
          child.dataType,
          AvroOcf.sparkTypeFor(new org.apache.avro.Schema.Parser().parse(s2)),
          ignoreNullability = true) =>
      child
    case other => other
  }
}

/** Session extensions: register the codec SQL functions and the
  * round-trip elimination rule. Activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => CodecRoundTripElimination)
    def litStr(x: org.apache.spark.sql.catalyst.expressions.Expression): String = x match {
      case Literal(s, StringType) if s != null => s.toString
      case other => throw new IllegalArgumentException(s"schema must be a string literal: $other")
    }
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("from_avro_ocf"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[FromAvroOcf].getName, "from_avro_ocf"),
      (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FromAvroOcf(es.head, litStr(es(1)))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("to_avro_ocf"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ToAvroOcf].getName, "to_avro_ocf"),
      (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ToAvroOcf(es.head, litStr(es(1)))))
  }
}
