package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions registering graft's native expressions with the
  * Catalyst function registry (activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions`).
  *
  * Only genuinely-custom kernels live here (SURVEY §7.3: everything else
  * in the surface is stock Catalyst); currently `graft_cosine`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineEntry)
  }
}

object GraftExtensions {

  private[graft] val cosineEntry = (
    new FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_cosine(a, b) takes two array arguments")
      CosineSimilarity(children.head, children(1)): Expression
    })

  /** Imperative fallback: register graft functions on a session that was
    * built without `spark.sql.extensions` (e.g. a host application's own
    * session handed to SparkEntry). Idempotent. */
  def ensure(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(cosineEntry._1)) {
      reg.registerFunction(cosineEntry._1, cosineEntry._2, cosineEntry._3)
    }
  }
}
