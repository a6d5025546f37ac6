package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extensions installer for the graft SQL surface:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * registers every custom function ([[Functions.sqlBuilders]]) on each
  * new SparkSession cluster-wide — no driver-side
  * `Functions.register(spark)` call needed, and the functions survive
  * `spark.newSession()` (temp-function registration does not). This is
  * the deploy path for SQL-only consumers (JDBC/Thrift, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    Functions.sqlBuilders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.Functions", name),
        builder))
    }
    // custom operators: the native as-of join plans on every session
    // of the cluster (AsOf.join also self-installs via
    // experimental.extraStrategies for ad-hoc driver sessions)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // semantics-preserving native-kernel substitution for the spelled
    // portable hash (see Md5PrefixFold's scaladoc); the kill switch
    // must hold on THIS path too, not just GraftSession's
    if (!sys.env.contains("SPARK_GRAFT_NO_MD5FOLD"))
      ext.injectOptimizerRule(_ => graft.plans.Md5PrefixFold)
  }
}
