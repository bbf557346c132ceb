package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Engine extension point: SQL function registration + optimizer rules.
  *
  * Installed via `SparkSession.builder.withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.register(ext)
    ext.injectOptimizerRule(_ => CosineSelfSimRule)
    ext.injectOptimizerRule(_ => RedundantRoundRule)
  }
}
