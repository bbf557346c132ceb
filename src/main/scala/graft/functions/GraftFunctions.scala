package graft.functions

import org.apache.spark.sql.SparkSessionExtensions

/** SQL-function registration for graft's native expressions.
  * Populated as native Expressions land (cosine_sim, simhash64, ...).
  */
object GraftFunctions {
  def register(ext: SparkSessionExtensions): Unit = {
    // Native expressions are injected here; see graft.functions.expr.*
    ExprRegistrations.all.foreach(ext.injectFunction)
  }
}
