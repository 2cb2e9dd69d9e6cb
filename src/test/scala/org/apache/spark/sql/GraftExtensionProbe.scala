package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Test-only accessor for the private[sql] extension builders. */
object GraftExtensionProbe {
  def optimizerRules(ext: SparkSessionExtensions,
                     spark: SparkSession): Seq[Rule[LogicalPlan]] =
    ext.buildOptimizerRules(spark)
}
