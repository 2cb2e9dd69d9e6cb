package graft.plans

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** hw5 Q3 parity — the reference's one custom Catalyst artifact.
  *
  * Reference (homework-5/.../MySparkSessionExtension.scala:13-25): an
  * injected optimizer `Rule[LogicalPlan]` ("MyPushDown") that logs
  * `plan.toJSON` and returns the plan unchanged, wired through
  * `SparkSessionExtensions.injectOptimizerRule`. Re-built here with the
  * identical extension API; observations go to a bounded in-memory buffer
  * instead of stdout so tests (and tooling) can read them.
  */
object PlanObservations {
  private val maxRetained = 64
  private val buf = new ConcurrentLinkedQueue[String]()

  def record(json: String): Unit = {
    buf.add(json)
    while (buf.size > maxRetained) buf.poll()
  }

  def snapshot(): Seq[String] = {
    val it = buf.iterator()
    val out = Seq.newBuilder[String]
    while (it.hasNext) out += it.next()
    out.result()
  }

  def clear(): Unit = buf.clear()
}

/** The observing rule: records the optimizer's view of every plan, changes
  * nothing (MySparkSessionExtension.scala:14-17 — `plan.toJSON` then return
  * `plan`).
  */
case class PlanLoggingRule() extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    PlanObservations.record(plan.toJSON)
    plan
  }
}

/** `spark.sql.extensions` entry point (MySparkSessionExtension.scala:21-24). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectOptimizerRule(_ => PlanLoggingRule())
  }
}
