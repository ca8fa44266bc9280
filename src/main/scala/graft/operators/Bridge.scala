package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-table (bridge) rewrite — K5 + J1 in SURVEY.md §2.
  *
  * The reference rewrites `task_executors` per task: DELETE all rows
  * for the task_id, then for each executor shortname INSERT with a
  * scalar subquery resolving shortname → employee id; an unmatched
  * shortname inserts a NULL executor_id
  * (/root/reference/internal/repository/task.go:125-151).
  *
  * Dataflow form: explode the executors array, broadcast-join the
  * employee dimension on shortname with a LEFT join (inner would
  * silently drop unmatched names — semantics J1 forbids), and overwrite
  * each affected task's group (delete+insert = idempotent group
  * overwrite, absorbing replays).
  *
  * Scale: employees is a dimension → `broadcast()` pins a broadcast
  * hash join, zero shuffle on the (huge) exploded side. Skew caution
  * (SURVEY.md §7.3): an executors array is tiny per row, but a skewed
  * explode (one task with millions of entries) is handled by AQE skew
  * join since the probe side is the exploded one.
  */
object Bridge {

  /** Exploded bridge rows `(taskIdCol, shortname, executor_id)`.
    * `explode_outer` keeps tasks whose array is empty/NULL visible with
    * a NULL shortname, matching "DELETE happened, nothing re-inserted".
    */
  def resolveExecutors(tasks: DataFrame, employees: DataFrame,
      taskIdCol: String, executorsCol: String,
      empIdCol: String, shortnameCol: String): DataFrame = {
    val exploded = tasks.select(col(taskIdCol),
      explode_outer(col(executorsCol)).as(shortnameCol))
    exploded
      .join(broadcast(employees.select(col(shortnameCol),
        col(empIdCol).as("executor_id"))), Seq(shortnameCol), "left")
      .select(col(taskIdCol), col(shortnameCol), col("executor_id"))
  }

  /** K5 as state transformation: the bridge table after overwriting the
    * groups of every task present in `incoming` (delete-then-reinsert).
    */
  def rewriteGroups(bridge: DataFrame, incoming: DataFrame,
      groupKey: String): DataFrame =
    bridge.join(incoming.select(groupKey).distinct(), Seq(groupKey), "left_anti")
      .unionByName(incoming)
}
