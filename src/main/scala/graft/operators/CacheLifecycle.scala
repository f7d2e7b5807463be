package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Explicit release for operator-internal persists.
  *
  * Several operators persist an intermediate so the ONE materialization
  * of their (lazy) result shares it across multiple readers —
  * [[Similarity.semanticDedup]]'s assignment, [[Raster]]'s
  * range-sorted line projection. Left alone, each invocation pins
  * storage memory until LRU pressure evicts it: a long-lived server
  * session accumulates one cached plan per request.
  * [[unpersistAfterFirstUse]] registers a ONE-SHOT
  * [[QueryExecutionListener]] that unpersists the intermediate as soon
  * as the first completed query CONTAINS the result's plan (consumers
  * may wrap it in further operators). If the result is never
  * materialized the cache stays LRU-managed — no worse than not
  * releasing at all; a caller that materializes twice recomputes the
  * second time — correct, lazy, and cheaper than a leak. The listener
  * bus is async: release trails the action by a beat (tests poll
  * `getPersistentRDDs`), which is fine — the contract is "freed after
  * use", not "freed synchronously". */
private[graft] object CacheLifecycle {

  def unpersistAfterFirstUse(result: DataFrame, cached: Dataset[_]): Unit =
    releaseAfterFirstUse(result)(() => cached.unpersist(blocking = false))

  /** The general form: run `release` once, after the first completed
    * query containing `result`'s plan — for resources that are not a
    * single Dataset's persist (e.g. a PeriodCache holding one
    * persisted frame per closed day). */
  def releaseAfterFirstUse(result: DataFrame)(release: () => Unit): Unit = {
    val spark = result.sparkSession
    val target = result.queryExecution.analyzed
    val listener: QueryExecutionListener = new QueryExecutionListener {
      private def maybeRelease(qe: QueryExecution): Unit =
        try {
          if (qe.analyzed.exists(_.sameResult(target))) {
            release()
            spark.listenerManager.unregister(this)
          }
        } catch { case scala.util.control.NonFatal(_) => }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = maybeRelease(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = maybeRelease(qe)
    }
    spark.listenerManager.register(listener)
  }
}
