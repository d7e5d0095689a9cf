package graft

import org.apache.spark.sql.DataFrame

/** Ambient syntax shared by every operator module. */
package object operators {

  /** `.fanout` — scale-adaptive scan fan-out before a CPU-heavy typed
    * map (see [[graft.engine.Tables.fanout]] for the contract: fires
    * only on narrow under-parallel scan pipelines, structural no-op at
    * production scale and on streaming frames). */
  implicit final class FanoutSyntax(private val df: DataFrame)
      extends AnyVal {
    def fanout: DataFrame = graft.engine.Tables.fanout(df)
  }
}
