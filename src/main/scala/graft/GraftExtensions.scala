package graft

import org.apache.spark.sql.SparkSessionExtensions

/**
 * `SparkSessionExtensions` entry point: enables graft's native SQL
 * functions in sessions configured — not constructed — by the user:
 *
 * {{{
 *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
 * }}}
 *
 * Injects the same function set as
 * [[functions.GraftFunctions.register]] (which remains the way to add
 * them to an already-live session, e.g. a notebook).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.GraftFunctions.inject(ext)
    functions.GraftTableFunctions.inject(ext)
    // post-pushdown stats re-wrap for V1-bridged graft scans (see
    // GraftStatsRule) — injected here for conf-configured sessions;
    // resolving any graft table also self-installs it
    ext.injectPreCBORule(_ => sources.GraftStatsRule)
    // SQL UPDATE / MERGE INTO on graft tables → the transactional
    // updateWhere/merge commits (see GraftDml) — analysis-time
    // interception, so this one NEEDS the extensions mechanism
    ext.injectPostHocResolutionRule(s => new sources.GraftDmlRule(s))
  }
}
