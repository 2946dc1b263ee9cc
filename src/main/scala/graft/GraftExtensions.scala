package graft

import org.apache.spark.sql.SparkSessionExtensions

/**
 * Spark extensions entry point — the standard way to ship this engine's
 * Catalyst surface to a cluster without code changes:
 *
 *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
 *
 * Injects every scalar expression (cell index, geotag, PIP, text/vector
 * kernels) into the session's function registry at build time, so pure
 * SQL (`SELECT cell_of(lon, lat, 12) ...`, thriftserver sessions,
 * notebooks) reaches the same codegen'd kernels as the Column API.
 * Complements `graft.functions.registerAll`, which does the same for an
 * already-built session.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.injectAll(ext)
    // deferred count-gated broadcast for the ANN top-k paths: the rule
    // resolves BroadcastGate markers at optimization (= action) time.
    // register() also attaches it via experimental.extraOptimizations —
    // the probe Ann.gatedBroadcast uses — so extension-built sessions
    // take the deferred path too; the preCBO copy then no-ops (markers
    // already consumed) and is kept as the first-resolution point.
    ext.injectPreCBORule { s =>
      org.apache.spark.sql.graft.GatePlans.register(s)
      org.apache.spark.sql.graft.ResolveBroadcastGate(
        s.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    }
  }
}
