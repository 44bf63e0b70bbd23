package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.unix_micros
import org.apache.spark.sql.types.TimestampType

/**
 * Epoch-microsecond extraction that tolerates every timestamp vintage the
 * testdata has shipped with: parquet TIMESTAMP(µs, UTC-adjusted) reads as
 * TIMESTAMP, unannotated TIMESTAMP(µs) reads as TIMESTAMP_NTZ, and
 * TIMESTAMP(ns) reads as Long under the legacy nanos switch (normalized at
 * ingest, sources/Ingest.loadDir). `unix_micros` itself accepts only
 * TIMESTAMP, so every arithmetic site funnels through this cast instead.
 *
 * The session timezone is pinned to UTC (GraftSession), so the NTZ →
 * TIMESTAMP cast reinterprets the wall-clock time as a UTC instant — the
 * exact integer DuckDB's `epoch_us` assigns the same naive timestamp, which
 * keeps the oracle parity. On a TIMESTAMP input the cast is the identity,
 * so this is safe to apply unconditionally and stays inside codegen.
 */
object TimeFunctions {

  /** Epoch µs of `c` (TIMESTAMP or TIMESTAMP_NTZ). */
  def epochMicros(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** SQL-string form for `expr(...)` sites. */
  def epochMicrosSql(e: String): String =
    s"unix_micros(cast(($e) as timestamp))"
}
