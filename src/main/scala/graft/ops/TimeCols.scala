package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Timestamp-type-agnostic time helpers.
  *
  * Parquet written by pandas/pyarrow without timezone metadata
  * (`timestamp[us]`, isAdjustedToUTC=false) reads as TIMESTAMP_NTZ under
  * Spark's default `inferTimestampNTZ`, while engine-built fixtures
  * (`to_timestamp`, streaming clocks) are session-zoned TIMESTAMP. Built-ins
  * like `unix_micros` accept only the zoned type, so every epoch extraction
  * in the library goes through [[epochMicros]], which is valid for BOTH:
  * the cast is a no-op on zoned input, and on NTZ input it interprets the
  * wall-clock in the session timezone — all entry points pin UTC, which is
  * exactly DuckDB's `epoch_us` reading of the same naive parquet value, so
  * oracle hash-parity holds on either input type. */
object TimeCols {
  /** Microseconds since the epoch for TIMESTAMP *or* TIMESTAMP_NTZ input. */
  def epochMicros(c: Column): Column = unix_micros(c.cast("timestamp"))
}
