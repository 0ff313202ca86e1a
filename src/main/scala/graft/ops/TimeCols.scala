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
  /** Microseconds since the epoch for TIMESTAMP *or* TIMESTAMP_NTZ input.
    *
    * The route goes THROUGH a timestamp_ntz cast on purpose: numeric types
    * do not cast to TIMESTAMP_NTZ, so a caller accidentally passing a raw
    * LONG column (e.g. pre-converted epoch nanos) fails at ANALYSIS time
    * instead of being silently read as epoch SECONDS — which a direct
    * `cast("timestamp")` would do, producing values off by 10⁶. For the two
    * supported input types the extra hop is value-exact: NTZ→NTZ is a
    * no-op, and TIMESTAMP→NTZ→TIMESTAMP round-trips identically under any
    * FIXED-OFFSET session timezone — UTC, as every entry point pins. (In a
    * DST zone the ambiguous fall-back hour would collapse to one offset;
    * correctness here rests on that UTC pin.) */
  def epochMicros(c: Column): Column =
    unix_micros(c.cast("timestamp_ntz").cast("timestamp"))
}
