package graft.types

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** UINT128 / UPID support (SURVEY §1.2). The reference models process ids
  * as a uint128 {high, low} pair (src/shared/types/typespb/types.proto:61-65,
  * UPID = asid<<32 | pid in high, start_ts in low). We use fixed-width
  * 16-byte BinaryType — big-endian hex layout — which gives exact
  * equality/ordering for joins and stays codegen-friendly.
  *
  * Byte order contract (every helper agrees): bytes 0-3 asid, 4-7 pid,
  * 8-15 start_ts_ns, all big-endian.
  */
object Upid {

  // Mask to the 32-bit field width BEFORE hex: lpad truncates over-long
  // input to its LEFTMOST chars, so an out-of-contract asid/pid would
  // otherwise corrupt the UPID silently. (hex of a long is at most 16
  // chars, so the 16-wide field needs no mask.)
  private def hex8(c: Column): Column =
    lpad(hex(c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))), 8, "0")
  private def hex16(c: Column): Column = lpad(hex(c.cast("long")), 16, "0")

  /** px.make_upid(asid, pid, start_ts) (pixie_module.cc:460-479). */
  def makeUpid(asid: Column, pid: Column, startTsNs: Column): Column =
    unhex(concat(hex8(asid), hex8(pid), hex16(startTsNs)))

  def upidToAsid(upid: Column): Column =
    conv(substring(hex(upid), 1, 8), 16, 10).cast("long")

  def upidToPid(upid: Column): Column =
    conv(substring(hex(upid), 9, 8), 16, 10).cast("long")

  def upidToStartTs(upid: Column): Column =
    conv(substring(hex(upid), 17, 16), 16, 10).cast("long")

  /** Canonical string form "asid:pid:start_ts" (the reference's
    * upid_to_string produces an equivalent printable encoding).
    */
  def upidToString(upid: Column): Column =
    concat_ws(":", upidToAsid(upid), upidToPid(upid), upidToStartTs(upid))

  /** px.uint128(hex) — parse a 32-hex-digit string to binary(16). */
  def uint128(hexStr: Column): Column = unhex(lpad(hexStr, 32, "0"))
}
