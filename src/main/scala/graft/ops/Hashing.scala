package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hash-routing primitives shared by split assignment (q51,
  * the export) and sampling (q55) — one definition so the export's split
  * can never silently diverge from the gated assignment queries. */
object Hashing {

  /** Bucket in [0, 100): first 7 hex chars of md5(salt || id) mod 100.
    * Engine-portable (DuckDB twin: `('0x' || substr(md5(...), 1, 7))::BIGINT
    * % 100`), stable under re-runs and repartitioning, no RNG state. */
  def md5Bucket100(id: Column, salt: String = ""): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 7), 16, 10)
      .cast("long") % 100
}
