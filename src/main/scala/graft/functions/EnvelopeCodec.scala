package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.Shims

/** Decode side of the canonical JSON contract (O2 — the reference's
  * protobuf deserialize step, async.go:274-280, with its
  * silently-skip-malformed policy). Thin Column-API wrapper over the
  * native [[EnvelopeDecode]] expression — see there for the wire
  * semantics (u64 two's-complement, base64 message, malformed → NULL).
  */
object EnvelopeCodec {

  /** Parse canonical Envelope JSON; malformed input → NULL. */
  def decode(json: Column): Column =
    Shims.column(EnvelopeDecode(Shims.expression(json)))
}
