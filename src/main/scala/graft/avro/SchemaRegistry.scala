package graft.avro

/** The schema-registry SEAM: where a live Confluent Schema Registry
  * client plugs into the Confluent-framed decode path
  * ([[FromAvroConfluent]]).
  *
  * The wire format (public Confluent spec: `0x00` magic + 4-byte
  * big-endian schema id + raw Avro datum) makes every consumer depend
  * on an id→writer-schema lookup. In a deployment that lookup is an
  * HTTP client with a local cache (`GET /schemas/ids/{id}`); offline —
  * this repo's zero-egress environment, or any air-gapped replay — it
  * is a static snapshot of the subject's version history. Both are the
  * same bounded model state: schema catalogs grow with VERSIONS
  * (dozens), never with data volume, so a resolver is always
  * broadcast-sized.
  *
  * Contract:
  *  - `resolve(id)` returns the writer-schema JSON for a wire id, or
  *    None when the id is unknown — AFTER any remote fetch a live
  *    client would attempt. The caller ([[FromAvroConfluent]]) caches
  *    parsed schemas per id, so `resolve` is hit once per (executor,
  *    id): a live implementation pays one fetch per new id, exactly
  *    like the official client's identity cache.
  *  - None is terminal for the row, not the stream: the decode
  *    expression yields null and the row routes to the DLQ with
  *    provenance (the PERMISSIVE convention shared by the whole codec
  *    family) — an unknown id must never fail the query, because on a
  *    live topic it usually means a producer deployed a new version
  *    mid-batch.
  *  - Implementations must be Serializable (the expression ships to
  *    executors) and thread-safe.
  */
trait SchemaRegistryResolver extends Serializable {
  /** Writer-schema JSON for a Confluent wire-format schema id; None =
    * unknown id (after any remote fetch a live client would attempt). */
  def resolve(id: Int): Option[String]
}

/** Static snapshot resolver: the offline/registry-dump implementation
  * (and the test double for the live-client seam). */
final case class StaticSchemaRegistry(byId: Map[Int, String])
    extends SchemaRegistryResolver {
  override def resolve(id: Int): Option[String] = byId.get(id)
}

/** Transport-failure semantics for a LIVE registry client, as a
  * decorator over any inner resolver: an inner `resolve` that THROWS
  * (the live analogue: connection refused, 5xx, timeout) is retried up
  * to `attempts` times with linear backoff; an inner `None` is an
  * AUTHORITATIVE miss and is returned immediately — no retry, because
  * the registry answered ("no such id") and the caller's
  * no-negative-cache contract already re-asks on the next row (the
  * "registered seconds later" race, [[FromAvroConfluent]]).
  *
  * When every attempt throws, the LAST failure propagates: a registry
  * that cannot be reached is an infrastructure outage, and silently
  * mapping it to None would mis-route every in-flight row to the DLQ
  * as "unknown schema" — permanently, since DLQ'd rows don't replay
  * themselves. Failing the task instead hands the decision to Spark's
  * task retry / the operator, exactly like the official client.
  * (Distinction pinned by SchemaRegistrySpec.) */
final case class RetryingSchemaRegistry(inner: SchemaRegistryResolver,
    attempts: Int = 3, backoffMs: Long = 50L)
    extends SchemaRegistryResolver {
  require(attempts >= 1, s"attempts must be >= 1, got $attempts")
  require(backoffMs >= 0, s"backoffMs must be >= 0, got $backoffMs")
  override def resolve(id: Int): Option[String] = {
    var attempt = 1
    while (true) {
      try return inner.resolve(id)
      catch {
        case scala.util.control.NonFatal(_) if attempt < attempts =>
          // linear backoff — bounded (attempts·backoff). NonFatal keeps
          // interrupts AND VM errors (OOM, LinkageError) propagating
          // immediately instead of being retried with backoff.
          if (backoffMs > 0) Thread.sleep(backoffMs * attempt)
          attempt += 1
      }
    }
    None // unreachable: the loop exits via return or throw
  }
}
