package graft.avro

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema

/** Avro schema-resolution compatibility — the check a schema registry
  * runs before accepting a new subject version (the other half of the
  * Confluent wire-format story: [[FromAvroConfluent]] resolves
  * writer→reader per the spec; this answers WHETHER that resolution
  * can succeed, per the Avro specification's "Schema Resolution"
  * rules).
  *
  * `canRead(writer, reader)` implements the spec rules directly:
  *  - identical primitive types match; the numeric promotion lattice
  *    int→long→float→double applies (plus string↔bytes);
  *  - records match per-field BY NAME: a writer field missing from the
  *    reader is skipped; a reader field missing from the writer must
  *    carry a default;
  *  - enums match when the reader knows every writer symbol, or
  *    declares an enum default for unknown ones;
  *  - arrays/maps recurse on element/value types;
  *  - fixed requires equal (unqualified) name and size;
  *  - unions: every writer branch must be readable by SOME reader
  *    branch; a non-union writer reads into a union if any branch
  *    accepts it; a union writer into a non-union reader needs every
  *    branch readable.
  *
  * Pinned against `org.apache.avro.SchemaCompatibility` (the library's
  * own checker) by SchemaCompatSpec over a catalog of evolution cases,
  * so this stays an independent re-derivation, not a wrapper.
  *
  * Registry modes build on the primitive exactly as Confluent defines
  * them: BACKWARD = new version reads data written by the previous
  * one; FORWARD = previous version reads data written by the new one;
  * FULL = both.
  */
object SchemaCompat {

  /** Can data written with `writer` be deserialized through `reader`? */
  def canRead(writer: Schema, reader: Schema): Boolean =
    canRead(writer, reader, Set.empty)

  /** `seen` guards recursive record types (a name pair already in
    * flight is assumed compatible — the spec's co-inductive reading). */
  private def canRead(w: Schema, r: Schema, seen: Set[(String, String)]): Boolean = {
    import Schema.Type._
    (w.getType, r.getType) match {
      // union handling first: it dominates every other rule
      case (UNION, _) =>
        w.getTypes.asScala.forall(b => canRead(b, r, seen))
      case (_, UNION) =>
        r.getTypes.asScala.exists(b => canRead(w, b, seen))
      case (NULL, NULL) | (BOOLEAN, BOOLEAN) => true
      case (INT, INT | LONG | FLOAT | DOUBLE) => true
      case (LONG, LONG | FLOAT | DOUBLE) => true
      case (FLOAT, FLOAT | DOUBLE) => true
      case (DOUBLE, DOUBLE) => true
      case (STRING, STRING | BYTES) => true
      case (BYTES, BYTES | STRING) => true
      case (ENUM, ENUM) =>
        sameName(w, r) && {
          val known = r.getEnumSymbols.asScala.toSet
          w.getEnumSymbols.asScala.forall(known.contains) || r.getEnumDefault != null
        }
      case (FIXED, FIXED) => sameName(w, r) && w.getFixedSize == r.getFixedSize
      case (ARRAY, ARRAY) => canRead(w.getElementType, r.getElementType, seen)
      case (MAP, MAP) => canRead(w.getValueType, r.getValueType, seen)
      case (RECORD, RECORD) =>
        sameName(w, r) && {
          val key = (w.getFullName, r.getFullName)
          seen.contains(key) || {
            val seen2 = seen + key
            r.getFields.asScala.forall { rf =>
              writerField(w, rf) match {
                case null => rf.hasDefaultValue // reader-only field needs a default
                case wf => canRead(wf.schema(), rf.schema(), seen2)
              }
              // writer-only fields are skipped by resolution: always fine
            }
          }
        }
      case _ => false
    }
  }

  /** The writer field a reader field resolves against: matched by name,
    * or (per the spec's alias rule) by any of the READER field's
    * aliases naming the writer field — the rename mechanism. */
  private def writerField(w: Schema, rf: Schema.Field): Schema.Field =
    w.getField(rf.name()) match {
      case null =>
        rf.aliases().asScala.iterator.map(w.getField).collectFirst {
          case f if f != null => f
        }.orNull
      case f => f
    }

  /** Unqualified-name match — deliberately the LIBRARY's semantics
    * (avro's SchemaCompatibility.schemaNameEquals compares simple
    * names, treating namespaces as routing metadata), extended by the
    * spec's alias rule: a READER alias naming the writer's full name
    * redirects a rename. */
  private def sameName(a: Schema, b: Schema): Boolean =
    a.getName == b.getName ||
      b.getAliases.asScala.exists(al => al == a.getFullName || al == a.getName)

  /** Registry compatibility verdict for promoting `next` over `prev`. */
  def backward(prev: String, next: String): Boolean =
    canRead(parse(prev), parse(next))
  def forward(prev: String, next: String): Boolean =
    canRead(parse(next), parse(prev))
  def full(prev: String, next: String): Boolean =
    backward(prev, next) && forward(prev, next)

  private def parse(js: String): Schema = new Schema.Parser().parse(js)
}
