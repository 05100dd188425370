package graft

import org.apache.avro.{Schema, SchemaCompatibility}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.avro.SchemaCompat
import graft.model.Schemas

/** SchemaCompat is an independent re-derivation of the Avro spec's
  * schema-resolution rules; this spec pins it against the library's own
  * checker (org.apache.avro.SchemaCompatibility) — on a curated
  * evolution catalog exercising every rule, and on ScalaCheck-generated
  * record pairs. */
class SchemaCompatSpec extends AnyFunSuite {

  private def parse(js: String) = new Schema.Parser().parse(js)

  private def libCanRead(writer: Schema, reader: Schema): Boolean =
    SchemaCompatibility.checkReaderWriterCompatibility(reader, writer)
      .getType == SchemaCompatibility.SchemaCompatibilityType.COMPATIBLE

  private def rec(fields: String*): String =
    s"""{"type":"record","name":"Order","fields":[${fields.mkString(",")}]}"""

  /** The registry-subject evolution catalog: every rule has a case. */
  private val catalog: Seq[(String, String)] = Seq(
    "v1_base" -> rec(
      """{"name":"id","type":"string"}""",
      """{"name":"price","type":"float"}"""),
    "v2_add_default" -> rec( // BACKWARD ok (new reads old via default)
      """{"name":"id","type":"string"}""",
      """{"name":"price","type":"float"}""",
      """{"name":"currency","type":"string","default":"USD"}"""),
    "v3_add_no_default" -> rec( // new cannot read old
      """{"name":"id","type":"string"}""",
      """{"name":"price","type":"float"}""",
      """{"name":"region","type":"string"}"""),
    "v4_promote" -> rec( // float->double promotion: reads v1
      """{"name":"id","type":"string"}""",
      """{"name":"price","type":"double"}"""),
    "v5_drop_field" -> rec( // reads v1 (skips price); v1 cannot read it
      """{"name":"id","type":"string"}"""),
    "v6_nullable_union" -> rec( // [null,T] union accepting T
      """{"name":"id","type":"string"}""",
      """{"name":"price","type":["null","float"],"default":null}"""),
    "v7_retype" -> rec( // string -> int: incompatible both ways
      """{"name":"id","type":"int"}""",
      """{"name":"price","type":"float"}"""),
    "v8_enum" -> rec(
      """{"name":"id","type":"string"}""",
      """{"name":"price","type":"float"}""",
      """{"name":"status","type":{"type":"enum","name":"St","symbols":["A","B"]},"default":"A"}"""),
    "v9_enum_widened" -> rec( // reader knows every writer symbol of v8
      """{"name":"id","type":"string"}""",
      """{"name":"price","type":"float"}""",
      """{"name":"status","type":{"type":"enum","name":"St","symbols":["A","B","C"]},"default":"A"}"""))

  test("catalog matrix agrees with org.apache.avro.SchemaCompatibility both ways") {
    for ((wn, wj) <- catalog; (rn, rj) <- catalog) {
      val (w, r) = (parse(wj), parse(rj))
      assert(SchemaCompat.canRead(w, r) === libCanRead(w, r),
        s"divergence from library: writer=$wn reader=$rn")
    }
  }

  test("catalog spot checks state the spec rules directly") {
    def can(w: String, r: String) =
      SchemaCompat.canRead(parse(byName(w)), parse(byName(r)))
    assert(can("v1_base", "v2_add_default"), "added-with-default must be readable")
    assert(!can("v1_base", "v3_add_no_default"), "added-without-default must fail")
    assert(can("v1_base", "v4_promote"), "float->double promotion")
    assert(!can("v4_promote", "v1_base"), "double->float demotion must fail")
    assert(can("v1_base", "v5_drop_field"), "reader may drop fields")
    assert(!can("v5_drop_field", "v1_base"), "dropped field has no default")
    assert(can("v1_base", "v6_nullable_union"), "T into [null,T]")
    assert(!can("v1_base", "v7_retype") && !can("v7_retype", "v1_base"), "retype")
    assert(can("v8_enum", "v9_enum_widened"), "enum symbol superset reads")
  }

  private def byName(n: String): String = catalog.toMap.apply(n)

  test("registry modes compose the primitive (BACKWARD/FORWARD/FULL)") {
    val v1 = byName("v1_base"); val v2 = byName("v2_add_default")
    val v4 = byName("v4_promote"); val v3 = byName("v3_add_no_default")
    assert(SchemaCompat.backward(v1, v2) && SchemaCompat.forward(v1, v2),
      "add-with-default is FULL compatible")
    assert(SchemaCompat.full(v1, v2))
    assert(SchemaCompat.backward(v1, v4) && !SchemaCompat.forward(v1, v4),
      "promotion is BACKWARD-only")
    assert(!SchemaCompat.backward(v1, v3) && SchemaCompat.forward(v1, v3),
      "add-without-default is FORWARD-only")
  }

  test("property: generated record pairs agree with the library checker") {
    val types = Seq(
      "\"int\"" -> None, "\"long\"" -> None, "\"float\"" -> None,
      "\"double\"" -> None, "\"string\"" -> Some("\"x\""),
      "\"boolean\"" -> Some("true"),
      "[\"null\",\"long\"]" -> Some("null"))
    val genField = for {
      name <- Gen.oneOf("a", "b", "c", "d", "e")
      (tpe, dflt) <- Gen.oneOf(types)
      withDefault <- Gen.oneOf(true, false)
    } yield {
      val d = if (withDefault) dflt.orElse(
        if (tpe == "\"int\"" || tpe == "\"long\"") Some("0")
        else if (tpe == "\"float\"" || tpe == "\"double\"") Some("0.5") else None)
      else None
      (name, s"""{"name":"$name","type":$tpe${d.map(v => s""","default":$v""").getOrElse("")}}""")
    }
    val genRecord = Gen.listOfN(4, genField).map { fs =>
      val uniq = fs.toMap.values // one field per name
      rec(uniq.toSeq: _*)
    }
    val prop = Prop.forAll(Gen.zip(genRecord, genRecord)) { case (wj, rj) =>
      val (w, r) = (parse(wj), parse(rj))
      SchemaCompat.canRead(w, r) == libCanRead(w, r)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("nested structures recurse: array/map/record/fixed") {
    val n1 = """{"type":"record","name":"N","fields":[
      |{"name":"xs","type":{"type":"array","items":"int"}},
      |{"name":"m","type":{"type":"map","values":"float"}},
      |{"name":"f","type":{"type":"fixed","name":"F8","size":8}}]}"""
      .stripMargin.replace("\n", "")
    val n2 = """{"type":"record","name":"N","fields":[
      |{"name":"xs","type":{"type":"array","items":"long"}},
      |{"name":"m","type":{"type":"map","values":"double"}},
      |{"name":"f","type":{"type":"fixed","name":"F8","size":8}}]}"""
      .stripMargin.replace("\n", "")
    val n3 = """{"type":"record","name":"N","fields":[
      |{"name":"f","type":{"type":"fixed","name":"F8","size":4}}]}"""
      .stripMargin.replace("\n", "")
    assert(SchemaCompat.canRead(parse(n1), parse(n2)), "element/value promotion")
    assert(!SchemaCompat.canRead(parse(n2), parse(n1)), "demotion fails")
    assert(!SchemaCompat.canRead(parse(n1), parse(n3)), "fixed size mismatch")
    // and the library agrees on all three
    assert(libCanRead(parse(n1), parse(n2)) && !libCanRead(parse(n2), parse(n1))
      && !libCanRead(parse(n1), parse(n3)))
  }

  test("aliases redirect renames: record-level and field-level, agreeing with the library") {
    val oldRec = """{"type":"record","name":"OldOrder","fields":[
      |{"name":"legacy_id","type":"string"}]}""".stripMargin.replace("\n", "")
    val renamed = """{"type":"record","name":"NewOrder","aliases":["OldOrder"],"fields":[
      |{"name":"id","type":"string","aliases":["legacy_id"]}]}"""
      .stripMargin.replace("\n", "")
    val unrelated = """{"type":"record","name":"Other","fields":[
      |{"name":"id","type":"string"}]}""".stripMargin.replace("\n", "")
    assert(SchemaCompat.canRead(parse(oldRec), parse(renamed)),
      "reader aliases must redirect both the record and the field rename")
    assert(!SchemaCompat.canRead(parse(oldRec), parse(unrelated)),
      "no alias, different name: incompatible")
    // the library agrees on both
    assert(libCanRead(parse(oldRec), parse(renamed)))
    assert(!libCanRead(parse(oldRec), parse(unrelated)))
  }

  test("recursive record types fail sparkTypeFor loudly (no stack overflow)") {
    val recursive = """{"type":"record","name":"Node","fields":[
      |{"name":"v","type":"long"},
      |{"name":"next","type":["null","Node"],"default":null}]}"""
      .stripMargin.replace("\n", "")
    val e = intercept[IllegalArgumentException] {
      graft.avro.AvroOcf.sparkTypeFor(parse(recursive))
    }
    assert(e.getMessage.contains("recursive record type"), e.getMessage)
    // ...while SchemaCompat handles the same recursion co-inductively
    assert(SchemaCompat.canRead(parse(recursive), parse(recursive)))
  }

  test("the rich order schema reads itself and evolves by field drop") {
    val rich = parse(Schemas.richOrderAvroJson)
    assert(SchemaCompat.canRead(rich, rich))
    assert(SchemaCompat.canRead(parse(Schemas.orderAvroJson), parse(Schemas.orderAvroJson)))
  }
}
