package graft

import org.apache.spark.sql.types.StringType

import graft.schema.{Catalog, Cardinality, Schemas}

/** Catalog consistency: 12 tables, full declared schemas, keys and
  * normalization lists resolve against the schemas, cardinality split
  * matches the reference's ONE_TO_ONE_TABLES.
  */
class CatalogSpec extends SparkSpec {

  test("all 12 reference tables are cataloged with full schemas") {
    assert(Catalog.tables.size == 12)
    assert(Schemas.byName.size == 12)
    Catalog.tables.values.foreach { spec =>
      assert(spec.schema.isDefined, s"${spec.name} missing schema")
    }
  }

  test("kyc1..4 are one-to-one; everything else one-to-many (reference split)") {
    val oneToOne = Catalog.tables.values
      .filter(_.cardinality == Cardinality.OneToOne).map(_.name).toSet
    assert(oneToOne ==
      Set("farmers_kyc1", "farmers_kyc2", "farmers_kyc3", "farmers_kyc4"))
  }

  test("merge keys exist in the declared schemas") {
    Catalog.tables.values.foreach { spec =>
      val fields = spec.schema.get.fieldNames.toSet
      // farmparcel is keyed by parcel_id; all others by rsbsa_no
      assert(fields.contains(spec.key),
        s"${spec.name}: key ${spec.key} not in schema")
    }
  }

  test("normalization lists only name string columns of their schema") {
    Catalog.tables.values.foreach { spec =>
      val stringFields = spec.schema.get.fields
        .filter(_.dataType == StringType).map(_.name).toSet
      spec.upperCols.foreach { c =>
        // farmparcel's activity/attachment lists are shared across the
        // parcel family in the reference (same switch-case arm) — a
        // listed column may be absent from a sibling's schema, in which
        // case Normalize.uppercase skips it; but when present it must
        // be a string.
        if (spec.schema.get.fieldNames.contains(c))
          assert(stringFields.contains(c),
            s"${spec.name}: normalize column $c is not a string")
      }
    }
  }

  test("enum domains cover the declared ENUM columns") {
    assert(Schemas.enumDomains("data_source") ==
      Seq("FFRS", "NFFIS", "NCFRSS", "NIA", "FISHR"))
    assert(Schemas.enumDomains("validated") == Seq("1", "0", "2"))
  }

  test("enumViolations quarantines out-of-domain rows, passes valid + null") {
    import spark.implicits._
    val df = Seq(
      ("R1", "FFRS", "1"), ("R2", "BOGUS", "1"),
      ("R3", null.asInstanceOf[String], "2"), ("R4", "NIA", "9"),
    ).toDF("rsbsa_no", "data_source", "validated")
    // table-scoped: kyc1 declares data_source but NOT validated, so only
    // R2's bogus data_source is quarantined here…
    val kyc1Bad = graft.functions.Normalize.enumViolations(df, "farmers_kyc1")
    assert(kyc1Bad.select("rsbsa_no").as[String].collect().toSet == Set("R2"))
    // …while kyc4 declares validated but not data_source
    val kyc4Bad = graft.functions.Normalize.enumViolations(df, "farmers_kyc4")
    assert(kyc4Bad.select("rsbsa_no").as[String].collect().toSet == Set("R4"))
    val clean = Seq(("R9", "x")).toDF("rsbsa_no", "free_text")
    assert(graft.functions.Normalize.enumViolations(clean, "farmers_kyc1")
      .count() == 0)
  }
}
