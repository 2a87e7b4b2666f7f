package graft

/** The comparator itself needs tests: it is the golden-output gate for
  * everything else (ref idiom: TestUtils.scala:88-125 with an
  * intentionally altered-row variant, TestUtils.scala:139-150).
  */
class DatasetEqualitySpec extends SparkSpec {
  import spark.implicits._

  private def known = Seq(
    (1L, "a", 1.5, true), (2L, "b", 2.5, false)
  ).toDF("id", "s", "d", "b")

  test("identical datasets are equal regardless of row/column order") {
    assert(datasetEquality(known, known.select("b", "d", "s", "id")))
    assert(datasetEquality(known, known.orderBy($"id".desc)))
  }

  test("altered row detected") {
    val altered = Seq((1L, "a", 1.5, true), (2L, "b", 2.5, true))
      .toDF("id", "s", "d", "b")
    assert(!datasetEquality(known, altered))
  }

  test("missing / extra / duplicated rows detected") {
    assert(!datasetEquality(known, known.limit(1)))
    assert(!datasetEquality(known, known.union(known.limit(1))))
  }

  test("schema drift detected") {
    assert(!datasetEquality(known, known.withColumnRenamed("s", "t")))
  }
}
