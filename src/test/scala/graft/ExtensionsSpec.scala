package graft

class ExtensionsSpec extends SparkSpec {

  test("graft SQL functions register and evaluate from spark.sql") {
    graft.plans.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d,
        |  graft_simhash64(array(1L, 1L, 1L)) AS sh,
        |  graft_sha60('abc') AS h""".stripMargin).first()
    assert(r.getAs[Double]("d") == 32.0)
    // three identical hashes: every bit of 1L wins its vote → simhash = 1
    assert(r.getAs[Long]("sh") == 1L)
    // first 15 hex chars of sha256("abc") = ba7816bf8f01cfe (spot-checked
    // against the Hashing.sha60 column form below)
    val viaColumn = spark.range(1).select(
      graft.expressions.Hashing.sha60(org.apache.spark.sql.functions.lit("abc"))
        .as("h")).first().getAs[Long]("h")
    assert(r.getAs[Long]("h") == viaColumn)
  }

  test("GraftExtensions injects the same functions at session build time") {
    // the injector and the in-session registrar share one builder list —
    // verify the class wires without error against a throwaway extensions
    // object (building a whole second SparkContext is not possible in one
    // JVM test run)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
  }
}
