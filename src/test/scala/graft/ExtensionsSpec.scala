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

  test("BoundedLevenshtein rewrites unbounded distance filters to the banded form") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    // double registration must not stack the rule
    graft.plans.GraftFunctions.register(spark)
    assert(spark.experimental.extraOptimizations
      .count(_ == graft.plans.BoundedLevenshtein) == 1)
    // parquet-backed (a LocalRelation would be constant-folded before the
    // plan can be inspected)
    val c = spark.read.parquet(s"$sf/customer.parquet")
      .filter(org.apache.spark.sql.functions.expr(
        "levenshtein(c_name, 'Customer#000000001') <= 2"))
    val opt = c.queryExecution.optimizedPlan.toString
    // threshold form present (3-arg levenshtein) + length guard
    assert(opt.contains("levenshtein(c_name"), opt)
    assert(opt.contains("Some(2)) >= 0"), opt)
    assert(opt.contains("abs(") && opt.contains("length("), opt)
    // identical semantics: `< 3` says the same thing but dodges the
    // rewrite pattern, so it runs the unbounded form
    val unrewritten = spark.read.parquet(s"$sf/customer.parquet")
      .filter(org.apache.spark.sql.functions.expr(
        "levenshtein(c_name, 'Customer#000000001') < 3"))
    assert(c.count() == unrewritten.count())
    assert(c.count() >= 1)  // the named customer itself matches
  }
}
