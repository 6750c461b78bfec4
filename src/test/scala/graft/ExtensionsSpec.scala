package graft

/** The spark.sql.extensions deployment path: SparkSpec's session is built
  * with `spark.sql.extensions=graft.GraftExtensions`, so the three native
  * functions must resolve from pure SQL with no per-session register call
  * ever having run for them in THIS registry path (injected functions live
  * in the base registry the session was constructed with).
  */
class ExtensionsSpec extends SparkSpec {

  test("injected functions resolve from pure SQL") {
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect().head.getDouble(0)
    assert(dot === 32.0)

    val sh = spark.sql(
      "SELECT graft_simhash(array('the', 'quick', 'fox')) AS h")
      .collect().head.getLong(0)
    // parity with the declarative spec is pinned in NorthStarSpec; here the
    // point is resolution through the injected path
    assert(sh != 0L)

    val win = spark.sql(
      "SELECT graft_winnow(array('a','b','c','d','e','f'), 3, 2) AS w")
      .collect().head
    assert(!win.isNullAt(0))
  }

  test("spark-submit path: a session built ONLY from the config resolves the functions") {
    // The deployment story is `spark-submit --conf
    // spark.sql.extensions=graft.GraftExtensions` with ZERO code changes.
    // SparkSpec's shared session also carries the config, but suites (and
    // registry queries) call register() too — so prove the config path on a
    // FRESH SparkSession instance (same SparkContext) where no register
    // call has ever run: the functions must come from the extensions
    // injection alone.
    val prior = org.apache.spark.sql.SparkSession.getDefaultSession
    val sc = spark.sparkContext
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val fresh = org.apache.spark.sql.SparkSession.builder()
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .getOrCreate()
      assert(fresh ne spark, "builder must construct a NEW session instance")
      assert(fresh.sparkContext eq sc, "the SparkContext is shared")
      val dot = fresh.sql(
        "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .collect().head.getDouble(0)
      assert(dot === 11.0)
      val row = fresh.sql(
        """SELECT graft_simhash(array('a', 'b')) AS h,
                  graft_winnow(array('a','b','c','d','e','f'), 3, 2) AS w""")
        .collect().head
      assert(row.getLong(0) != 0L)
      assert(!row.isNullAt(1))
    } finally {
      prior.foreach { p =>
        org.apache.spark.sql.SparkSession.setDefaultSession(p)
        org.apache.spark.sql.SparkSession.setActiveSession(p)
      }
    }
  }

  test("the injection list covers exactly the native expressions") {
    assert(GraftExtensions.injected.map(_._1).sorted ===
      Seq("graft_dot", "graft_l2sq", "graft_simhash", "graft_winnow"))
    // and the class wires into a fresh extensions object without error
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
