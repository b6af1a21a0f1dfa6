package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** SQL registration: the registered functions must resolve by name and
  * agree exactly with their DataFrame-API twins (same expression tree,
  * so equality is bit-level), and the extension route must inject the
  * same table.
  */
class GraftSqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("registered SQL functions ≡ DataFrame-API expression values") {
    graft.functions.GraftSql.register(spark)
    Tables.documents(spark, TestSpark.sfDir).createOrReplaceTempView("gsql_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_simhash64(text) h FROM gsql_docs ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaApi = Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"),
        graft.functions.GraftExpressions.simhash64(col("text")).as("h"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql.toSeq == viaApi.toSeq)
  }

  test("graft_dot casts float arrays to double like the Column wrapper") {
    graft.functions.GraftSql.register(spark)
    Tables.embeddings(spark, TestSpark.sfDir).createOrReplaceTempView("gsql_emb")
    val viaSql = spark.sql(
      "SELECT vec_id, graft_dot(embedding, embedding) d FROM gsql_emb ORDER BY vec_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val e = Tables.embeddings(spark, TestSpark.sfDir)
    val viaApi = e.select(col("vec_id"),
        graft.functions.GraftExpressions.dotProduct(
          col("embedding"), col("embedding")).as("d"))
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(viaSql.toSeq == viaApi.toSeq)
  }

  test("spark.sql.extensions injection registers the functions in a fresh session") {
    // The REAL injection route — a new session built through the public
    // Builder.withExtensions hook (the programmatic twin of
    // spark.sql.extensions; the conf spelling is a STATIC conf read from
    // the SparkContext, so it can only apply to a fresh context — not
    // available in a shared test JVM), not reflection into private[sql]
    // internals. The shared session is restored in finally; suites run
    // sequentially in the forked test JVM, so the brief default-session
    // swap is safe.
    import org.apache.spark.sql.SparkSession
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val injected = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      assert(injected ne orig) // a genuinely new session, extensions applied
      // No GraftSql.register on THIS session: resolution below proves the
      // builder-time route end to end.
      for (name <- Seq("graft_simhash64", "graft_fingerprint", "graft_dot",
          "graft_intersect_size", "graft_shingles"))
        assert(injected.sessionState.functionRegistry.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)), name)
      val r = injected.sql(
        "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) d").collect()(0)
      assert(r.getDouble(0) == 11.0)
    } finally {
      SparkSession.setActiveSession(orig)
      SparkSession.setDefaultSession(orig)
    }
  }

  test("every registered function resolves and evaluates from SQL") {
    graft.functions.GraftSql.register(spark)
    val r = spark.sql("""
      SELECT graft_simhash64('a b c') s,
        graft_fingerprint('abcdefghijklmnopqrstuvwxyz', 16) f,
        graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) d,
        graft_intersect_size(array('a','b'), array('b','c')) i,
        size(graft_shingles('abcd', 3)) n,
        graft_jaro_winkler('martha', 'marhta') jw
    """).collect()(0)
    assert(r.getDouble(2) == 11.0)
    assert(r.getInt(3) == 1)
    assert(r.getInt(4) == 2)
    assert(r.getLong(0) == graft.functions.GraftOps.simhash64("a b c"))
    assert(r.getLong(1) == graft.functions.GraftOps.rollingFingerprint("abcdefghijklmnopqrstuvwxyz", 16))
    assert(math.abs(r.getDouble(5) - 0.9611111111111111) < 1e-12)
  }
}
