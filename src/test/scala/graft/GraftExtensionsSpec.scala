package graft

/** The extension-registered SQL functions must match the DataFrame API.
  * Uses the post-hoc `registerOn` path on the shared session — in a
  * test JVM `getOrCreate` would silently reuse the existing session and
  * drop builder-time extensions, which is exactly the situation
  * `registerOn` exists for (host hands the engine a built session).
  */
class GraftExtensionsSpec extends SparkSpec {

  test("SQL functions registered on an existing session (registerOn)") {
    new GraftExtensions().registerOn(spark)
    val r = spark.sql(
      """SELECT
        |  size(minhash_sig(array('abc','bcd','cde'), 16)) AS sig_len,
        |  size(lsh_band_keys(minhash_sig(array('abc','bcd','cde'), 16), 4, 4)) AS bands,
        |  round(cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)), 6) AS cos_same,
        |  round(cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)), 6) AS cos_orth,
        |  lsh_sign_bits(array(1.0d, 0.0d), 4) IS NOT NULL AS bits_ok,
        |  size(char_ngrams('abcd', 3)) AS ngrams,
        |  fingerprint(array('a','b')) <> fingerprint(array('b','a')) AS fp_ordered
        |""".stripMargin).head()
    assert(r.getInt(0) == 16)
    assert(r.getInt(1) == 4)
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 0.0)
    assert(r.getBoolean(4))
    assert(r.getInt(5) == 2) // "abc", "bcd"
    assert(r.getBoolean(6))
    // determinism through the SQL path
    val s = spark.sql(
      "SELECT minhash_sig(array('abc','bcd'), 8) = minhash_sig(array('abc','bcd'), 8)")
      .head()
    assert(s.getBoolean(0))
  }

  test("jaccard_sim and nearest_centroids through the SQL surface") {
    new GraftExtensions().registerOn(spark)
    val r = spark.sql(
      """SELECT
        |  jaccard_sim(array('a','b','c'), array('b','c','d')) AS j_half,
        |  jaccard_sim(array('a','a','b'), array('a','b'))     AS j_dupes,
        |  jaccard_sim(array('a'), array('b'))                 AS j_none,
        |  intersect_count(array('a','b','c'), array('b','c','d')) AS ic,
        |  intersect_count(array('a','a','b'), array('a','b','a')) AS ic_dupes,
        |  intersect_count(array('a'), cast(array() AS ARRAY<STRING>)) AS ic_zero,
        |  nearest_centroids(array(1.0d, 0.1d),
        |    array(array(1.0d, 0.0d), array(0.0d, 1.0d)), 1)   AS cell,
        |  nearest_centroids(array(0.1d, 1.0d),
        |    array(array(1.0d, 0.0d), array(0.0d, 1.0d)), 2)   AS probes
        |""".stripMargin).head()
    assert(r.getDouble(0) == 0.5)  // |{b,c}| / |{a,b,c,d}|
    assert(r.getDouble(1) == 1.0)  // set semantics: duplicates collapse
    assert(r.getDouble(2) == 0.0)
    assert(r.getLong(3) == 2L)     // |{b,c}|
    assert(r.getLong(4) == 2L)     // duplicates collapse on both sides
    assert(r.getLong(5) == 0L)
    assert(r.getSeq[Int](6) == Seq(0))
    assert(r.getSeq[Int](7) == Seq(1, 0)) // nearest first
  }

  test("hashed_bow through the SQL surface") {
    new GraftExtensions().registerOn(spark)
    val r = spark.sql(
      """SELECT hashed_bow(array('a', 'b', 'a'), 16) AS bx""").head()
    val bx = r.getStruct(0)
    val b = bx.getSeq[Int](0)
    val x = bx.getSeq[Double](1)
    assert(b.last == 16 && x.last == 1.0)          // bias slot appended
    assert(b.init.forall(i => i >= 0 && i < 16))   // token buckets in range
    assert(b == b.sorted)                          // ascending bucket order
    assert(math.abs(x.init.sum - 1.0) < 1e-12)     // L1-normalized shares
    assert(x.init.contains(2.0 / 3.0))             // 'a' appears twice
  }

  test("builder-path extensions class wires the same builders (compile check)") {
    // The SparkSessionExtensions path can't be exercised in a shared-JVM
    // test (getOrCreate reuses the active session); assert the entry
    // point is well-formed instead.
    val ext = new GraftExtensions
    assert(ext.isInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit])
  }
}
