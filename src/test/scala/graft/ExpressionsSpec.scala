package graft

import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, VectorFunctions}

class ExpressionsSpec extends SparkSuite {

  private def vecDf(a: Seq[Double], b: Seq[Double]) = {
    spark.createDataFrame(Seq((a, b))).toDF("a", "b")
  }

  test("cosine_sim matches scalar math (double arrays)") {
    val a = Seq(1.0, 2.0, 3.0); val b = Seq(4.0, 5.0, 6.0)
    val got = vecDf(a, b).select(VectorFunctions.cosine_sim(col("a"), col("b")))
      .head().getDouble(0)
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val exp = dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    assert(math.abs(got - exp) < 1e-12)
  }

  test("cosine_sim on float arrays (the embeddings physical type) + codegen path") {
    val df = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val row = df.select(VectorFunctions.cosine_sim(col("embedding"), col("embedding")).as("c"))
      .agg(min("c"), max("c")).head()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-9 && math.abs(row.getDouble(1) - 1.0) < 1e-9)
  }

  test("length mismatch → null; zero vector → 0.0") {
    val df = vecDf(Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))
    assert(df.select(VectorFunctions.cosine_sim(col("a"), col("b"))).head().isNullAt(0))
    val z = vecDf(Seq(0.0, 0.0), Seq(1.0, 2.0))
    assert(z.select(VectorFunctions.cosine_sim(col("a"), col("b"))).head().getDouble(0) == 0.0)
  }

  test("vec_dot and l2_dist agree with scalar math") {
    val a = Seq(1.0, -2.0, 0.5); val b = Seq(3.0, 0.0, 4.0)
    val r = vecDf(a, b).select(
      VectorFunctions.vec_dot(col("a"), col("b")),
      VectorFunctions.l2_dist(col("a"), col("b"))).head()
    assert(math.abs(r.getDouble(0) - 5.0) < 1e-12)
    val exp = math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    assert(math.abs(r.getDouble(1) - exp) < 1e-12)
  }

  test("minhash signature: identical inputs → identical sigs; estimate tracks jaccard") {
    import scala.jdk.CollectionConverters._
    val docs = Seq(
      ("a b c d e f g h", "a b c d e f g h"),       // identical
      ("a b c d e f g h", "a b c d e f g X")        // 1-token edit
    )
    val df = spark.createDataFrame(docs).toDF("t1", "t2")
    val sigs = df.select(
      HashFunctions.minhash_signature(split(col("t1"), " "), 128).as("s1"),
      HashFunctions.minhash_signature(split(col("t2"), " "), 128).as("s2"))
      .withColumn("est",
        size(filter(zip_with(col("s1"), col("s2"), (x, y) => x === y), b => b))
          .cast("double") / 128)
      .collect()
    assert(sigs(0).getDouble(2) == 1.0)
    val est = sigs(1).getDouble(2)
    // true jaccard of the token sets = 7/9 ≈ 0.78; 128 hashes → ±~0.1
    assert(est > 0.55 && est < 0.95, s"estimate $est out of band")
  }

  test("simhash: identical texts → equal, near texts → small hamming") {
    val df = spark.createDataFrame(Seq(
      ("spark streams join table window", "spark streams join table window"),
      ("spark streams join table window", "spark streams join table windows"))).toDF("t1", "t2")
    val r = df.select(HashFunctions.hamming64(
      HashFunctions.simhash64(split(col("t1"), " ")),
      HashFunctions.simhash64(split(col("t2"), " "))).as("h")).collect()
    assert(r(0).getInt(0) == 0)
    assert(r(1).getInt(0) <= 16)
  }

  test("fingerprint is deterministic and order-sensitive") {
    val df = spark.createDataFrame(Seq(("ab cd", "cd ab"))).toDF("x", "y")
    val r = df.select(HashFunctions.doc_fingerprint(col("x")).as("fx"),
      HashFunctions.doc_fingerprint(col("y")).as("fy"),
      HashFunctions.doc_fingerprint(lit("ab cd")).as("fx2")).head()
    assert(r.getLong(0) != r.getLong(1))
    assert(r.getLong(0) == r.getLong(2))
  }

  test("sign_buckets declares nullable: dimension mismatch on a non-nullable column → null row, not a crash") {
    // regression: without `override def nullable = true` a non-nullable
    // input (array(lit...)) made the planner decode the bogus non-null slot
    // and throw EXPRESSION_DECODING_FAILED on any dimension mismatch
    val df = spark.range(1).select(array(lit(1.0), lit(2.0)).as("v"))
    val planes = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0)) // dim 3 vs input dim 2
    val out = df.select(
      graft.functions.VectorFunctions.sign_buckets(col("v"), planes, 2).as("b"))
      .collect()
    assert(out.length == 1 && out(0).isNullAt(0))
    // matching dims still bucket
    val ok = df.select(graft.functions.VectorFunctions.sign_buckets(col("v"),
      Seq(Seq(1.0, 0.0), Seq(0.0, -1.0)), 2).as("b")).head()
    assert(!ok.isNullAt(0) && ok.getSeq[Int](0).length == 1)
  }

  test("NaN vector components degrade deterministically, never crash (multi-probe buckets, nearest_cells)") {
    // regression (round-13 review): a single NaN component poisoned every
    // dot product / distance, the lowest-margin (resp. nearest-cell)
    // selection loops never found a candidate (NaN comparisons are false),
    // and `taken(-1)` / `flipped(-1)` threw AIOOBE — one bad embedding
    // aborted the whole dedup/knn job. Both kernels now fall back to the
    // first untried index.
    val df = spark.range(1)
      .select(array(lit(Double.NaN), lit(2.0)).as("v"))
    val planes = Seq(Seq(1.0, 0.0), Seq(0.0, -1.0))
    val mp = df.select(graft.functions.VectorFunctions
      .sign_buckets_multiprobe(col("v"), planes, 2, 1).as("b")).head()
    assert(!mp.isNullAt(0) && mp.getSeq[Int](0).length == 2) // (main, 1 probe)
    val nc = df.select(graft.functions.VectorFunctions
      .nearest_cells(col("v"), Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)), 2).as("c")).head()
    assert(!nc.isNullAt(0) && nc.getSeq[Long](0).sorted == Seq(0L, 1L))
  }

  test("vec_sum aggregates per-dimension sums; nulls skipped; ragged vectors contribute their indices; all-null group is null") {
    val ss = spark
    import ss.implicits._
    // mixed lengths + a null: posexplode semantics — each vector adds to
    // the indices it has, the null row adds nothing
    val df = Seq(
      (1L, Some(Seq(1.0, 2.0))),
      (1L, Some(Seq(10.0, 20.0, 30.0))),
      (1L, None: Option[Seq[Double]]),
      (2L, None: Option[Seq[Double]])).toDF("g", "v")
    val out = df.groupBy("g")
      .agg(graft.functions.VectorFunctions.vec_sum(col("v")).as("s"))
      .collect().map(r => r.getLong(0) ->
        Option(r.get(1)).map(_.asInstanceOf[scala.collection.Seq[Double]].toSeq)).toMap
    assert(out(1L).contains(Seq(11.0, 22.0, 30.0)), out.toString)
    assert(out(2L).isEmpty, "an all-null group must eval to null, not zeros")
    // null ELEMENTS skip their index (posexplode + sum(v) semantics) —
    // and identically across physical row formats (GenericArrayData from
    // a local Seq vs UnsafeArrayData after an exchange used to diverge)
    val withNullElems = Seq(
      (Seq[java.lang.Double](1.0, null)), (Seq[java.lang.Double](2.0, 5.0)))
      .toDF("v").withColumn("v", col("v").cast("array<double>"))
    val ne = withNullElems
      .agg(graft.functions.VectorFunctions.vec_sum(col("v")).as("s"))
      .head().getSeq[Double](0)
    assert(ne == Seq(3.0, 5.0), s"null elements must skip their index: $ne")
    // float input path (the storage element type) sums in double
    val f = Seq((Seq(1.5f, 2.5f)), (Seq(0.5f, 0.5f))).toDF("v")
      .agg(graft.functions.VectorFunctions.vec_sum(col("v")).as("s"))
      .head().getSeq[Double](0)
    assert(f == Seq(2.0, 3.0), f.toString)
    // merge across partitions agrees with the single-partition fold
    val big = spark.range(0, 1000, 1, 8)
      .select((col("id") % 3).as("g"),
        array(col("id").cast("double"), lit(1.0)).as("v"))
    val merged = big.groupBy("g")
      .agg(graft.functions.VectorFunctions.vec_sum(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val want = (0L to 2L).map(g => g ->
      Seq((0L until 1000L).filter(_ % 3 == g).map(_.toDouble).sum,
        (0L until 1000L).count(_ % 3 == g).toDouble)).toMap
    assert(merged == want, s"partial-merge diverged: $merged")
  }

  test("GraftExtensions injects every builder into SparkSessionExtensions without error") {
    // the spark.sql.extensions path a CLUSTER user configures — a bad
    // ExpressionInfo or FunctionIdentifier construction would throw at
    // session bootstrap, which nothing else exercises (tests use
    // GraftFunctions.register on the live session; the builders themselves
    // are shared, so injection wiring is the only untested delta)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
    assert(GraftFunctions.builders.nonEmpty)
    assert(GraftFunctions.builders.map(_._1).distinct.size ==
      GraftFunctions.builders.size, "duplicate SQL function names")
  }

  test("SQL functions honor literal parameters and reject bad arity") {
    GraftFunctions.register(spark)
    // optional parameter is honored, not silently ignored
    val sig = spark.sql(
      "SELECT size(minhash_signature(array('a','b','c','d'), 64)) AS n").head().getInt(0)
    assert(sig == 64)
    val sigDefault = spark.sql(
      "SELECT size(minhash_signature(array('a','b','c','d'))) AS n").head().getInt(0)
    assert(sigDefault == 128)
    // arity violations fail at analysis, not silently
    val tooMany = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1.0), array(1.0), array(1.0))").collect()
    }
    assert(tooMany.getMessage.contains("cosine_sim"))
    val nonLiteral = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array('a'), length('xx'))").collect()
    }
    assert(nonLiteral.getMessage.contains("literal"))
  }

  test("redact_pii SQL function matches the Column-API redactor") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT redact_pii('mail a@b.io or +1-555-123-4567 at 10.0.0.1, ssn 123-45-6789') AS r")
      .head().getString(0)
    assert(got == "mail [EMAIL] or [PHONE] at [IP], ssn [SSN]", got)
  }

  test("hash-sketch SQL functions refuse wrong-typed input at ANALYSIS, not mid-job") {
    // the family is SQL-registered, so a wrong-typed argument previously
    // passed analysis (UnaryExpression's default check) and died as an
    // executor ClassCastException on the first row — the vector family's
    // checkInputDataTypes discipline now applies here too
    GraftFunctions.register(spark)
    val bad = Seq(
      "SELECT hashed_shingles(array(1, 2, 3), 2)",       // array<int>, not array<string>
      "SELECT minhash_signature(array(1L), 4)",           // array<bigint> tokens
      "SELECT simhash64(42)",                             // not an array at all
      "SELECT minhash_from_hashes(array('a', 'b'), 4)",   // strings, not hashes
      "SELECT doc_fingerprint(42)")                       // int, not string
    bad.foreach { q =>
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(q).collect()
      }
      assert(e.getMessage.contains("requires"), s"$q -> ${e.getMessage}")
    }
    // the well-typed forms still evaluate
    assert(spark.sql("SELECT size(hashed_shingles(array('a','b','c'), 2)) AS n")
      .head().getInt(0) == 2)
    assert(spark.sql("SELECT doc_fingerprint('abc') = doc_fingerprint('abc')")
      .head().getBoolean(0))
  }
}
