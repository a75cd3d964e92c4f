package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class RelationalSpec extends SparkTestBase {

  test("q_scan returns every customer exactly once, ordered") {
    val df = Relational.qScan(spark, sfDir)
    val n  = df.count()
    assert(n > 0)
    assert(df.select("c_custkey").distinct().count() == n)
    val keys = df.select("c_custkey").collect().map(_.getLong(0))
    assert(keys.sameElements(keys.sorted))
  }

  test("q_point_lookup finds exactly the requested key") {
    val rows = Relational.qPointLookup(spark, sfDir).collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 42L)
  }

  test("q_point_lookup_silver equals the base-table lookup, twice (cached layout)") {
    val base = Relational.qPointLookup(spark, sfDir)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment").collect().toSeq
    // two invocations: the second must serve from the cached layout
    // and agree — a rebuilt-per-call layout would still pass, but a
    // stale or mis-sharded cache would not
    val s1 = Relational.qPointLookupSilver(spark, sfDir).collect().toSeq
    val s2 = Relational.qPointLookupSilver(spark, sfDir).collect().toSeq
    assert(s1 == base && s2 == base)
  }

  test("q_filtered_search applies all three predicates") {
    // join on the key only — carrying the query's own c_name/c_acctbal into
    // the join would create duplicate column names and getAs could silently
    // resolve against the wrong side (round-1 advice)
    val rows = Relational.qFilteredSearch(spark, sfDir).select("c_custkey")
      .join(spark.read.parquet(s"$sfDir/customer.parquet"), "c_custkey")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("c_mktsegment") == "BUILDING")
      assert(r.getAs[Double]("c_acctbal") > 5000.0)
      assert(r.getAs[String]("c_name").startsWith("Customer#00000"))
    }
  }

  test("q_project_nested extracts the json int") {
    val df = Relational.qProjectNested(spark, sfDir)
    assert(df.filter(col("k_val").isNull).count() == 0)
    assert(df.schema("k_val").dataType.typeName == "integer")
  }

  test("q_drop_cols removes exactly the dropped columns") {
    val cols = Relational.qDropCols(spark, sfDir).columns.toSet
    assert(!cols.contains("l_tax") && !cols.contains("l_discount") &&
      !cols.contains("l_linestatus"))
    assert(cols.contains("l_orderkey") && cols.contains("l_quantity"))
  }

  test("q_array_filter scrubs stop tokens") {
    val rows = Relational.qArrayFilter(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val head = r.getAs[String]("head_words").split(" ")
      assert(!head.contains("a") && !head.contains("the"))
    }
  }

  test("q_topk is the global top 10 by totalprice") {
    val got = Relational.qTopk(spark, sfDir).collect()
      .map(r => (r.getDouble(2), r.getLong(0)))
    val want = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_totalprice"), col("o_orderkey")).collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy { case (p, k) => (-p, k) }.take(10)
    assert(got.sameElements(want))
  }

  test("q_topk_per_group equals the row_number window formulation") {
    import org.apache.spark.sql.expressions.Window
    val got = Relational.qTopkPerGroup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val want = spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("o_custkey"), col("rank"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_first_per_key returns one deterministic row per customer") {
    val df = Relational.qFirstPerKey(spark, sfDir)
    val n  = df.count()
    assert(df.select("o_custkey").distinct().count() == n)
    // the pick is the min (o_orderdate, o_orderkey) of that customer
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val manual = orders.groupBy("o_custkey")
      .agg(min(struct(col("o_orderdate"), col("o_orderkey"))).as("m"))
      .select(col("o_custkey"), col("m.o_orderkey").as("first_orderkey"))
    assert(df.select("o_custkey", "first_orderkey")
      .except(manual).count() == 0)
  }

  test("q_count_by_key group totals sum to table size") {
    val df = Relational.qCountByKey(spark, sfDir)
    val total = df.agg(sum("n")).collect().head.getLong(0)
    assert(total == spark.read.parquet(s"$sfDir/lineitem.parquet").count())
  }

  test("q_null_impute never yields null or the sentinel segment") {
    val vals = Relational.qNullImpute(spark, sfDir)
      .select("segment_imputed").distinct().collect().map(_.getString(0))
    assert(!vals.contains(null) && !vals.contains("MACHINERY"))
    assert(vals.contains("Not found"))
  }

  test("q_concat_norm skips nulled-out segments") {
    val auto = Relational.qConcatNorm(spark, sfDir)
      .join(spark.read.parquet(s"$sfDir/customer.parquet"), "c_custkey")
      .filter(col("c_mktsegment") === "AUTOMOBILE")
      .select("norm_text").collect().map(_.getString(0))
    assert(auto.nonEmpty)
    auto.foreach(t => assert(!t.contains("AUTOMOBILE") && !t.contains("  ")))
  }

  test("q_string_shape formats prio char and yyyyMMdd") {
    val rows = Relational.qStringShape(spark, sfDir).limit(50).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("prio_code").matches("[1-5]"))
      assert(r.getAs[String]("date_str").matches("\\d{8}"))
    }
  }

  test("q_profile matches a driver-side per-column recompute") {
    val got = Relational.qProfile(spark, sfDir).collect()
      .map(r => (r.getAs[String]("column"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_nulls"), r.getAs[Long]("n_distinct"),
        Option(r.getAs[Any]("min_num")), Option(r.getAs[Any]("max_num")),
        Option(r.getAs[String]("min_str")),
        Option(r.getAs[String]("max_str"))))
    val orders = spark.read.parquet(s"$sfDir/orders.parquet").collect()
    val n = orders.length.toLong
    def stat[T](c: String)(implicit ord: Ordering[T]) = {
      val vs: Seq[T] = orders.toSeq.flatMap(r => Option(r.getAs[T](c)))
      (n, (orders.length - vs.length).toLong, vs.distinct.length.toLong,
        vs.min(ord), vs.max(ord))
    }
    got.foreach {
      case ("o_orderkey", nr, nn, nd, mn, mx, None, None) =>
        val s = stat[Long]("o_orderkey")
        assert((nr, nn, nd) == (s._1, s._2, s._3))
        assert(mn.contains(s._4.toDouble) && mx.contains(s._5.toDouble))
      case ("o_orderstatus", nr, nn, nd, None, None, mn, mx) =>
        val s = stat[String]("o_orderstatus")
        assert((nr, nn, nd) == (s._1, s._2, s._3))
        assert(mn.contains(s._4) && mx.contains(s._5))
      case ("o_totalprice", nr, nn, nd, mn, mx, None, None) =>
        val s = stat[Double]("o_totalprice")
        assert((nr, nn, nd) == (s._1, s._2, s._3))
        assert(mn.contains(s._4) && mx.contains(s._5))
      case (c, nr, nn, nd, mn, mx, mns, mxs) =>
        assert(nr == n && nn == 0L && nd > 0L, c)
        assert(mn.isDefined != mns.isDefined, c) // exactly one kind
    }
    assert(got.map(_._1).toSeq ==
      Seq("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority",
        "o_orderstatus", "o_totalprice"))
  }

  test("profile counts nulls, excludes them from distinct, all-null min is null") {
    import spark.implicits._
    val fx = Seq(
      (Some(1L), Some("a"), Option.empty[Long]),
      (Some(1L), None, None),
      (None, Some("b"), None))
      .toDF("k", "s", "dead")
    val rows = Relational.profile(fx,
      Seq("k" -> "num", "s" -> "str", "dead" -> "num")).collect()
      .map(r => r.getAs[String]("column") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"),
          r.getAs[Long]("n_distinct"), Option(r.getAs[Any]("min_num")),
          Option(r.getAs[String]("min_str")))).toMap
    assert(rows("k") == ((3L, 1L, 1L, Some(1.0), None)))
    assert(rows("s") == ((3L, 1L, 2L, None, Some("a"))))
    // a fully-null column: 3 nulls, zero distinct, NULL min/max
    assert(rows("dead") == ((3L, 3L, 0L, None, None)))
  }

  test("q_profile_approx: every estimate within ±5% of the exact row, no Expand") {
    val exact = Relational.qProfile(spark, sfDir).collect()
      .map(r => r.getAs[String]("column") -> r.getAs[Long]("n_distinct"))
      .toMap
    val q = Relational.qProfileApprox(spark, sfDir)
    val rows = q.collect()
    assert(rows.length == exact.size)
    rows.foreach { r =>
      val c = r.getAs[String]("column")
      val approx = r.getAs[Long]("n_distinct")
      val ex = exact(c)
      assert(math.abs(approx - ex) <= math.max(1L, (0.05 * ex).toLong),
        s"$c: approx=$approx exact=$ex")
      // the non-distinct stats are exact in BOTH variants — identical
      assert(r.getAs[Long]("n_rows") > 0)
    }
    // swapping exactness for a sketch removes the Expand: one scan,
    // one ordinary two-phase aggregate
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Expand"), plan)
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan)
  }

  test("profile plan: hash-aggregated Expand distincts, no per-column scans") {
    val q = Relational.qProfile(spark, sfDir)
    q.collect()
    // AQE's toString repeats the initial plan below the final one —
    // pin the FINAL section only
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the exact multi-column distinct plans ONE Expand pass for ALL
    // distinct columns — never a scan or aggregate per profiled column
    assert(plan.contains("Expand"), plan)
    // r19: the string min/max live in a narrow 2-column side pass so
    // the Expand pass HASH-aggregates (a string in the shared buffer
    // used to force SortAggregate over #cols+1 × rows — measured
    // 1.7 s of the 2.0 s sf0.1 profile). Hence ≤2 scans total: the
    // wide Expand pass plus the strings pass (column pruning gives it
    // its own narrow scan; exchange reuse cannot merge different
    // ReadSchemas).
    assert("Scan parquet".r.findAllIn(plan).size <= 2, plan)
    val aboveExpand = plan.split("Expand").head
    assert(aboveExpand.contains("HashAggregate"), plan)
    assert(!aboveExpand.contains("SortAggregate"), plan)
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql keys line up") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
}
