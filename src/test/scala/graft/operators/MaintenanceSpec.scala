package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The filesystem half of [[Maintenance]] — content preservation is
  * the driver-oracle-checked query; file topology is asserted here.
  */
class MaintenanceSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  private def parquetFiles(path: String): Seq[java.io.File] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet") && f.length() > 0).toSeq

  test("compaction collapses the fragmented layout to size-targeted files") {
    val root = Maintenance.ensure(spark, dir)
    val before = parquetFiles(s"$root/fragmented")
    val after = parquetFiles(s"$root/compacted")
    val rows = spark.read.parquet(s"$root/compacted").count()
    val want =
      ((rows + Maintenance.COMPACT_ROWS_PER_FILE - 1) /
        Maintenance.COMPACT_ROWS_PER_FILE).toInt
    assert(before.size > after.size,
      s"no compaction: ${before.size} -> ${after.size}")
    assert(after.size == want, s"expected $want files, got ${after.size}")
    // the whole point: mean bytes per file went UP
    val meanBefore = before.map(_.length()).sum / before.size
    val meanAfter = after.map(_.length()).sum / after.size
    assert(meanAfter > meanBefore,
      s"mean file size did not grow: $meanBefore -> $meanAfter")
  }

  test("equi-height histogram: equal-frequency buckets, exact rank bounds") {
    import spark.implicits._
    val b = Maintenance.EQUIHEIGHT_BUCKETS
    val out = Maintenance.equiheightHistogram(spark, dir).collect()
    val n = graft.sources.Tables(spark, dir, "orders").count()
    assert(out.length == b, s"expected $b buckets, got ${out.length}")
    assert(out.map(_.getLong(1)).sum == n, "bucket counts must sum to n")
    // equal frequency: every bucket holds floor(n/B) or ceil(n/B) rows
    // (rank-partitioning guarantee — the whole point vs equi-width)
    val (lo, hi) = (n / b, n / b + (if (n % b == 0) 0 else 1))
    out.foreach { r =>
      assert(r.getLong(1) >= lo && r.getLong(1) <= hi,
        s"bucket ${r.getLong(0)} has ${r.getLong(1)} rows, want [$lo,$hi]")
    }
    // buckets tile the value range in order: lo_k <= hi_k <= lo_{k+1}
    out.sliding(2).foreach {
      case Array(a, c) =>
        assert(a.getDouble(2) <= a.getDouble(3) &&
          a.getDouble(3) <= c.getDouble(2),
          s"bucket bounds not monotone: $a -> $c")
      case _ => ()
    }
    // plan pins for both stages: the sort is a DISTRIBUTED range
    // exchange (never one partition sorting the world — the q25
    // pathology), and the bucket aggregate partial-combines with no
    // Window anywhere
    val sortPlan = Maintenance.equiheightSorted(spark, dir)
      .queryExecution.executedPlan.toString
    assert(sortPlan.toLowerCase.contains("rangepartitioning"),
      s"expected a range exchange:\n$sortPlan")
    assert(!sortPlan.contains("SinglePartition"),
      s"sort must not collapse to one partition:\n$sortPlan")
    val sorted = Maintenance.equiheightSorted(spark, dir)
      .as[(Double, Long)].rdd
    val aggPlan = Maintenance.equiheightAgg(spark, sorted, n)
      .queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Window"),
      s"global-window sort crept in:\n$aggPlan")
    assert(aggPlan.contains("partial_count") ||
      aggPlan.toLowerCase.contains("partial"),
      s"bucket aggregate must partial-combine:\n$aggPlan")
  }

  test("table stats carry exact ndv and bounds") {
    import spark.implicits._
    val out = Maintenance.tableStats(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val keys = graft.sources.Tables(spark, dir, "orders")
      .select($"o_orderkey").as[Long].collect()
    val row = out("o_orderkey")
    assert(row.getLong(1) == keys.length)
    assert(row.getLong(3) == keys.distinct.length)
    assert(row.getDouble(4) == keys.min.toDouble)
    assert(row.getDouble(5) == keys.max.toDouble)
  }

  test("file skipping: zone map prunes most files, answer matches full scan") {
    val got = Maintenance.fileSkipping(spark, dir).collect()
      .map(_.toString).toSeq
    val (total, read) = Maintenance.lastSkipStats.get((spark, dir))
    assert(total == Maintenance.SKIP_FILES)
    // a 2-month predicate over a ~7-year span, 16 range files: the
    // overlap should touch only a few files
    assert(read <= total / 4, s"read $read of $total files — no pruning")
    // lossless: equals the plain filtered scan
    import org.apache.spark.sql.functions._
    val want = graft.sources.Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-03-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-05-01").cast("timestamp"))
      .groupBy(to_date(date_trunc("month", col("o_orderdate"))).as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
          .as("sum_cents"))
      .orderBy(col("month"))
      .collect().map(_.toString).toSeq
    assert(got == want)
  }

  test("z-ordered rewrite: every file bounds BOTH dimensions for skipping") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // run the content query first (also prepares the layout)
    val stages = Maintenance.zorderWrite(spark, dir).collect()
    assert(stages.length == 2 && stages(0).getLong(1) == stages(1).getLong(1))
    val root = Maintenance.ensureZorderWrite(spark, dir)
    val mask = (1L << Maintenance.ZORDER_BITS) - 1
    val perFile = spark.read.parquet(s"$root/zordered")
      .select(input_file_name().as("f"),
        $"o_custkey".bitwiseAND(lit(mask)).as("x"),
        datediff($"o_orderdate".cast("date"),
            lit(java.sql.Date.valueOf("1995-01-01")))
          .cast("long").bitwiseAND(lit(mask)).as("y"))
      .groupBy($"f")
      .agg(max($"x") - min($"x"), max($"y") - min($"y"))
      .collect()
    assert(perFile.length == Maintenance.ZORDER_FILES)
    // z-sorted files cover contiguous z-ranges: with 16 files ≈ 2
    // prefix bits per dimension, MEAN per-file spread must land well
    // under the global spread in BOTH dims — the either-column
    // skipping property a single-column sort cannot give
    val g = spark.read.parquet(s"$root/zordered")
      .select($"o_custkey".bitwiseAND(lit(mask)).as("x"),
        datediff($"o_orderdate".cast("date"),
            lit(java.sql.Date.valueOf("1995-01-01")))
          .cast("long").bitwiseAND(lit(mask)).as("y"))
      .agg(max($"x") - min($"x"), max($"y") - min($"y")).head()
    def mean(i: Int) = perFile.map(_.getLong(i)).sum.toDouble / perFile.length
    // each dim's MEAN per-file spread must land well under that dim's
    // OWN global spread (16 files ≈ 2 prefix bits per dim → ~1/4)
    assert(mean(1) <= g.getLong(0) / 2.0,
      s"x mean spread ${mean(1)} vs ${g.getLong(0)}")
    assert(mean(2) <= g.getLong(1) / 2.0,
      s"y mean spread ${mean(2)} vs ${g.getLong(1)}")
  }
}
