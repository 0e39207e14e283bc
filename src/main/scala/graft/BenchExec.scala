package graft

import org.apache.spark.sql.DataFrame

/** Full-plan materialization for benchmark timing.
  *
  * Why not `df.count()`: Catalyst optimizes the PLAN OF THE COUNT, not
  * the query as written — projections, window functions, and sorts
  * whose outputs the count never references are pruned away, and with
  * them the column scans that feed them. For narrow per-row operators
  * (text analysis, window frames, scalar functions) `count()` can
  * degenerate to a metadata-only parquet row count: the q35 RANGE
  * frame "ran" 10 M rows in 0.28 s at the 100× decade because the
  * window never executed. Typed Dataset folds were immune (opaque
  * closures can't be pruned), which silently skewed every
  * narrow-vs-typed comparison.
  *
  * `queryExecution.toRdd` executes the query's own optimized plan —
  * every output column is materialized into each UnsafeRow — and the
  * per-partition iteration forces it end to end, adding only a row
  * counter on top. This is what "run the query" must mean in a
  * benchmark.
  */
object BenchExec {
  def materialize(df: DataFrame): Long =
    df.queryExecution.toRdd.mapPartitions { it =>
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      Iterator.single(n)
    }.fold(0L)(_ + _)
}
