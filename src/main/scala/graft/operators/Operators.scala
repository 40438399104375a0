package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Reusable, generic operator library (SURVEY.md §7.1 `ops/`). The
  * SparkEntry queries are thin bindings of these operators to the
  * testdata; a user of the reference switches to these directly.
  * Every operator is a LogicalPlan composition — Catalyst sees through
  * all of them (pushdown, pruning, AQE apply as usual).
  */
object Operators {

  /** Forward as-of join, one-shuffle form: for each left row, the
    * minimum `rightTime` strictly greater than `leftTime` within the
    * same `key` — the scale path for "next event after" semantics
    * (reference composition: theta join + rank,
    * `src/plane_naolib_consumer.py:93-105`).
    *
    * Implementation: union the two sides, one shuffle+sort on (key,
    * time), running min of right-times over a strictly-following range
    * frame. No join blow-up when a key has many right rows. */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      resultCol: String = "asof_time"): DataFrame = {
    require(!Seq("_side", "_t", "_rt").exists(left.columns.contains),
      "asofForward reserves columns _side/_t/_rt")
    val l = left.withColumn("_side", lit(0))
      .withColumn("_t", col(leftTime).cast("long"))
    val r = right.select(col(key), col(rightTime).cast("long").as("_t"))
      .withColumn("_side", lit(1))
      .withColumn("_rt", col("_t"))
    val w = Window.partitionBy(col(key)).orderBy(col("_t"))
      .rangeBetween(1L, Window.unboundedFollowing)
    l.unionByName(r, allowMissingColumns = true)
      // join semantics for NULL keys: no match. Without the mask the
      // window would group every NULL key into one partition and hand
      // left rows an asof time from unrelated NULL-key right rows.
      .withColumn(resultCol,
        when(col(key).isNull, lit(null)).otherwise(min(col("_rt")).over(w)))
      .filter(col("_side") === 0)
      .drop("_side", "_t", "_rt")
  }

  /** Gap-based sessionization: assign `session_idx` per key from
    * inactivity gaps > `gapS` seconds. One shuffle serves the lag, the
    * cumulative sum, and any downstream per-session aggregation. */
  def sessionize(df: DataFrame, key: String, tsSeconds: String,
      tieBreak: String, gapS: Long): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsSeconds).asc, col(tieBreak).asc)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_gap", col(tsSeconds) - lag(col(tsSeconds), 1).over(w))
      .withColumn("_new",
        when(col("_gap").isNull || col("_gap") > gapS, 1).otherwise(0))
      .withColumn("session_idx", sum(col("_new")).over(cum))
      .drop("_gap", "_new")
  }

  /** Deterministic keep-first dedup: rank-1 per key by `order` — unlike
    * dropDuplicates, which survivor wins is well-defined
    * (streaming twin: dropDuplicatesWithinWatermark). */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String],
      order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Per-partition top-k by an ordering — rank ≤ k with deterministic
    * tie-break columns included in `order`. */
  def topKPerGroup(df: DataFrame, partition: Seq[String],
      order: Seq[Column], k: Int, rankCol: String = "rank"): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w).cast("long"))
      .filter(col(rankCol) <= k)
  }

  /** Skew-mitigating inner equi-join: salt the skewed big side into
    * `saltFactor` sub-keys and replicate the small side across salts.
    * Result is identical to `big.join(small, keys)`; the shuffle of a
    * hot key spreads over `saltFactor` reducers. AQE's skew-join
    * handles moderate skew automatically — this is the explicit lever
    * for the pathological keys AQE can't split (e.g. a single null-ish
    * key holding >1 partition of data). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt"), "inner").drop("_salt")
  }

  /** Band/range join of a fact table against a small interval table
    * (lo <= v < hi). The interval side broadcasts, so the "range join"
    * is a broadcast nested loop over a handful of rows — the right
    * physical plan when bands are few; for large interval tables, bin
    * both sides to an equi-key first. */
  def bandJoin(facts: DataFrame, bands: DataFrame, valueCol: String,
      loCol: String, hiCol: String): DataFrame =
    facts.join(broadcast(bands),
      col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol), "inner")

  /** Persist a table bucketed and sorted by its join key — the
    * repeated-join lever at 100 TB: two tables bucketed into the same
    * `buckets` count on their join keys sort-merge-join with NO
    * exchange, because the on-disk layout already satisfies the join's
    * required distribution. Pay one write-time shuffle, skip a shuffle
    * in every subsequent join.
    *
    * The per-query SORT is a separate, smaller win: since Spark 3 the
    * scan reports bucket sort order only under
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true`, and that
    * is only safe when each bucket is a single file. The repartition
    * below aligns write tasks with bucket hashing (both are Murmur3
    * `hashpartitioning` on the key), so each task holds exactly one
    * bucket and writes exactly one file — making the flag safe for
    * tables written here. BucketingSpec asserts the exchange-free plan
    * unconditionally and the sort-free plan under the flag. Spark
    * buckets are metastore-backed (`saveAsTable`) — plain
    * `.parquet(path)` writes cannot carry bucket metadata. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.repartition(buckets, col(key))
      .write.bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").format("parquet").saveAsTable(table)

  /** Persist a table partitioned by a low-cardinality column — the
    * scan-elimination lever at 100 TB: a filter on the partition column
    * prunes whole directories at PLANNING time (PartitionFilters in the
    * scan node), so a query over one source/day/language reads only its
    * slice of a 100 TB table, no matter how wide the table grows. The
    * complement of [[writeBucketed]]: partitioning prunes SCANS on a
    * coarse key, bucketing removes SHUFFLES on a fine join key — a
    * production corpus table typically uses both
    * (`partitionBy(source).bucketBy(n, doc_id)`).
    *
    * The pre-repartition on the partition column keeps writers to one
    * open file per partition value per task batch instead of
    * numTasks×numPartitions small files — the small-files failure mode
    * that kills 100 TB scans. Skewed partition values are the known
    * cost (one value = one task's output); mitigate by salting the
    * repartition when a single partition dominates. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.repartition(col(partitionCol))
      .write.partitionBy(partitionCol)
      .mode("overwrite").parquet(path)
}
