package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data skipping.
  *
  * Parquet readers prune whole files/row-groups from min/max footer stats,
  * but stats only help if the layout makes them narrow. Sorting by one
  * column gives perfect pruning on that column and none on any other;
  * interleaving the bits of several columns' normalized ranks clusters rows
  * so every participating column has narrow per-file ranges — a filter on
  * ANY of them skips most files. This is the standard lakehouse layout
  * optimization for the "big fact table queried by several independent
  * keys" shape, applied at write (or compaction) time: the cost is one
  * range-partitioning shuffle, paid once, amortized over every later scan.
  *
  * Implementation is pure Column arithmetic (codegen'd, no UDF):
  * per-column linear normalization to `bitsPerCol`-bit ranks, then bit
  * interleave. Normalization bounds come from one tiny min/max aggregate
  * (driver receives 2 numbers per column — scale-free). Linear ranks are
  * right for roughly uniform keys; for heavily skewed columns substitute
  * quantile cut-points (approxQuantile) for the linear map — the interleave
  * and write path below stay identical.
  */
object ZOrder {

  /** Morton interleave of the given columns' normalized ranks.
    *
    * @param ranks       columns already normalized to [0, 2^bitsPerCol)
    * @param bitsPerCol  bits kept per column; cols.size * bitsPerCol <= 63
    */
  def interleaveBits(ranks: Seq[Column], bitsPerCol: Int): Column = {
    require(ranks.nonEmpty && ranks.size * bitsPerCol <= 63, "need cols*bits <= 63")
    val n = ranks.size
    ranks.zipWithIndex
      .map { case (r, i) =>
        (0 until bitsPerCol)
          .map(b => shiftleft(shiftright(r, b).bitwiseAND(lit(1L)), b * n + i))
          .reduce(_ bitwiseOR _)
      }
      .reduce(_ bitwiseOR _)
  }

  /** The z-value column for `cols` of `df`, normalizing each column to
    * `bitsPerCol` bits via its min/max (one small aggregate job).
    */
  def zValue(df: DataFrame, cols: Seq[String], bitsPerCol: Int = 16): Column = {
    val aggs = cols.flatMap(c => Seq(min(col(c)).cast("double"), max(col(c)).cast("double"))) :+
      count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val nonEmpty = row.getLong(2 * cols.size) > 0
    val nb = (1L << bitsPerCol) - 1
    val ranks = cols.zipWithIndex.map { case (c, i) =>
      if (row.isNullAt(2 * i) || row.isNullAt(2 * i + 1)) {
        // a non-empty input with null min/max means the column does not
        // CAST to double (strings, dates, all-null) — a silent lit(0)
        // rank would quietly defeat the clustering the caller asked for
        // while they believe filters on it prune
        require(!nonEmpty,
          s"zOrder column '$c' has no double-castable range on a non-empty input " +
            "(string/date/all-null column?) — cluster on numeric/timestamp columns, " +
            "or pre-derive a numeric key (hash, epoch) for it")
        lit(0L)
      } else {
        val (lo, hi) = (row.getDouble(2 * i), row.getDouble(2 * i + 1))
        require(!lo.isNaN && !hi.isNaN,
          s"zOrder column '$c' contains NaN — every row would rank identically " +
            "(NaN poisons the normalization); filter or nanvl them first")
        if (hi == lo) lit(0L)
        else
          // nanvl: a NaN VALUE (min/max can still be clean when ANSI-off
          // min/max skip NaN orderings oddly) must not rank as nb
          least(greatest(nanvl((col(c).cast("double") - lo) * nb / (hi - lo), lit(0.0)), lit(0.0)),
            lit(nb.toDouble))
            .cast("long")
      }
    }
    interleaveBits(ranks, bitsPerCol)
  }

  /** Write `df` as `numFiles` z-clustered parquet files: range-partition on
    * the z-value (so files own disjoint z-ranges ⇒ compact hyper-rectangles
    * of the key space), sort within each file (narrow row-group stats too),
    * drop the helper column, write. One shuffle total.
    *
    * `bitsPerCol` defaults so the interleave fits 63 bits for ANY column
    * count (16 bits up to 3 columns, then 63/n) — pass it explicitly to
    * weight resolution differently.
    */
  def writeZOrdered(
      df: DataFrame,
      cols: Seq[String],
      path: String,
      numFiles: Int,
      bitsPerCol: Int = 0
  ): Unit = {
    val bits = if (bitsPerCol > 0) bitsPerCol else math.min(16, 63 / math.max(cols.size, 1))
    // withColumn would silently REPLACE a pre-existing __z and the final
    // drop would then delete the caller's column from the written output
    require(!df.columns.contains("__z"), "input already has a __z column — rename it before z-ordering")
    df.withColumn("__z", zValue(df, cols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write
      .mode("overwrite")
      .parquet(path)
  }
}
