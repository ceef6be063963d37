package graft.maintain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Physical layout writer for the fact table — the Spark rendering of the
  * reference's Iceberg table properties (`config/flink/create.sql:46-64`):
  *
  *  - partition by `(device_id_bucket, received_day)` (`:46-49`)
  *  - ZSTD parquet (`:52-53`)
  *  - sort within files by `(device_id, gps_epoch)` (`'write.order-by'`, `:56`)
  *    → row-group min/max stats become selective for device point-lookups
  *  - bloom filters on `device_id` / `correlation_id` (`:60-63`) → point
  *    predicates skip row groups that stats alone can't exclude
  *
  * At 100 TB this layout is what turns the serving path's point lookup into
  * "prune to 1 bucket × few days, then skip most row groups".
  */
object Layout {

  def writeFact(fact: DataFrame, path: String,
                targetFileBytes: Long = 256L << 20): Unit =
    fact
      .repartition(col("device_id_bucket"), col("received_day"))
      .sortWithinPartitions(col("device_id"), col("gps_epoch"))
      .write
      .mode("overwrite")
      .partitionBy("device_id_bucket", "received_day")
      .option("compression", "zstd")
      .option("parquet.block.size", targetFileBytes.toString)
      .option("parquet.bloom.filter.enabled#device_id", "true")
      .option("parquet.bloom.filter.enabled#correlation_id", "true")
      .parquet(path)
}
