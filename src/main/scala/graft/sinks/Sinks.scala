package graft.sinks

import org.apache.spark.sql.DataFrame

/** K-family batch sinks (SURVEY.md §2.2). The engine's outputs flow
  * through one trait so a pipeline swaps MySQL for parquet (or any JDBC
  * database) by configuration, exactly as the reference's per-module
  * `store.go` loaders all share one pool (db/mysql.go:8-19).
  */
trait Sink extends Serializable {
  def write(df: DataFrame): Unit
}

/** K2: JDBC batch sink — the Spark-native replacement for the
  * reference's row-at-a-time prepared INSERT loaders
  * (apna/store.go:16-61, jobstreet/store.go:16-62, kitalulus/store.go:
  * 15-65, olx_c226/store.go:16-61). Differences by design:
  *
  *   - executors write partitions concurrently with batched inserts
  *     (`batchsize`), replacing the single-goroutine channel drain;
  *   - `numPartitions` caps concurrent connections like the reference
  *     pool's idle limit (db/mysql.go:16-17: 200 open / 10 idle);
  *   - `isolationLevel` READ_COMMITTED matches autocommitted INSERTs.
  *
  * In-sandbox the sink runs for real against embedded Derby (its
  * driver ships on the Spark classpath): q94 round-trips a table
  * through `jdbc:derby:` and SinksSpec pins write+readback fidelity
  * with concurrent writer partitions. MySQL differs only in `url` /
  * `driver` strings (no MySQL driver jar ships here, so that pairing
  * stays configuration).
  */
final case class JdbcSink(url: String, table: String, user: String,
                          password: String,
                          driver: String = "com.mysql.cj.jdbc.Driver",
                          batchSize: Int = 128, // channel cap (apna/main.go:119)
                          numPartitions: Int = 10) // pool idle (db/mysql.go:17)
    extends Sink {

  def options: Map[String, String] = Map(
    "url" -> url,
    "dbtable" -> table,
    "user" -> user,
    "password" -> password,
    "driver" -> driver,
    "batchsize" -> batchSize.toString,
    "numPartitions" -> numPartitions.toString,
    "isolationLevel" -> "READ_COMMITTED"
  )

  override def write(df: DataFrame): Unit =
    df.write.format("jdbc").mode("append").options(options).save()
}

/** Parquet sink — the sandbox-exercised implementation. */
final case class ParquetSink(path: String, mode: String = "append")
    extends Sink {
  override def write(df: DataFrame): Unit =
    df.write.mode(mode).parquet(path)
}

/** K1-adjacent batch CSV sink (the micro-batched streaming variant
  * lives in graft.streaming.Streams).
  */
final case class CsvSink(path: String, header: Boolean = true,
                         mode: String = "append") extends Sink {
  override def write(df: DataFrame): Unit =
    df.write.mode(mode).option("header", header.toString).csv(path)
}
