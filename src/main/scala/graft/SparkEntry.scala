package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query catalog is assembled from per-module QueryDef lists; every
  * entry is one declared operator from SURVEY.md §2 Table B (or a
  * north-star extension), with DuckDB oracle SQL where expressible.
  */
object SparkEntry {

  private val modules: Seq[Seq[QueryDef]] = Seq(
    Relational.defs,
    Joins.defs,
    Aggregates.defs,
    WindowQueries.defs,
    ScalarQueries.defs,
    TextQueries.defs,
    Dedup.defs,
    Similarity.defs,
    SourceCoverage.defs,
    TextAnalysis.defs,
    Multimodal.defs,
    MapReduceQueries.defs,
    graft.streaming.StreamingQueries.defs,
    Extras.defs,
    FunctionCoverage.defs,
    TpchShapes.defs,
    Pipeline.defs,
    Bucketing.defs,
    TrainingPipeline.defs,
    Analytics.defs,
    ZOrder.defs,
    ChangeData.defs,
    Linkage.defs,
    Graph.defs,
    Basket.defs,
    Skyline.defs,
    Maintenance.defs,
    Quality.defs,
    SkewJoin.defs,
    DataSkipping.defs,
    Blocklist.defs,
    Archive.defs,
    Markdown.defs,
    Code.defs,
    Pii.defs,
    Csv.defs,
    Json.defs,
    Protobuf.defs,
    Avro.defs,
    UnicodeScripts.defs,
    Frontier.defs,
    Postings.defs,
    Sharding.defs,
    Winnowing.defs,
    Pixels.defs,
    Pcm.defs,
    Flac.defs,
    Cdxj.defs,
    Subtitles.defs,
    Id3.defs,
    Ebml.defs,
    ParquetFooter.defs,
    Avi.defs,
    Jpeg.defs,
    Latex.defs,
    TableText.defs,
    Chat.defs,
    MsgPack.defs,
    Cbor.defs,
    Mbox.defs,
    XzCodec.defs,
    GitPack.defs,
    Bzip2.defs,
    Ar.defs,
    PdfFilters.defs,
    Punycode.defs,
    ParquetPages.defs,
    AvroRecords.defs,
    Orc.defs,
    ArrowIpc.defs,
    Lz4Codec.defs,
    Cpio.defs)

  private lazy val defs: Seq[QueryDef] = modules.flatten

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryDef.toQueries(defs)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    QueryDef.toOracle(defs)
}
