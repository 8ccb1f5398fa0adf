package graft

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.functions._

import graft.streaming.{QuoteStreams, TradeStreams}

/** Avro ingest parity: value bytes encoded with the reference's
  * registered writer schemas (trade.avsc / quote.avsc) decode to the
  * same rows the JSON path produces. Fixtures are encoded with the
  * plain Avro Java API — independent of Spark's own to_avro — so this
  * exercises real registry-style binary, not a roundtrip identity.
  */
class AvroIngestSpec extends SparkSpecBase {
  import spark.implicits._

  private def encodeTrade(symbol: String, price: Double, volume: Long,
                          ts: Long, conds: Seq[String], ingest: Long): Array[Byte] = {
    val schema = new Schema.Parser().parse(TradeStreams.tradeAvroSchema)
    val rec: GenericRecord = new GenericData.Record(schema)
    rec.put("symbol", symbol)
    rec.put("price", price)
    rec.put("volume", volume)
    rec.put("timestamp", ts)
    val arr = new java.util.ArrayList[CharSequence]()
    conds.foreach(arr.add)
    rec.put("conditions", arr)
    rec.put("ingestion_time", ingest)
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  test("Avro-encoded trades decode to the same rows as the JSON path (P1 parity)") {
    val fixtures = Seq(
      ("AAPL", 150.25, 100L, 1705312800000L, Seq("regular"), 1705312801000L),
      ("MSFT", 388.5, 42L, 1705312860000L, Seq.empty[String], 1705312861000L))
    val avroDf = fixtures.map(f =>
      encodeTrade(f._1, f._2, f._3, f._4, f._5, f._6)).toDF("value")
    val jsonDf = fixtures.map { f =>
      val conds = f._5.map("\"" + _ + "\"").mkString("[", ",", "]")
      s"""{"symbol":"${f._1}","price":${f._2},"volume":${f._3},"timestamp":${f._4},"conditions":$conds,"ingestion_time":${f._6}}"""
    }.toDF("value")

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("symbol").collect().map(_.toSeq).toSeq
    val fromAvro = rows(TradeStreams.parseTradesAvro(avroDf))
    val fromJson = rows(TradeStreams.parseTrades(jsonDf))
    assert(fromAvro === fromJson)
    assert(fromAvro.nonEmpty)
  }

  test("Avro-encoded quotes decode with spread-ready fields and event time") {
    val schema = new Schema.Parser().parse(TradeStreams.quoteAvroSchema)
    val rec: GenericRecord = new GenericData.Record(schema)
    rec.put("symbol", "AAPL")
    rec.put("bid_price", 150.2)
    rec.put("bid_size", 300L)
    rec.put("ask_price", 150.3)
    rec.put("ask_size", 200L)
    rec.put("timestamp", 1705312800000L)
    rec.put("ingestion_time", 1705312801000L)
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    val bytes = Seq(out.toByteArray).toDF("value")
    val back = QuoteStreams.parseQuotesAvro(bytes).collect().head
    assert(back.getAs[String]("symbol") === "AAPL")
    assert(back.getAs[Double]("ask_price") === 150.3)
    assert(back.getAs[Long]("ingestion_time") === 1705312801000L)
    assert(back.getAs[java.sql.Timestamp]("event_time").getTime === 1705312800000L)
  }

  test("multi-topic scan splits by topic metadata; each branch parses its own format") {
    val raw = Seq(
      (TradeStreams.Topics.TradesRaw,
        """{"symbol":"AAPL","price":1.5,"volume":10,"timestamp":1705312800000,"conditions":[],"ingestion_time":0}"""),
      (TradeStreams.Topics.QuotesRaw,
        """{"symbol":"AAPL","bid_price":1.4,"bid_size":5,"ask_price":1.6,"ask_size":7,"timestamp":1705312800000}"""))
      .toDF("topic", "value")
    val trades = TradeStreams.parseTrades(
      TradeStreams.topicBranch(raw, TradeStreams.Topics.TradesRaw))
    val quotes = QuoteStreams.parseQuotes(
      TradeStreams.topicBranch(raw, TradeStreams.Topics.QuotesRaw))
    assert(trades.collect().map(_.getAs[Double]("price")).toSeq === Seq(1.5))
    assert(quotes.collect().map(_.getAs[Double]("ask_price")).toSeq === Seq(1.6))
    assert(TradeStreams.Topics.All.size === 4)
  }

  /** trade.avsc + an added field with a default — "version 2" of the
    * registered contract. Mirrors the evolution the registry's
    * BACKWARD mode permits (register_schemas.py:122): consumers
    * compiled against v2 keep reading v1 bytes.
    */
  private def tradeSchemaV2: String = {
    val v1 = TradeStreams.tradeAvroSchema
    val insertAt = v1.lastIndexOf("]}")
    v1.substring(0, insertAt) +
      """,{"name":"venue","type":"string","default":"UNKNOWN"}]}"""
  }

  test("BACKWARD evolution: v2 reader (added field w/ default) decodes v1-writer bytes") {
    val v1Bytes = Seq(
      encodeTrade("AAPL", 150.25, 100L, 1705312800000L, Seq("regular"), 1705312801000L))
      .toDF("value")
    val decoded = v1Bytes.select(graft.functions.AvroFunctions
        .fromAvroEvolved(col("value"), tradeSchemaV2, TradeStreams.tradeAvroSchema)
        .as("trade"))
      .select(col("trade.*")).collect().head
    assert(decoded.getAs[String]("symbol") === "AAPL")
    assert(decoded.getAs[Double]("price") === 150.25)
    assert(decoded.getAs[Long]("timestamp") === 1705312800000L)
    // The v2-only field materializes from its schema default.
    assert(decoded.getAs[String]("venue") === "UNKNOWN")
  }

  test("FORWARD read: v1 reader skips the extra field in v2-writer bytes") {
    // Encode with the v2 writer schema (venue present on the wire).
    val schema = new Schema.Parser().parse(tradeSchemaV2)
    val rec: GenericRecord = new GenericData.Record(schema)
    rec.put("symbol", "MSFT")
    rec.put("price", 388.5)
    rec.put("volume", 42L)
    rec.put("timestamp", 1705312860000L)
    rec.put("conditions", new java.util.ArrayList[CharSequence]())
    rec.put("ingestion_time", 1705312861000L)
    rec.put("venue", "XNAS")
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    val decoded = Seq(out.toByteArray).toDF("value")
      .select(graft.functions.AvroFunctions
        .fromAvroEvolved(col("value"), TradeStreams.tradeAvroSchema, tradeSchemaV2)
        .as("trade"))
      .select(col("trade.*"))
    assert(!decoded.columns.contains("venue"))
    val row = decoded.collect().head
    assert(row.getAs[String]("symbol") === "MSFT")
    assert(row.getAs[Double]("price") === 388.5)
    assert(row.getAs[Long]("ingestion_time") === 1705312861000L)
  }

  test("nested-record Avro schemas are rejected at parse time, not per row") {
    val nested = """{"type":"record","name":"Outer","fields":[
      {"name":"inner","type":{"type":"record","name":"Inner","fields":[
        {"name":"x","type":"long"}]}}]}"""
    val e = intercept[IllegalArgumentException] {
      graft.functions.AvroFunctions.toSqlType(
        new Schema.Parser().parse(nested))
    }
    assert(e.getMessage.contains("nested record"))
  }

  test("App runs the full layer graph over an Avro-encoded stream (--format avro)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_app").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Array[Byte]]
    val cfg = graft.App.parseArgs(Array(
      "--format", "avro", "--layers", "bronze",
      "--out", s"$dir/out", "--checkpoint", s"$dir/ckp", "--trigger", "0 seconds"))
    assert(cfg.format === "avro")
    val mgr = graft.App.start(spark, mem.toDF().toDF("value"), cfg)
    mem.addData(
      encodeTrade("AAPL", 150.25, 100L, 1705312800000L, Seq("regular"), 1705312801000L),
      encodeTrade("MSFT", 388.5, 42L, 1705312860000L, Nil, 1705312861000L))
    mgr.processAllAvailable()
    mgr.stopAll()
    val bronze = spark.read.parquet(s"$dir/out/bronze")
    assert(bronze.count() === 2)
    assert(bronze.select("symbol").collect().map(_.getString(0)).toSet === Set("AAPL", "MSFT"))
  }

  test("multi-topic kafka source config carries the full subscribe list") {
    // No broker (or kafka connector) in the sandbox: assert the
    // reader-config contract the source is built from.
    val opts = TradeStreams.kafkaOptions("localhost:9092",
      TradeStreams.Topics.All, "earliest")
    assert(opts("subscribe") === "trades_raw,quotes_raw,crypto_raw,dead_letters")
    assert(opts("kafka.bootstrap.servers") === "localhost:9092")
    assert(opts("startingOffsets") === "earliest")
    assert(opts("failOnDataLoss") === "false")
    // Catch-up after downtime must arrive in bounded batches: the
    // per-trigger offset cap is on by default, not opt-in.
    assert(opts("maxOffsetsPerTrigger").toLong > 0)
    intercept[IllegalArgumentException] {
      TradeStreams.kafkaOptions("localhost:9092", Nil, "latest")
    }
  }
}
