package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions.col

/** The production implementation of [[EventStreams.FeatureSink]]: POST each
  * FeatureCollection payload to an HTTP endpoint — the reference's real sink
  * (`this.submit(fc)`, task.ts:294, which the ETL base delivers to CloudTAK
  * over HTTP), with the reference's DEBUG switch printing every payload to
  * the log (task.ts:76).
  *
  * Scale shape: the POSTs run inside `foreachPartition`, one `HttpClient`
  * per partition, so a 1000-executor job fans its (bounded, see
  * [[graft.geotab.GeotabPipeline.featureCollections]]) payloads out from the
  * executors — the driver never sees a byte of the data. Each payload is
  * retried on 5xx/connection failure with exponential backoff; a 4xx fails
  * fast (re-sending an invalid payload can't succeed). Exhausted retries
  * throw, failing the Spark task — delivery is at-least-once under task
  * retry, so the `X-Graft-Batch` header carries (batchId, bucket) for
  * receiver-side dedup.
  *
  * @param url        endpoint; empty string = console-only mode (the
  *                   reference's DEBUG-style local run with no TAK server)
  * @param payloadCol column holding the JSON payload (one POST body per row)
  * @param idCol      column identifying the payload within the batch for the
  *                   idempotency header
  */
class HttpFeatureSink(
    url: String,
    payloadCol: String = "collection_json",
    idCol: String = "fc_bucket",
    maxRetries: Int = 3,
    backoffMs: Long = 100,
    debug: Boolean = false) extends EventStreams.FeatureSink {

  override def submit(batch: Dataset[Row], batchId: Long): Unit = {
    val (u, retries, backoff, dbg) = (url, maxRetries, backoffMs, debug)
    batch.select(col(payloadCol).as("payload"), col(idCol).cast("string").as("pid"))
      .rdd.foreachPartition { rows =>
        val client = HttpClient.newBuilder()
          .connectTimeout(Duration.ofSeconds(10)).build()
        rows.foreach { r =>
          val payload = r.getString(0)
          if (dbg) println(s"[graft-sink] batch=$batchId ${r.getString(1)}: $payload")
          if (u.nonEmpty)
            HttpFeatureSink.post(client, u, payload, s"$batchId/${r.getString(1)}",
              retries, backoff)
        }
      }
  }
}

/** The reference's whole submit path per scheduled run (task.ts:233-294):
  * assemble the micro-batch's flat features into bounded FeatureCollection
  * payloads and POST each one. Plugs into [[EventStreams.featureWriter]], so
  * `readStream → featuresFlat → FeatureCollection → HTTP` is one line. */
class FeatureCollectionHttpSink(
    url: String,
    nBuckets: Int = 1,
    maxRetries: Int = 3,
    backoffMs: Long = 100,
    debug: Boolean = false) extends EventStreams.FeatureSink {
  private val http =
    new HttpFeatureSink(url, "collection_json", "fc_bucket", maxRetries, backoffMs, debug)
  override def submit(batch: Dataset[Row], batchId: Long): Unit =
    http.submit(graft.geotab.GeotabPipeline.featureCollections(batch, nBuckets), batchId)
}

object HttpFeatureSink {

  /** POST one payload with bounded retry. Retries 5xx and transport errors
    * (the transient class); any 2xx succeeds; other statuses (4xx) throw
    * immediately. Backoff doubles per attempt from `backoffMs`. */
  private[streaming] def post(client: HttpClient, url: String, payload: String,
                              batchTag: String, maxRetries: Int,
                              backoffMs: Long): Unit = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .header("Content-Type", "application/json")
      .header("X-Graft-Batch", batchTag)
      .POST(HttpRequest.BodyPublishers.ofString(payload))
      .build()
    var attempt = 0
    var done = false
    while (!done) {
      attempt += 1
      val status =
        try {
          val rsp = client.send(req, HttpResponse.BodyHandlers.ofString())
          if (rsp.statusCode() / 100 == 2) { done = true; rsp.statusCode() }
          else if (rsp.statusCode() / 100 == 5) rsp.statusCode()
          else throw new RuntimeException(
            s"feature sink: $url rejected payload with ${rsp.statusCode()}: ${rsp.body()}")
        } catch {
          case e: java.io.IOException =>
            if (attempt > maxRetries)
              throw new RuntimeException(
                s"feature sink: $url unreachable after $maxRetries retries", e)
            -1
        }
      if (!done) {
        if (attempt > maxRetries)
          throw new RuntimeException(
            s"feature sink: $url still failing ($status) after $maxRetries retries")
        Thread.sleep(backoffMs << (attempt - 1))
      }
    }
  }
}
