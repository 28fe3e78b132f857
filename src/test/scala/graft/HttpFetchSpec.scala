package graft

import java.io.ByteArrayOutputStream
import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import java.util.zip.GZIPOutputStream

import com.sun.net.httpserver.HttpServer
import graft.sources.{HttpFetch, Readers}

/** S13: HTTP fetch staging, tested against an in-process HTTP server
  * (no egress in this environment; the JDK server stands in for the
  * GENCODE host). */
class HttpFetchSpec extends SparkSpec {

  private val gtfText =
    "chr1\tHAVANA\tgene\t2001\t3000\t.\t+\t.\tgene_id \"E1\"; gene_type \"protein_coding\"; gene_name \"TP53\";\n"

  private def gzip(s: String): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(buf)
    g.write(s.getBytes("UTF-8")); g.close()
    buf.toByteArray
  }

  test("stage: fetch, retry on 500, resume skip, gz-transparent read") {
    val failures = new AtomicInteger(2) // first two requests 500
    val hits = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/release_48/gencode.v48.basic.annotation.gtf.gz",
      exchange => {
        hits.incrementAndGet()
        if (failures.getAndDecrement() > 0) {
          exchange.sendResponseHeaders(500, -1)
        } else {
          val body = gzip(gtfText)
          exchange.sendResponseHeaders(200, body.length)
          exchange.getResponseBody.write(body)
        }
        exchange.close()
      })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val dir = Files.createTempDirectory("gencode").toString
      val staged = HttpFetch.gencodeGtf(48, dir, baseUrl = base)
      assert(staged.toString.endsWith("gencode_genes_48.gtf.gz"))
      assert(hits.get() == 3) // 2 failures + 1 success

      // S9: Spark's reader decompresses the staged .gz transparently
      val genes = Readers.gtf(spark, staged.toString)
      assert(genes.count() == 1)

      // X6 resume: second stage call is a no-op (no new request)
      HttpFetch.gencodeGtf(48, dir, baseUrl = base)
      assert(hits.get() == 3)
    } finally server.stop(0)
  }

  test("stage: exhausted retries surface the last error") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/gone", exchange => {
      exchange.sendResponseHeaders(404, -1); exchange.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val dir = Files.createTempDirectory("gencode404").toString
      val e = intercept[java.io.IOException] {
        HttpFetch.stage(s"$base/gone", dir, "x.gtf.gz",
          retries = 1, backoffMs = 1L)
      }
      assert(e.getMessage.contains("after 2 attempts"))
    } finally server.stop(0)
  }
}
