package graft.sources

import java.io.IOException
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.Duration

/** S13: HTTP fetch source (SURVEY.md §2.1 — the GENCODE GTF download,
  * workflows/cnv.py:319-347: curl → rename → gunzip). Fetching is a
  * DRIVER-SIDE staging step, not a distributed operator: one reference
  * file lands on shared storage and every executor reads the staged
  * copy (Spark's readers decompress `.gz` transparently, so the
  * reference's explicit gunzip step disappears — S9).
  *
  * Retry discipline matches the reference's task policy
  * (X4: bounded retries with exponential backoff, cnv.py:86-87).
  */
object HttpFetch {

  /** Fetch `url` to `destDir/fileName`, with `retries` exponential-
    * backoff attempts. Atomic publish: download to a temp file, move
    * into place, so a concurrent/resumed run never reads a torn file
    * (the idempotent-outputs convention, X6). Returns the staged path.
    * When the destination already exists and `overwrite` is false the
    * fetch is skipped entirely (file-level resume, vcf_anno.py:579). */
  def stage(url: String, destDir: String, fileName: String,
            retries: Int = 3, backoffMs: Long = 1000L,
            overwrite: Boolean = false,
            timeout: Duration = Duration.ofMinutes(5)): Path = {
    val dir = Paths.get(destDir)
    Files.createDirectories(dir)
    val dest = dir.resolve(fileName)
    if (!overwrite && Files.exists(dest)) return dest

    val client = HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NORMAL)
      .connectTimeout(Duration.ofSeconds(30))
      .build()
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(timeout).GET().build()

    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= retries) {
      try {
        val tmp = Files.createTempFile(dir, s".$fileName.", ".part")
        try {
          val resp = client.send(req, HttpResponse.BodyHandlers.ofFile(tmp))
          if (resp.statusCode() / 100 != 2)
            throw new IOException(s"HTTP ${resp.statusCode()} for $url")
          Files.move(tmp, dest, StandardCopyOption.REPLACE_EXISTING,
            StandardCopyOption.ATOMIC_MOVE)
          return dest
        } finally Files.deleteIfExists(tmp)
      } catch {
        case e: Exception =>
          lastErr = e
          attempt += 1
          if (attempt <= retries)
            Thread.sleep(backoffMs << (attempt - 1))
      }
    }
    throw new IOException(s"fetch failed after ${retries + 1} attempts: $url",
      lastErr)
  }

  /** GENCODE convenience (cnv.py:323-325): the versioned release URL +
    * the reference's local rename. Keeps `.gz` — Spark reads it
    * transparently. */
  def gencodeGtf(version: Int, destDir: String,
                 baseUrl: String =
                 "https://ftp.ebi.ac.uk/pub/databases/gencode/Gencode_human")
  : Path =
    stage(
      s"$baseUrl/release_$version/gencode.v$version.basic.annotation.gtf.gz",
      destDir, s"gencode_genes_$version.gtf.gz")
}
