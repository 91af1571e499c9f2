package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.time.LocalDate
import java.util.Base64

/** Raw-zone REST ingestion — the entry point of the pipeline (reference:
  * `aws/ ch_ingest_company_overview_raw.py:49-74`): for each company
  * number, fetch the overview document plus each auxiliary dataset from a
  * Companies-House-shaped API and land them as JSON files in the
  * hive-partitioned raw zone
  *
  * {{{ raw/companies_house/ingestion_date=<ISO>/company_number=<n>/<dataset>.json }}}
  *
  * which [[graft.ops.Ingest]]'s S1 JSON scan then reads with partition
  * discovery (`ingestion_date` / `company_number` become partition
  * columns for free).
  *
  * Deliberate deltas from the reference: the response body is landed
  * verbatim (a raw zone should archive exactly what the API returned,
  * not a re-serialization); the sink root, base URL, and ingestion date
  * are injected so the utility is testable against a local fixture
  * server and deterministic under a fixed clock. Auth is the same
  * key-as-username/empty-password HTTP basic scheme.
  *
  * This is driver-side IO, not a Spark operator — it runs once per feed
  * on one node; scale lives downstream in the scans.
  */
final class RawIngest(
    baseUrl: String,
    apiKey: String,
    root: Path,
    ingestionDate: LocalDate = LocalDate.now(),
    datasets: Seq[String] = Seq("filing-history", "officers")) {

  private val http = HttpClient.newHttpClient()

  private def get(path: String): String = {
    val auth = Base64.getEncoder.encodeToString(s"$apiKey:".getBytes(UTF_8))
    val req = HttpRequest.newBuilder(URI.create(s"$baseUrl$path"))
      .header("Authorization", s"Basic $auth")
      .GET().build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(s"HTTP ${resp.statusCode()} for $path")
    resp.body()
  }

  /** Raw-zone target for one (company, dataset) document. */
  def rawPath(companyNumber: String, dataset: String): Path =
    root.resolve("raw").resolve("companies_house")
      .resolve(s"ingestion_date=$ingestionDate")
      .resolve(s"company_number=$companyNumber")
      .resolve(s"$dataset.json")

  private def land(body: String, companyNumber: String, dataset: String): Path = {
    val p = rawPath(companyNumber, dataset)
    Files.createDirectories(p.getParent)
    Files.writeString(p, body, UTF_8)
    p
  }

  /** Ingest one company: the overview document plus every auxiliary
    * dataset. Throws on the first failed fetch (the caller decides the
    * isolation policy; [[run]] isolates per company like the reference). */
  def ingestCompany(companyNumber: String): Seq[Path] =
    land(get(s"/company/$companyNumber"), companyNumber, "overview") +:
      datasets.map(ds => land(get(s"/company/$companyNumber/$ds"), companyNumber, ds))

  /** Ingest all companies with per-company error isolation: one company's
    * failure (HTTP error, timeout) must not abort the batch — the
    * reference logs and continues. Returns (succeeded, failed-with-cause). */
  def run(companyNumbers: Seq[String]): (Seq[String], Seq[(String, String)]) =
    companyNumbers.foldLeft(
        (Vector.empty[String], Vector.empty[(String, String)])) {
      case ((ok, bad), n) =>
        try { ingestCompany(n); (ok :+ n, bad) }
        catch { case e: Exception => (ok, bad :+ (n -> e.getMessage)) }
    }
}
