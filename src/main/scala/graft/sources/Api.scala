package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ExecutorService, Executors, TimeUnit}

/** Thin REST shell over [[Lake]]/[[Serving]]/[[Ingest]] mirroring the
  * reference's FastAPI surface (reference routes.py:28-267): same paths, same
  * status envelopes (`request_id`/`status`/`message`/`records_count`/`errors`),
  * same pending-background lifecycle for the async stock ingests
  * (routes.py:40-42, 82-84), same 404/204 semantics on the dataset endpoints.
  *
  * Deliberately NOT a dataflow operator: every byte of data it serves comes
  * from the oracle-gated operators ([[Serving.jsonRecordsView]],
  * [[Lake.info]]/`latest`/`delete`, [[CsvAutoLoader.loadAndStore]],
  * [[graft.operators.Transforms.transformAndStore]]); this layer carries only
  * endpoint routing and envelope semantics, so its gate is the
  * endpoint-contract scalatest (ApiSpec), not an oracle row. Built on the
  * JDK's HttpServer — no framework dependency, which keeps the serving shell
  * inside the engine's zero-extra-deps build. A production deployment would
  * front a long-lived SparkSession exactly like this: the session is the
  * expensive shared resource, the HTTP layer is stateless.
  */
final class Api(spark: SparkSession, lake: Lake, ingest: Ingest,
    bindPort: Int = 0) {

  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)

  private val server: HttpServer = HttpServer.create(new InetSocketAddress("127.0.0.1", bindPort), 0)
  // background ingest tasks (the reference's BackgroundTasks, routes.py:40):
  // single worker — background fetches share the one SparkSession anyway
  private val background: ExecutorService = Executors.newSingleThreadExecutor()

  /** Port actually bound (ephemeral when constructed with bindPort = 0). */
  def port: Int = server.getAddress.getPort

  def start(): Api = { server.createContext("/", handler _); server.setExecutor(null); server.start(); this }

  def stop(): Unit = {
    server.stop(0)
    background.shutdown()
    background.awaitTermination(30, TimeUnit.SECONDS)
    ()
  }

  /** Test hook for the pending lifecycle: block until every background ingest
    * submitted so far has completed (the reference's equivalent is FastAPI
    * draining BackgroundTasks after the response is sent).
    */
  def awaitBackground(): Unit = {
    val latch = new java.util.concurrent.CountDownLatch(1)
    background.execute(() => latch.countDown())
    latch.await(60, TimeUnit.SECONDS)
    ()
  }

  // --- routing ------------------------------------------------------------

  private def handler(ex: HttpExchange): Unit = {
    val rawSegs = ex.getRequestURI.getPath.split('/').filter(_.nonEmpty).toList
    // the reference mounts its router under /api (main.py:20) and the
    // dashboard's fetch calls carry that prefix (index.html:807-1016);
    // accept both prefixed and bare forms so a browser pointed at this
    // shell resolves the same URLs
    val segs = rawSegs match { case "api" :: rest => rest; case s => s }
    val method = ex.getRequestMethod
    try {
      (method, segs) match {
        case ("GET", Nil) | ("GET", List("dashboard")) =>
          respondRaw(ex, 200, "text/html", Api.dashboardHtml)
        case ("POST", List("ingest"))       => respondJson(ex, 200, ingestRoute(readBody(ex)))
        case ("POST", List("transform"))    => respondJson(ex, 200, transformRoute(readBody(ex)))
        case ("GET", List("datasets"))      => respondJson(ex, 200, lake.list(layerParam(ex)))
        case ("GET", List("datasets", name)) => datasetInfoRoute(ex, name)
        case ("DELETE", List("datasets", name)) => deleteRoute(ex, name)
        case ("GET", List("data", "latest", dataType, source)) => latestRoute(ex, dataType, source)
        case ("GET", List("data", layer, name, "download")) => downloadRoute(ex, layer, name)
        case ("GET", List("data", layer, name)) => dataRoute(ex, layer, name)
        case _ => respondJson(ex, 404, Map("detail" -> "Not Found"))
      }
    } catch {
      case e: Throwable =>
        respondJson(ex, 500, Map("detail" -> s"Internal server error: ${e.getMessage}"))
    } finally ex.close()
  }

  // --- POST /ingest (routes.py:28-131) -------------------------------------

  private def ingestRoute(req: Map[String, Any]): Map[String, Any] = {
    val requestId = Serving.generateRequestId()
    val source = req.getOrElse("source", "").toString
    val dataType = req.getOrElse("data_type", "").toString
    val symbols = req.get("symbols").collect { case s: Seq[_] => s.map(_.toString) }.getOrElse(Seq.empty)
    val params = req.get("params").collect { case m: Map[_, _] =>
      m.map { case (k, v) => k.toString -> v.toString } }.getOrElse(Map.empty[String, String])
    def envelope(status: String, message: String, count: Long = 0L,
        errors: Seq[String] = Seq.empty): Map[String, Any] =
      Map("request_id" -> requestId, "status" -> status, "message" -> message,
        "records_count" -> count, "errors" -> errors)
    def lastCount(results: Seq[Map[String, Any]]): Long = results.lastOption
      .flatMap(_.get("records_count")).map(_.toString.toLong).getOrElse(0L)

    source match {
      case "alphavantage" => dataType match {
        case "stock" => // async: respond pending, fetch in the background (routes.py:40-42)
          symbols.foreach(sym => background.execute(() => { ingest.fetchAndStoreStock(sym); () }))
          envelope("pending", "Data ingestion for AlphaVantage stock data started.")
        case "forex" =>
          val bad = symbols.filterNot(_.split('_').length == 2)
          if (bad.nonEmpty) // malformed pair short-circuits the whole request (routes.py:50-53)
            envelope("error", s"Invalid forex pair format: ${bad.head}. Use format 'FROM_TO'",
              errors = bad.map(p => s"Invalid forex pair: $p"))
          else envelope("success", "Forex data fetched and stored.",
            lastCount(symbols.map(ingest.fetchAndStoreForex(_))))
        case "economic" =>
          envelope("success",
            s"Economic indicator data fetched and stored for ${symbols.mkString("[", ", ", "]")}.",
            lastCount(symbols.map(ingest.fetchAndStoreEconomic(_))))
        case other => envelope("error", s"Unsupported data_type '$other' for source '$source'")
      }
      case "yahoo_finance" => dataType match {
        case "stock" =>
          symbols.foreach(sym => background.execute(() => { ingest.fetchAndStoreStockYahoo(sym); () }))
          envelope("pending", "Data ingestion for Yahoo Finance stock data started.")
        case "crypto" =>
          envelope("success", "Crypto data fetched and stored.",
            lastCount(symbols.map(ingest.fetchAndStoreCrypto)))
        case other => envelope("error", s"Unsupported data_type '$other' for source '$source'")
      }
      case "csv" =>
        params.get("file_path") match {
          case None => envelope("error", "file_path parameter is required for CSV ingestion.")
          case Some(path) if !new java.io.File(path).exists() =>
            envelope("error", s"File not found: $path")
          case Some(path) =>
            if (dataType != "stock" && dataType != "economic")
              envelope("error", s"Unsupported data_type: $dataType for CSV source.")
            else {
              val res = CsvAutoLoader.loadAndStore(spark, lake, path, dataType,
                indicatorName = params.getOrElse("indicator_name", "UNKNOWN"))
              envelope(res("status").toString,
                res.getOrElse("message", res.getOrElse("file_path", "")).toString,
                res.get("records_count").map(_.toString.toLong).getOrElse(0L))
            }
        }
      case other => envelope("error", s"Unsupported source: $other")
    }
  }

  // --- POST /transform (routes.py:135-144) ---------------------------------

  private def transformRoute(req: Map[String, Any]): Map[String, Any] =
    graft.operators.Transforms.transformAndStore(lake,
      req.getOrElse("source_layer", "bronze").toString,
      req.getOrElse("source_path", "").toString,
      req.getOrElse("transformation_type", "clean").toString,
      req.getOrElse("destination_layer", "silver").toString)

  // --- GET /datasets/{name} (routes.py:155-171) ----------------------------

  private def datasetInfoRoute(ex: HttpExchange, name: String): Unit = {
    val info = lake.info(layerParam(ex), name)
    if (info.get("exists").contains(false))
      respondJson(ex, 404,
        Map("detail" -> s"Dataset '$name' metadata not found in layer '${layerParam(ex)}'"))
    else // datetimes → isoformat strings, like routes.py:161-168
      respondJson(ex, 200, info.map {
        case (k, v: java.sql.Timestamp) => k -> v.toInstant.toString
        case (k, v) => k -> v
      })
  }

  // --- GET /data/{layer}/{name} (routes.py:174-220) ------------------------

  private def dataRoute(ex: HttpExchange, layer: String, name: String): Unit = {
    val df = lake.read(layer, name)
    if (df.schema.isEmpty || df.isEmpty)
      respondJson(ex, 404,
        Map("detail" -> s"Dataset '$name' not found or empty in layer '$layer'."))
    else respondRaw(ex, 200, "application/json", recordsJson(df))
  }

  /** JSON-records body: the gated [[Serving.jsonRecordsView]] (±inf/NaN →
    * null, ISO-µs-Z timestamps) rendered with EXPLICIT nulls — the reference
    * emits `"v": null` for scrubbed floats (routes.py:194), where Spark's
    * default `toJSON` would silently drop the field.
    */
  private def recordsJson(df: org.apache.spark.sql.DataFrame): String = {
    import org.apache.spark.sql.functions.{col, struct, to_json}
    val v = Serving.jsonRecordsView(df)
    v.select(to_json(struct(v.columns.map(col).toIndexedSeq: _*),
        Map("ignoreNullFields" -> "false")).as("j"))
      .collect().map(_.getString(0)).mkString("[", ",", "]")
  }

  // --- GET /data/latest/{data_type}/{source} (routes.py:223-234) -----------

  private def latestRoute(ex: HttpExchange, dataType: String, source: String): Unit =
    lake.latest(layerParam(ex), source, dataType) match {
      case None =>
        respondJson(ex, 404, Map("detail" -> "No data found for the specified type and source."))
      case Some(df) if df.isEmpty =>
        respondJson(ex, 404, Map("detail" -> "No data found for the specified type and source."))
      case Some(df) => respondRaw(ex, 200, "application/json", recordsJson(df))
    }

  // --- GET /data/{layer}/{name}/download (routes.py:238-259) ---------------

  private def downloadRoute(ex: HttpExchange, layer: String, name: String): Unit = {
    val df = lake.read(layer, name)
    if (df.schema.isEmpty || df.isEmpty) {
      respondJson(ex, 404,
        Map("detail" -> s"Dataset '$name' not found or empty in layer '$layer'."))
      return
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_api_csv")
    try {
      Serving.csvDownload(df, tmp.toString)
      val part = tmp.toFile.listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
        .getOrElse(sys.error("csv sink produced no part file"))
      ex.getResponseHeaders.add("Content-Disposition", s"attachment; filename=$name.csv")
      respondRaw(ex, 200, "text/csv",
        new String(java.nio.file.Files.readAllBytes(part.toPath), StandardCharsets.UTF_8))
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(tmp)
      try walk.iterator().asScala.toSeq.reverse.foreach(p =>
        java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  // --- DELETE /datasets/{name} (routes.py:261-267) -------------------------

  private def deleteRoute(ex: HttpExchange, name: String): Unit =
    if (lake.delete(layerParam(ex), name)) { ex.sendResponseHeaders(204, -1); () }
    else respondJson(ex, 404, Map("detail" -> "Dataset not found or could not be deleted"))

  // --- plumbing ------------------------------------------------------------

  private def layerParam(ex: HttpExchange): String =
    Option(ex.getRequestURI.getQuery).toSeq
      .flatMap(_.split('&').toSeq)
      .collectFirst { case kv if kv.startsWith("layer=") => kv.stripPrefix("layer=") }
      .getOrElse("bronze")

  private def readBody(ex: HttpExchange): Map[String, Any] = {
    val bytes = ex.getRequestBody.readAllBytes()
    if (bytes.isEmpty) Map.empty
    else mapper.readValue(bytes, classOf[Map[String, Any]])
  }

  private def respondJson(ex: HttpExchange, code: Int, payload: Any): Unit =
    respondRaw(ex, code, "application/json", mapper.writeValueAsString(payload))

  private def respondRaw(ex: HttpExchange, code: Int, contentType: String, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", contentType)
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length.toLong)
    if (bytes.nonEmpty) { val os = ex.getResponseBody; os.write(bytes); os.close() }
  }
}

object Api {
  /** Minimal own-built dashboard over the same data contract the reference's
    * index.html consumes (its fetch calls: GET /api/datasets?layer=…,
    * GET /api/datasets/{name}?layer=…, GET /api/data/{layer}/{name} —
    * index.html:807-1016). Deliberately small: the reference page is ~1,300
    * lines of Tailwind chrome whose only compute is these three fetches and
    * a table render (its chart is an explicit placeholder); this page proves
    * a browser pointed at the shell lists layers, shows dataset metadata,
    * and renders data rows — the full backend contract — in ~60 lines of
    * original markup. NOT a copy of the reference HTML.
    */
  val dashboardHtml: String =
    """<!doctype html>
      |<html><head><meta charset="utf-8"><title>graft dashboard</title>
      |<style>
      | body{font-family:system-ui,sans-serif;margin:2rem;color:#222;max-width:70rem}
      | h1{font-size:1.3rem} h2{font-size:1.05rem;margin-top:1.5rem}
      | table{border-collapse:collapse;margin-top:.5rem;font-size:.85rem}
      | th,td{border:1px solid #ccc;padding:.25rem .6rem;text-align:left}
      | select,button,input{margin-right:.5rem;padding:.2rem .5rem}
      | #info{margin-top:.5rem;font-size:.85rem;color:#444}
      | .badge{display:inline-block;background:#e3ecfb;color:#1a4f9c;border-radius:9px;
      |   padding:.05rem .55rem;font-size:.75rem;margin:0 .15rem}
      | .card{border:1px solid #ddd;border-radius:6px;padding:.8rem 1rem;margin:.6rem 0}
      | #chart{margin-top:.5rem}
      | #msg{font-size:.85rem;color:#1a6}
      |</style></head><body>
      |<h1>graft — financial data pipeline <span class="badge" id="total"></span></h1>
      |<div class="card"><h2>ingest</h2>
      | source <select id="isrc"><option>csv</option><option>alphavantage</option><option>yahoo_finance</option></select>
      | type <select id="ityp"><option>stock</option><option>forex</option><option>crypto</option><option>economic</option></select>
      | symbols <input id="isym" placeholder="AAPL,MSFT" size="12">
      | file <input id="ifile" placeholder="/path/data.csv" size="18">
      | <button onclick="ingest()">ingest</button> <span id="msg"></span>
      |</div>
      |<div class="card"><h2>explore <span class="badge" id="dscount"></span></h2>
      | layer <select id="layer"><option>bronze</option><option>silver</option><option>gold</option></select>
      | dataset <select id="ds"></select>
      | <button onclick="load()">load</button>
      | <a id="dl" href="#" style="font-size:.85rem">download csv</a>
      | <div id="info"></div><div id="syms"></div>
      | <div id="chart"></div>
      | <div id="tbl"></div>
      |</div>
      |<div class="card"><h2>transform</h2>
      | dataset <select id="tds"></select>
      | op <select id="top"><option>aggregate</option><option>filter</option><option>normalize</option></select>
      | freq <select id="tfreq"><option>D</option><option>W</option><option>M</option></select>
      | <button onclick="transform()">run</button> <span id="tmsg"></span>
      |</div>
      |<script>
      |const $=id=>document.getElementById(id);
      |// stored-XSS guard: dataset names, metadata and CELL VALUES are lake
      |// data (any text column can carry '<img onerror=...>'); everything
      |// interpolated into markup goes through esc() first
      |const esc=v=>String(v).replace(/[&<>"']/g,c=>({'&':'&amp;','<':'&lt;','>':'&gt;','"':'&quot;',"'":'&#39;'}[c]));
      |async function layers(){
      |  const layer=$('layer').value;
      |  const names=await (await fetch(`/api/datasets?layer=${encodeURIComponent(layer)}`)).json();
      |  $('ds').innerHTML=names.sort().map(n=>`<option>${esc(n)}</option>`).join('');
      |  $('dscount').textContent=`${names.length} datasets`;
      |}
      |// minimal line chart of the first numeric column as inline SVG —
      |// values escaped/numeric-coerced, no external chart lib (the
      |// reference's chart is an explicit placeholder; this renders real data)
      |function sparkline(rows,cols){
      |  const c=cols.find(c=>rows.some(r=>typeof r[c]==='number'&&isFinite(r[c])));
      |  if(!c){$('chart').textContent='';return;}
      |  const vs=rows.slice(0,200).map(r=>r[c]).filter(v=>typeof v==='number'&&isFinite(v));
      |  const mn=Math.min(...vs),mx=Math.max(...vs),W=600,H=80;
      |  const pts=vs.map((v,i)=>`${(i*W/Math.max(1,vs.length-1)).toFixed(1)},`+
      |    `${(H-(mx>mn?(v-mn)/(mx-mn):0.5)*H).toFixed(1)}`).join(' ');
      |  $('chart').innerHTML=`<svg width="${W}" height="${H+18}">`+
      |    `<polyline points="${pts}" fill="none" stroke="#1a4f9c" stroke-width="1.5"/>`+
      |    `<text x="0" y="${H+14}" font-size="11">${esc(c)}: ${mn}..${mx}</text></svg>`;
      |}
      |async function load(){
      |  const layer=$('layer').value, name=$('ds').value;
      |  if(!name) return;
      |  const info=await (await fetch(`/api/datasets/${encodeURIComponent(name)}?layer=${encodeURIComponent(layer)}`)).json();
      |  $('info').textContent=`type=${info.data_type??'N/A'} source=${info.source??'N/A'} `+
      |    `rows=${info.record_count??'N/A'} range=${info.first_date??'N/A'}..${info.last_date??'N/A'}`;
      |  $('syms').innerHTML=Array.isArray(info.symbols)
      |    ? info.symbols.map(sx=>`<span class="badge">${esc(sx)}</span>`).join('') : '';
      |  $('dl').href=`/api/data/${encodeURIComponent(layer)}/${encodeURIComponent(name)}/download`;
      |  const rows=await (await fetch(`/api/data/${encodeURIComponent(layer)}/${encodeURIComponent(name)}`)).json();
      |  if(!rows.length){$('tbl').textContent='(empty)';$('chart').textContent='';return;}
      |  const cols=Object.keys(rows[0]);
      |  sparkline(rows,cols);
      |  $('tbl').innerHTML='<table><tr>'+cols.map(c=>`<th>${esc(c)}</th>`).join('')+'</tr>'+
      |    rows.slice(0,100).map(r=>'<tr>'+cols.map(c=>`<td>${esc(r[c]??'')}</td>`).join('')+'</tr>').join('')+
      |    '</table>';
      |}
      |async function ingest(){
      |  const body={source:$('isrc').value,data_type:$('ityp').value,
      |    symbols:$('isym').value?$('isym').value.split(','):[],
      |    params:$('ifile').value?{file_path:$('ifile').value}:{}};
      |  const r=await (await fetch('/api/ingest',{method:'POST',
      |    headers:{'Content-Type':'application/json'},body:JSON.stringify(body)})).json();
      |  $('msg').textContent=`${r.status??''}: ${r.message??''}`;
      |  layers(); sources();
      |}
      |// transform-source dropdown grouped by layer + all-layers dataset count
      |// (the reference's loadSourceDatasets / fetchOverallDatasetCount flows,
      |// index.html:1015, 1228-1247 — re-expressed, not copied)
      |async function sources(){
      |  const layersAll=['bronze','silver','gold'];
      |  const lists=await Promise.all(layersAll.map(async l=>{
      |    try{return await (await fetch(`/api/datasets?layer=${l}`)).json();}
      |    catch(e){return [];}}));
      |  $('total').textContent=`${lists.flat().length} datasets`;
      |  $('tds').innerHTML=['bronze','silver'].map((l,i)=>
      |    `<optgroup label="${l}">`+lists[i].sort().map(n=>
      |      `<option value="${esc(l)}:${esc(n)}">${esc(n)}</option>`).join('')+'</optgroup>').join('');
      |}
      |async function transform(){
      |  const [srcLayer,...rest]=$('tds').value.split(':');
      |  const dest=srcLayer==='silver'?'gold':'silver';
      |  const body={source_layer:srcLayer,source_path:rest.join(':'),
      |    transformation_type:$('top').value,destination_layer:dest,
      |    params:{freq:$('tfreq').value}};
      |  const r=await (await fetch('/api/transform',{method:'POST',
      |    headers:{'Content-Type':'application/json'},body:JSON.stringify(body)})).json();
      |  $('tmsg').textContent=`${r.status??''}: ${r.message??''}`;
      |  sources();
      |}
      |$('layer').onchange=layers; layers(); sources();
      |</script></body></html>""".stripMargin
}
