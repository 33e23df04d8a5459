"""HTTP serving layer (karna-server analog).

The reference's single load-bearing sentence promises "a blazingly fast
web interface to query tabular files ... using SQL, GraphQL and Natural
Language" (reference README.md:2) and dedicates a crate to the server
(reference karna-server/src/lib.rs:1-14, template only). This module is
that HTTP layer for the Spark-native engine, deliberately thin: parse
request → translate via the existing front-ends → serve ONE bounded
result page (io.sinks) as JSON. stdlib ``http.server`` only — the
container ships no web framework, and the engine does not need one.

API:
  GET  /                  → minimal HTML query console (the "web
                            interface" of reference README.md:2 —
                            inline CSS; no CDN in the offline sandbox)
  GET  /health            → {"status": "ok"}
  GET  /datasets          → [{name, path, fmt, foreign_keys}, ...]
  POST /datasets          {"name", "path", "fmt"?, "options"?,
                           "foreign_keys"?: [[fk_col, parent, pk], ...]}
  GET  /queries           → saved queries [{name, language, query}, ...]
  POST /queries           {"name", "language"?, "query"} — persist a
                          named query in the metastore catalog
  POST /query             {"language": "sql"|"graphql"|"nl",
                           "query": "...", "limit"?, "offset"?,
                           "order_by"?: [col, ...]}
                          or {"saved": name, ...} to run a saved query
      → {"columns": [...], "rows": [[...], ...], "row_count": n}

NL/GraphQL queries resolve against the live catalog: a dataset
registered via POST /datasets is immediately NL-addressable by name,
and its declared foreign_keys become GraphQL nesting relationships
(rel_schema_from_metastore) and NL join vocabulary.

Scale posture: the server holds no result state; every /query collects
at most ``limit`` rows (hard-capped) through a TakeOrderedAndProject
plan, and Arrow handles the JVM→Python page transfer. Concurrency is
ThreadingHTTPServer — Spark sessions are thread-safe for reads, and
each request is an independent job.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession

MAX_PAGE = 10_000  # hard cap on rows per response

# The web console: one page, no build step, no external assets. It
# drives exactly the same POST /query contract as any API client.
_INDEX_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>karna-spark</title>
<style>
  body{font-family:system-ui,sans-serif;margin:2rem auto;max-width:60rem;
       color:#1a1a2e}
  h1{font-size:1.2rem} textarea{width:100%;height:6rem;font-family:monospace}
  select,button{font-size:1rem;padding:.3rem .8rem;margin:.4rem .4rem 0 0}
  table{border-collapse:collapse;margin-top:1rem;font-size:.9rem}
  th,td{border:1px solid #cbd5e1;padding:.25rem .6rem;text-align:left}
  th{background:#f1f5f9} #err{color:#b91c1c;white-space:pre-wrap}
  #meta{color:#64748b;font-size:.85rem;margin-top:.5rem}
</style></head>
<body>
<h1>karna-spark query console</h1>
<textarea id="q" placeholder="SELECT ... / query { ... } / total quantity by nation name in lineitem"></textarea>
<div>
  <select id="lang">
    <option value="sql">SQL</option>
    <option value="graphql">GraphQL</option>
    <option value="nl">Natural language</option>
  </select>
  <button onclick="run()">Run</button>
  <span id="meta"></span>
</div>
<div id="err"></div>
<div id="out"></div>
<script>
async function run(){
  const body={language:document.getElementById('lang').value,
              query:document.getElementById('q').value,limit:200};
  const t0=performance.now();
  const resp=await fetch('/query',{method:'POST',
    headers:{'Content-Type':'application/json'},body:JSON.stringify(body)});
  const data=await resp.json();
  const err=document.getElementById('err'),out=document.getElementById('out'),
        meta=document.getElementById('meta');
  err.textContent='';out.innerHTML='';meta.textContent='';
  if(!resp.ok){err.textContent=data.error||('HTTP '+resp.status);return;}
  meta.textContent=data.row_count+' rows · '+
    ((performance.now()-t0)/1000).toFixed(2)+'s';
  const tbl=document.createElement('table');
  const esc=s=>String(s).replace(/[<>&]/g,
    c=>({'<':'&lt;','>':'&gt;','&':'&amp;'}[c]));
  tbl.innerHTML='<tr>'+data.columns.map(c=>'<th>'+esc(c)+'</th>').join('')+
    '</tr>'+
    data.rows.map(r=>'<tr>'+r.map(v=>'<td>'+
      esc(v===null?'∅':JSON.stringify(v))+'</td>').join('')+
      '</tr>').join('');
  out.appendChild(tbl);
}
</script>
</body></html>
"""


class ApiError(ValueError):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status


def _run_query(spark: SparkSession, body: dict, metastore=None) -> DataFrame:
    saved = body.get("saved")
    if saved:
        if metastore is None:
            raise ApiError(400, "no metastore attached — saved queries unavailable")
        rec = metastore.get_query(saved)
        if rec is None:
            raise ApiError(404, f"no saved query {saved!r}")
        body = {**body, "language": rec.language, "query": rec.text}
    language = body.get("language", "sql")
    query = body.get("query")
    if not query or not isinstance(query, str):
        raise ApiError(400, "body must carry a 'query' string")
    if language == "sql":
        from karna_spark.frontends.sql import execute

        return execute(spark, query)
    if language == "graphql":
        from karna_spark.frontends.graphql import rel_schema_from_metastore, translate

        rel = rel_schema_from_metastore(metastore) if metastore is not None else None
        # the metastore rides along so GraphQL MUTATIONS over HTTP are
        # durable — REST POST /datasets parity (a registerDataset that
        # silently skipped the store would report success and persist
        # nothing)
        return translate(spark, query, rel_schema=rel, metastore=metastore)
    if language == "nl":
        from karna_spark.frontends.nl import ask

        return ask(spark, query, metastore)
    raise ApiError(400, f"unknown language {language!r} (sql|graphql|nl)")


def _page_payload(df: DataFrame, body: dict) -> dict:
    from karna_spark.io.sinks import page

    limit = min(int(body.get("limit", 100)), MAX_PAGE)
    offset = int(body.get("offset", 0))
    order_by = body.get("order_by")
    if order_by:
        missing = [c for c in order_by if c not in df.columns]
        if missing:
            raise ApiError(400, f"order_by columns not in result: {missing}")
        out = page(df, order_by, limit=limit, offset=offset)
    elif offset:
        # offset without an ordering is nondeterministic — refuse.
        raise ApiError(400, "offset requires order_by for a stable page")
    else:
        out = df.limit(limit)
    try:
        rows = out.collect()
    finally:
        # Operators that persist intermediates for their own
        # multi-consumer plans (posting-gram dedup, MinHash, CC) hang
        # the cache handles on the result; a long-lived server must
        # drop those blocks once the page is materialized or they
        # accumulate across requests.
        from karna_spark.operators.dedup import release_intermediates

        release_intermediates(df)
    return {
        "columns": out.columns,
        "rows": [[_json_cell(v) for v in r] for r in rows],
        "row_count": len(rows),
    }


def _json_cell(v):
    if isinstance(v, (str, int, float, bool)) or v is None:
        return v
    # Row subclasses tuple — test it FIRST or nested structs lose their
    # field names and serialize as bare lists.
    if hasattr(v, "asDict"):  # Row (struct column)
        return {k: _json_cell(x) for k, x in v.asDict().items()}
    if isinstance(v, (list, tuple)):
        return [_json_cell(x) for x in v]
    if isinstance(v, dict):
        return {k: _json_cell(x) for k, x in v.items()}
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)  # dates, timestamps, Decimal


def create_server(
    spark: SparkSession,
    host: str = "127.0.0.1",
    port: int = 8080,
    metastore=None,
) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server bound to ``spark``. Attach the
    metastore's datasets first when one is given."""
    if metastore is not None:
        metastore.attach(spark)

    class Handler(BaseHTTPRequestHandler):
        server_version = "karna-spark"

        def log_message(self, *args):  # keep pytest output clean
            pass

        def _send(self, status: int, payload) -> None:
            data = json.dumps(payload).encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length", 0) or 0)
            if n == 0:
                raise ApiError(400, "empty request body")
            try:
                return json.loads(self.rfile.read(n))
            except json.JSONDecodeError as e:
                raise ApiError(400, f"invalid JSON body: {e}") from e

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                data = _INDEX_HTML.encode("utf-8")
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
                return None
            if self.path == "/health":
                return self._send(200, {"status": "ok"})
            if self.path == "/datasets":
                if metastore is None:
                    return self._send(200, [])
                return self._send(
                    200,
                    [
                        {
                            "name": r.name,
                            "path": r.path,
                            "fmt": r.fmt,
                            "foreign_keys": r.foreign_keys,
                        }
                        for r in metastore.list()
                    ],
                )
            if self.path == "/queries":
                if metastore is None:
                    return self._send(200, [])
                return self._send(
                    200,
                    [
                        {"name": q.name, "language": q.language, "query": q.text}
                        for q in metastore.list_queries()
                    ],
                )
            return self._send(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            try:
                body = self._body()
                if self.path == "/query":
                    df = _run_query(spark, body, metastore)
                    return self._send(200, _page_payload(df, body))
                if self.path == "/datasets":
                    name, path = body.get("name"), body.get("path")
                    if not name or not path:
                        raise ApiError(400, "body must carry 'name' and 'path'")
                    opts = body.get("options") or {}
                    fks = body.get("foreign_keys") or []
                    if metastore is not None:
                        metastore.register(
                            spark, name, path, fmt=body.get("fmt"),
                            foreign_keys=fks, **opts,
                        )
                    else:
                        from karna_spark.catalog import register

                        register(spark, name, path, fmt=body.get("fmt"), **opts)
                    return self._send(201, {"registered": name})
                if self.path == "/queries":
                    if metastore is None:
                        raise ApiError(400, "no metastore attached")
                    name, text = body.get("name"), body.get("query")
                    if not name or not text:
                        raise ApiError(400, "body must carry 'name' and 'query'")
                    metastore.save_query(name, body.get("language", "sql"), text)
                    return self._send(201, {"saved": name})
                return self._send(404, {"error": f"no route {self.path}"})
            except ApiError as e:
                return self._send(e.status, {"error": str(e)})
            except Exception as e:  # translator/analysis errors → 400
                return self._send(400, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)


def main() -> None:
    """``python -m karna_spark.server [--port N] [--fixtures DIR]``"""
    import argparse

    from karna_spark.metastore import Metastore
    from karna_spark.session import get_spark

    p = argparse.ArgumentParser(description="karna_spark HTTP server")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--fixtures", metavar="DIR")
    p.add_argument("--metastore", metavar="PATH")
    args = p.parse_args()

    spark = get_spark(app_name="karna-server")
    if args.fixtures:
        from karna_spark.catalog import load_fixture_tables

        load_fixture_tables(spark, args.fixtures)
    ms = Metastore(args.metastore) if args.metastore else None
    srv = create_server(spark, args.host, args.port, metastore=ms)
    print(f"karna_spark serving on http://{args.host}:{srv.server_address[1]}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
