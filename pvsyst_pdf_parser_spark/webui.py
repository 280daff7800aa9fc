"""Single-file browser UI for the serving shim — the repo-side analog
of the reference's bundled upload page (reference ships a static
``index.html`` next to its FastAPI app; see SURVEY.md §8.1).  Written
from scratch: a drop/pick upload form that POSTs the file to
``/api/parse`` and renders the returned JSON, plus a health indicator.

Kept as a Python string so serve.py stays stdlib-only with no static
file path to resolve at runtime."""

from __future__ import annotations

INDEX_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>PVsyst report parser</title>
<style>
  body { font-family: system-ui, sans-serif; margin: 2rem auto;
         max-width: 54rem; padding: 0 1rem; color: #222; }
  h1 { font-size: 1.4rem; }
  #drop { border: 2px dashed #999; border-radius: 8px; padding: 2.5rem;
          text-align: center; cursor: pointer; }
  #drop.hover { border-color: #2a7; background: #f4fbf7; }
  #status { margin: 1rem 0; font-size: .95rem; }
  #status.err { color: #b00; }
  pre { background: #f6f6f6; border: 1px solid #ddd; border-radius: 6px;
        padding: 1rem; overflow: auto; max-height: 32rem; }
  .pill { display: inline-block; border-radius: 999px; padding: .1rem .6rem;
          font-size: .8rem; background: #eee; }
  .pill.ok { background: #d9f2e4; }
</style>
</head>
<body>
<h1>PVsyst report parser
  <span id="health" class="pill">checking…</span></h1>
<p>Upload a PVsyst simulation-report PDF; the engine returns the
structured JSON document.</p>
<div id="drop" tabindex="0">drop a PDF here or click to choose
  <input id="file" type="file" accept="application/pdf" hidden></div>
<div id="status"></div>
<pre id="out" hidden></pre>
<script>
"use strict";
const drop = document.getElementById("drop");
const input = document.getElementById("file");
const status_ = document.getElementById("status");
const out = document.getElementById("out");

fetch("/api/health").then(r => r.json()).then(j => {
  const h = document.getElementById("health");
  h.textContent = j.status === "ok" ? "engine up" : "degraded";
  h.className = "pill" + (j.status === "ok" ? " ok" : "");
}).catch(() => {
  document.getElementById("health").textContent = "unreachable";
});

function show(msg, isErr) {
  status_.textContent = msg;
  status_.className = isErr ? "err" : "";
}

async function parse(file) {
  if (!file) return;
  show("parsing " + file.name + " …", false);
  out.hidden = true;
  const form = new FormData();
  form.append("file", file);
  try {
    const resp = await fetch("/api/parse", { method: "POST", body: form });
    const text = await resp.text();
    let pretty = text;
    try { pretty = JSON.stringify(JSON.parse(text), null, 2); } catch (e) {}
    out.textContent = pretty;
    out.hidden = false;
    show(resp.ok ? "done (" + resp.status + ")"
                 : "server returned " + resp.status, !resp.ok);
  } catch (e) {
    show("request failed: " + e, true);
  }
}

drop.addEventListener("click", () => input.click());
drop.addEventListener("keydown", e => {
  if (e.key === "Enter" || e.key === " ") input.click();
});
input.addEventListener("change", () => parse(input.files[0]));
for (const ev of ["dragover", "dragenter"]) {
  drop.addEventListener(ev, e => {
    e.preventDefault(); drop.classList.add("hover");
  });
}
for (const ev of ["dragleave", "drop"]) {
  drop.addEventListener(ev, e => {
    e.preventDefault(); drop.classList.remove("hover");
  });
}
drop.addEventListener("drop", e => parse(e.dataTransfer.files[0]));
</script>
</body>
</html>
"""
