"""Golden-fixture harness: run the reference parser on fixture docs.

Imports the reference implementation directly from the read-only checkout
at ``/root/reference/pvsyst_parser.py`` (never copied into this repo) and
injects a fake ``pdfplumber`` module whose ``open()`` decodes the GRAFT
text-layer container — so the reference sees exactly the same per-page
text the Spark pipeline decodes, and its JSON/text outputs are the
byte-identity goldens (BASELINE.json correctness gate).

The CLI path ``PVsystParser.parse_pdf`` is the behavioral source of truth
(the FastAPI path is dead code — SURVEY.md §8).
"""

from __future__ import annotations

import contextlib
import importlib.util
import io
import os
import sys
import types
from pathlib import Path

REFERENCE_PATH = os.environ.get(
    "PVSYST_REFERENCE_PATH", "/root/reference/pvsyst_parser.py"
)


class _FakePage:
    def __init__(self, text: str) -> None:
        self._text = text

    def extract_text(self) -> str:
        return self._text


class _FakePdf:
    def __init__(self, pages: list[str]) -> None:
        self.pages = [_FakePage(p) for p in pages]

    def __enter__(self) -> "_FakePdf":
        return self

    def __exit__(self, *exc) -> None:
        return None


def _fake_open(path):
    from pvsyst_pdf_parser_spark.io.payload import decode_textlayer_pdf

    payload = Path(path).read_bytes()
    return _FakePdf(decode_textlayer_pdf(payload))


_reference_module = None


def load_reference():
    """Import the reference parser with the fake pdfplumber injected."""
    global _reference_module
    if _reference_module is not None:
        return _reference_module
    fake = types.ModuleType("pdfplumber")
    fake.open = _fake_open
    sys.modules.setdefault("pdfplumber", fake)
    spec = importlib.util.spec_from_file_location("_reference_pvsyst", REFERENCE_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _reference_module = mod
    return mod


def run_reference(pages: list[str], workdir: str, stem: str) -> tuple[str, str]:
    """Run the reference CLI path on per-page text; return (json, txt) strings."""
    from pvsyst_pdf_parser_spark.io.payload import encode_textlayer_pdf

    mod = load_reference()
    wd = Path(workdir)
    wd.mkdir(parents=True, exist_ok=True)
    pdf_path = wd / f"{stem}.pdf"
    pdf_path.write_bytes(encode_textlayer_pdf(pages))

    parser = mod.PVsystParser()
    with contextlib.redirect_stdout(io.StringIO()):
        parser.parse_pdf(str(pdf_path), str(wd))

    json_text = (wd / f"{stem}_structured_v3.json").read_text(encoding="utf-8")
    report_text = (wd / f"{stem}_analysis_v3.txt").read_text(encoding="utf-8")
    return json_text, report_text


def ensure_smoke_goldens_parquet(path: str, n_docs: int = 9) -> str:
    """Deterministic differential fixture for the pvsyst_extract_smoke
    oracle: one parquet of (url, kind, n_pages, golden_json) where
    golden_json is the REFERENCE parser's canonical V3 output for the
    same deterministic fixture docs the smoke query feeds the Spark
    pipeline.  The DuckDB oracle recomputes the smoke projection
    (json_len, total_inverters, ...) from this file independently, so
    the driver's hash compare is Spark-pipeline-output vs
    reference-output — a true differential check, not a tautology.

    Content is fully deterministic (seeded fixtures + deterministic
    reference parser), so the file is written once and committed;
    regeneration produces identical values."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(path):
        return path
    from fixtures.gen import make_docs

    docs = make_docs(n_docs)
    urls, kinds, n_pages_col, jsons = [], [], [], []
    with tempfile.TemporaryDirectory() as wd:
        for d in docs:
            json_text, _ = run_reference(d.pages, wd, f"doc_{d.spec.doc_id:05d}")
            urls.append(d.url)
            kinds.append(d.spec.kind)
            # the decode stage yields one page-row per PDF container page
            # and a single page for html/text payloads (io/pages.py)
            n_pages_col.append(len(d.pages) if d.spec.kind == "pdf" else 1)
            jsons.append(json_text)
    table = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "n_pages": pa.array(n_pages_col, pa.int64()),
            "golden_json": pa.array(jsons, pa.string()),
        }
    )
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)  # atomic publish
    return path


def generate_goldens(docs, out_dir: str) -> dict[str, tuple[str, str]]:
    """Run the reference on every fixture doc; write + return goldens by url."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    goldens: dict[str, tuple[str, str]] = {}
    for doc in docs:
        stem = f"doc_{doc.spec.doc_id:05d}"
        json_text, report_text = run_reference(doc.pages, str(out / "_work"), stem)
        (out / f"{stem}_structured_v3.json").write_text(json_text, encoding="utf-8")
        (out / f"{stem}_analysis_v3.txt").write_text(report_text, encoding="utf-8")
        goldens[doc.url] = (json_text, report_text)
    return goldens


def ensure_span_goldens_parquet(path: str, n_docs: int = 9) -> str:
    """Deterministic golden for the pvsyst_field_spans oracle: the
    span inventory computed SINGLE-PROCESS over each fixture doc's
    ground-truth text layer (DocFixture.doc_text).  The Spark side must
    reproduce every row through its distributed path — payload decode,
    per-page explode, doc-text reassembly (order-sensitive: offsets
    shift if page order or separators drift), Arrow span scan, explode
    — so the driver's hash compare gates the plumbing end-to-end.

    Deterministic (seeded fixtures, fixed patterns): written once and
    committed; regeneration is byte-identical."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(path):
        return path
    from fixtures.gen import make_docs

    from pvsyst_pdf_parser_spark.text.spans import spans_of_text

    cols = {k: [] for k in
            ("url", "span_kind", "name", "midx", "start", "end", "value")}
    for d in make_docs(n_docs):
        for kind, name, midx, start, end, value in spans_of_text(d.doc_text):
            cols["url"].append(d.url)
            cols["span_kind"].append(kind)
            cols["name"].append(name)
            cols["midx"].append(midx)
            cols["start"].append(start)
            cols["end"].append(end)
            cols["value"].append(value)
    table = pa.table(
        {
            "url": pa.array(cols["url"], pa.string()),
            "span_kind": pa.array(cols["span_kind"], pa.string()),
            "name": pa.array(cols["name"], pa.string()),
            "midx": pa.array(cols["midx"], pa.int32()),
            "start": pa.array(cols["start"], pa.int32()),
            "end": pa.array(cols["end"], pa.int32()),
            "value": pa.array(cols["value"], pa.string()),
        }
    )
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path
