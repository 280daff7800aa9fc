"""Package the engine for ``spark-submit --py-files`` / ``addPyFile``.

The north rule's deployment shape is ``spark-submit --py-files
engine.zip job.py`` on a multi-executor cluster: every executor's Python
worker must be able to import ``pvsyst_pdf_parser_spark`` (UDF closures
resolve module references by import) without the repo being installed on
the cluster nodes.  :func:`build_package_zip` produces that artifact.

The zip name carries a content hash of the sources, so edits produce a
new artifact instead of executors importing a stale cached zip, and the
publish is atomic (tmp + rename) so concurrent builders cannot observe
a half-written file.  The build dir is repo-local — not a
world-writable fixed /tmp path another local user could pre-plant.
"""

from __future__ import annotations

import hashlib
import os
import zipfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# fixtures ships too: the deterministic corpus generators are how smoke
# jobs and the serving shim validate a cluster deployment end-to-end
_PACKAGES = ("pvsyst_pdf_parser_spark", "fixtures")


def build_package_zip(repo_root: str | None = None) -> str:
    """Build (or reuse) the content-hashed engine zip; returns its path."""
    repo = repo_root or _REPO
    sources = []
    for pkg in _PACKAGES:
        base = os.path.join(repo, pkg)
        for root, _dirs, files in os.walk(base):
            for fn in sorted(files):
                if fn.endswith(".py"):
                    sources.append(os.path.join(root, fn))
    sources.sort()
    h = hashlib.sha256()
    for full in sources:
        with open(full, "rb") as f:
            h.update(os.path.relpath(full, repo).encode())
            h.update(b"\0")
            h.update(f.read())
    build_dir = os.path.join(repo, ".build")
    os.makedirs(build_dir, exist_ok=True)
    zip_path = os.path.join(build_dir, f"pkg-{h.hexdigest()[:16]}.zip")
    if not os.path.exists(zip_path):
        tmp_path = zip_path + f".tmp-{os.getpid()}"
        with zipfile.ZipFile(tmp_path, "w") as zf:
            for full in sources:
                zf.write(full, os.path.relpath(full, repo))
        os.replace(tmp_path, zip_path)  # atomic publish
    return zip_path
