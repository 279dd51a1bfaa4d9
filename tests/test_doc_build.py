"""The documentation build must run and produce a page per guide + the API
reference (reference parity: a renderable doc tree, ci.yml:60-66)."""
import os
import subprocess
import sys

_DOC = os.path.join(os.path.dirname(__file__), "..", "doc")


def test_doc_build_produces_pages(tmp_path):
    res = subprocess.run([sys.executable, os.path.join(_DOC, "build.py")],
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    out = os.path.join(_DOC, "_build")
    pages = []
    for root, _d, files in os.walk(out):
        pages += [os.path.join(root, f) for f in files if f.endswith(".html")]
    names = {os.path.basename(p) for p in pages}
    assert "index.html" in names
    assert "api.html" in names
    assert len(pages) >= 8, names
    api = open(os.path.join(out, "api.html")).read()
    # the synthesized method sections made it into the rendered page
    for frag in ('method="cg"', 'method="davidson"', "rootfinder",
                 "solve_ivp"):
        assert frag in api, frag
    idx = open(os.path.join(out, "index.html")).read()
    assert 'href="getstart/linearoperator.html"' in idx
