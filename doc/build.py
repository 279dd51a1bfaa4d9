"""Render the documentation tree to standalone HTML — no sphinx needed.

The reference ships a sphinx build whose docstring examples run in CI
(/root/reference/.github/workflows/ci.yml:60-66).  This image has no sphinx
(and no pip), so the build is a small stdlib-only renderer:

* every markdown guide under doc/ becomes an HTML page (fenced code blocks,
  headers, lists, links, inline code — the subset the guides use), and
* an API reference page is generated from the *synthesized* docstrings of
  the public functionals (the same text `help()` shows, method sections
  included), proving the docstring synthesis renders.

Run:  python doc/build.py         -> doc/_build/*.html
The doctest side is covered by tests/test_api_doctests.py; this build is
exercised by tests/test_doc_build.py.
"""
import html
import os
import re
import sys

DOC = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(DOC, "_build")

_STYLE = """<style>
body { font-family: sans-serif; max-width: 56rem; margin: 2rem auto;
       padding: 0 1rem; line-height: 1.5; }
pre { background: #f5f5f5; padding: .8rem; overflow-x: auto; }
code { background: #f5f5f5; padding: .1rem .25rem; }
h1, h2, h3 { border-bottom: 1px solid #ddd; padding-bottom: .2rem; }
</style>"""


def _inline(text: str) -> str:
    text = html.escape(text, quote=False)
    text = re.sub(r"`([^`]+)`", r"<code>\1</code>", text)
    text = re.sub(r"\*\*([^*]+)\*\*", r"<b>\1</b>", text)
    text = re.sub(r"\[([^\]]+)\]\(([^)]+)\)",
                  lambda m: '<a href="%s">%s</a>'
                  % (m.group(2).replace(".md", ".html"), m.group(1)),
                  text)
    return text


def md_to_html(md: str, title: str) -> str:
    out = ["<!doctype html><html><head><meta charset='utf-8'>",
           "<title>%s</title>" % html.escape(title), _STYLE,
           "</head><body>"]
    lines = md.splitlines()
    i, in_list = 0, False
    while i < len(lines):
        line = lines[i]
        if line.startswith("```"):
            block = []
            i += 1
            while i < len(lines) and not lines[i].startswith("```"):
                block.append(lines[i])
                i += 1
            out.append("<pre><code>%s</code></pre>"
                       % html.escape("\n".join(block)))
        elif re.match(r"^#{1,6} ", line):
            level = len(line) - len(line.lstrip("#"))
            out.append("<h%d>%s</h%d>"
                       % (level, _inline(line[level + 1:]), level))
        elif line.startswith("- "):
            if not in_list:
                out.append("<ul>")
                in_list = True
            out.append("<li>%s</li>" % _inline(line[2:]))
        else:
            if in_list and not line.startswith("- "):
                out.append("</ul>")
                in_list = False
            if line.strip():
                out.append("<p>%s</p>" % _inline(line))
        i += 1
    if in_list:
        out.append("</ul>")
    out.append("</body></html>")
    return "\n".join(out)


def build_api_page():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from xitorch_tpu import LinearOperator
    from xitorch_tpu.integrate import mcquad, quad, solve_ivp
    from xitorch_tpu.interpolate import Interp1D
    from xitorch_tpu.linalg import solve, svd, symeig
    from xitorch_tpu.optimize import equilibrium, minimize, rootfinder

    sections = []
    for obj in (LinearOperator, solve, symeig, svd, rootfinder, equilibrium,
                minimize, quad, solve_ivp, mcquad, Interp1D):
        name = obj.__name__
        doc = obj.__doc__ or ""
        assert doc.strip(), "%s has an empty docstring" % name
        sections.append("<h2><code>%s</code></h2>\n<pre>%s</pre>"
                        % (html.escape(name), html.escape(doc, quote=False)))
    body = ("<!doctype html><html><head><meta charset='utf-8'>"
            "<title>API reference</title>%s</head><body>"
            "<h1>xitorch_tpu API reference</h1>"
            "<p>Docstrings below are the synthesized text (per-method "
            "option sections included) that <code>help()</code> shows.</p>"
            "%s</body></html>" % (_STYLE, "\n".join(sections)))
    return body


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    sys.path.insert(0, os.path.join(DOC, ".."))
    n = 0
    for root, _dirs, files in os.walk(DOC):
        if os.path.abspath(root).startswith(os.path.abspath(OUT)):
            continue
        for f in files:
            if not f.endswith(".md"):
                continue
            src = os.path.join(root, f)
            rel = os.path.relpath(src, DOC)
            dst = os.path.join(OUT, rel).replace(".md", ".html")
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            with open(src) as fh:
                md = fh.read()
            with open(dst, "w") as fh:
                fh.write(md_to_html(md, title=rel))
            n += 1
    with open(os.path.join(OUT, "api.html"), "w") as fh:
        fh.write(build_api_page())
    print("doc build: %d pages + api.html -> %s" % (n, OUT))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
