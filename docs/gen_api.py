"""Self-contained API-reference generator (no network, no extra deps).

The reference ships a Sphinx build (``/root/reference/docs/conf.py``,
``Makefile:10``); this environment has no sphinx/pdoc/mkdocs available and
package installation is disallowed, so this module walks the package with
:mod:`inspect` and emits a static HTML API reference plus an examples index
to ``docs/api/``.

Run from the repo root::

    make docs            # or: python docs/gen_api.py

Output:
  docs/api/index.html          package overview + module index
  docs/api/<module>.html       one page per public module
  docs/api/examples.html       index of docs/examples/ with first docstrings
"""
from __future__ import annotations

import html
import importlib
import inspect
import os
import pkgutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "docs", "api")
PACKAGE = "vi_diffusion_processes_tpu"

CSS = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif; margin: 0;
       color: #1a1a2e; line-height: 1.55; }
.wrap { max-width: 960px; margin: 0 auto; padding: 2rem 1.5rem 4rem; }
h1 { font-size: 1.7rem; border-bottom: 2px solid #e3e3ef; padding-bottom: .4rem; }
h2 { font-size: 1.25rem; margin-top: 2.2rem; color: #24245c; }
h3 { font-size: 1.02rem; margin: 1.4rem 0 .3rem; }
code, pre { font-family: ui-monospace, 'SF Mono', Menlo, Consolas, monospace;
            font-size: .88em; background: #f4f4fa; border-radius: 4px; }
code { padding: .1em .3em; }
pre { padding: .8rem 1rem; overflow-x: auto; border: 1px solid #e3e3ef; }
.doc { white-space: pre-wrap; margin: .25rem 0 .8rem; color: #333; }
.sig { background: #eef3fb; border-left: 3px solid #4a6fd4; padding: .45rem .8rem;
       margin-top: 1rem; border-radius: 0 4px 4px 0; overflow-x: auto; }
.kind { color: #8959a8; font-size: .8em; text-transform: uppercase;
        letter-spacing: .06em; margin-right: .5em; }
a { color: #2d5bd1; text-decoration: none; }
a:hover { text-decoration: underline; }
ul.index { columns: 2; list-style: none; padding-left: 0; }
ul.index li { margin: .15rem 0; break-inside: avoid; }
.nav { background: #24245c; color: #fff; padding: .7rem 1.5rem; font-size: .9rem; }
.nav a { color: #c7d2ff; margin-right: 1.2rem; }
table { border-collapse: collapse; }
td, th { border: 1px solid #e3e3ef; padding: .35rem .7rem; text-align: left; }
"""


def _page(title: str, body: str) -> str:
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{html.escape(title)}</title><style>{CSS}</style></head><body>"
        "<div class='nav'><a href='index.html'>API index</a>"
        "<a href='examples.html'>Examples</a>"
        f"<span>{html.escape(PACKAGE)}</span></div>"
        f"<div class='wrap'>{body}</div></body></html>"
    )


def _doc(obj) -> str:
    d = inspect.getdoc(obj) or ""
    return f"<div class='doc'>{html.escape(d)}</div>" if d else ""


def _sig(name: str, obj) -> str:
    try:
        s = str(inspect.signature(obj))
    except (ValueError, TypeError):
        s = "(…)"
    return html.escape(name + s)


def _public_members(mod):
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith("_")]
    out = []
    for n in names:
        obj = getattr(mod, n, None)
        if obj is None:
            continue
        mod_of = getattr(obj, "__module__", None)
        if inspect.ismodule(obj) or (mod_of and mod_of != mod.__name__):
            continue  # re-exports documented at their home module
        if inspect.isclass(obj) or inspect.isfunction(obj):
            out.append((n, obj))
    return out


def _render_class(name: str, cls) -> str:
    parts = [f"<h3 id='{name}'><span class='kind'>class</span><code>{_sig(name, cls)}</code></h3>"]
    parts.append(_doc(cls))
    for mname, meth in sorted(vars(cls).items()):
        if mname.startswith("_"):
            continue
        raw = meth
        if isinstance(raw, (staticmethod, classmethod)):
            raw = raw.__func__
        if isinstance(raw, property):
            parts.append(
                f"<div class='sig'><span class='kind'>property</span>"
                f"<code>{html.escape(mname)}</code></div>{_doc(raw.fget)}"
            )
        elif inspect.isfunction(raw):
            parts.append(
                f"<div class='sig'><code>{_sig(mname, raw)}</code></div>{_doc(raw)}"
            )
    return "".join(parts)


def _render_module(mod) -> str:
    parts = [f"<h1><code>{html.escape(mod.__name__)}</code></h1>", _doc(mod)]
    classes = [(n, o) for n, o in _public_members(mod) if inspect.isclass(o)]
    funcs = [(n, o) for n, o in _public_members(mod) if inspect.isfunction(o)]
    if classes:
        parts.append("<h2>Classes</h2>")
        parts.extend(_render_class(n, o) for n, o in classes)
    if funcs:
        parts.append("<h2>Functions</h2>")
        for n, o in funcs:
            parts.append(
                f"<h3 id='{n}'><span class='kind'>def</span>"
                f"<code>{_sig(n, o)}</code></h3>{_doc(o)}"
            )
    return "".join(parts)


def _iter_modules():
    pkg = importlib.import_module(PACKAGE)
    yield PACKAGE, pkg
    for info in pkgutil.walk_packages(pkg.__path__, prefix=PACKAGE + "."):
        if any(p.startswith("_") for p in info.name.split(".")):
            continue
        try:
            yield info.name, importlib.import_module(info.name)
        except Exception as exc:  # pragma: no cover - import-time env issues
            print(f"skip {info.name}: {exc}", file=sys.stderr)


def _examples_page() -> str:
    import ast

    ex_dir = os.path.join(ROOT, "docs", "examples")
    rows = []
    for fname in sorted(os.listdir(ex_dir)):
        if not fname.endswith(".py"):
            continue
        with open(os.path.join(ex_dir, fname)) as f:
            tree = ast.parse(f.read())
        doc = (ast.get_docstring(tree) or "").strip().splitlines()
        first = doc[0] if doc else ""
        rows.append(
            f"<tr><td><code>{html.escape(fname)}</code></td>"
            f"<td>{html.escape(first)}</td></tr>"
        )
    body = (
        "<h1>Examples</h1><p>Executable scripts in <code>docs/examples/</code>; "
        "all are run by <code>tests/integration/test_examples.py</code>.</p>"
        f"<table><tr><th>script</th><th>what it shows</th></tr>{''.join(rows)}</table>"
    )
    return _page("Examples", body)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    sys.path.insert(0, ROOT)
    # stay off the TPU tunnel: module imports alone must not touch a backend
    # (the axon sitecustomize force-sets jax_platforms; see tests/conftest.py)
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        from jax.extend.backend import clear_backends

        clear_backends()
    except Exception:
        pass
    index_items = []
    for name, mod in _iter_modules():
        fname = name.replace(".", "_") + ".html"
        with open(os.path.join(OUT, fname), "w") as f:
            f.write(_page(name, _render_module(mod)))
        first = (inspect.getdoc(mod) or "").strip().splitlines()
        hook = html.escape(first[0]) if first else ""
        index_items.append(
            f"<li><a href='{fname}'><code>{html.escape(name)}</code></a> — {hook}</li>"
        )
    body = (
        f"<h1>{PACKAGE} — API reference</h1>"
        "<p>Generated by <code>docs/gen_api.py</code> (stdlib inspect walk; "
        "the environment ships no sphinx). See also the "
        "<a href='examples.html'>examples index</a> and the README.</p>"
        f"<h2>Modules</h2><ul class='index'>{''.join(index_items)}</ul>"
    )
    with open(os.path.join(OUT, "index.html"), "w") as f:
        f.write(_page("API reference", body))
    with open(os.path.join(OUT, "examples.html"), "w") as f:
        f.write(_examples_page())
    print(f"wrote {len(index_items) + 2} pages to {OUT}")


if __name__ == "__main__":
    main()
