#!/usr/bin/env python3
"""Generate the API reference (docs/api/*.md) from docstrings.

First-party analogue of the reference's Sphinx autosummary pipeline
(/root/reference/docs/source/api.rst + conf.py): walks the public
modules, introspects signatures and docstrings, and writes one markdown
page per module plus an index. The pages are committed; CI rebuilds the
site with mkdocs and ``tests/test_docs.py`` fails if the committed pages
drift from the code.

Run from the repo root:  python scripts/gen_api_docs.py
"""

from __future__ import annotations

import importlib
import inspect
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODULES = [
    "snn_for_object_detection_tpu.models.spec",
    "snn_for_object_detection_tpu.models.compile",
    "snn_for_object_detection_tpu.models.detector",
    "snn_for_object_detection_tpu.models.tiny_yolo",
    "snn_for_object_detection_tpu.models.yolo",
    "snn_for_object_detection_tpu.models.vgg",
    "snn_for_object_detection_tpu.ops.neurons",
    "snn_for_object_detection_tpu.ops.anchors",
    "snn_for_object_detection_tpu.ops.boxes",
    "snn_for_object_detection_tpu.ops.matching",
    "snn_for_object_detection_tpu.ops.nms",
    "snn_for_object_detection_tpu.ops.pallas_kernels",
    "snn_for_object_detection_tpu.ops.megakernel",
    "snn_for_object_detection_tpu.ops.quantize",
    "snn_for_object_detection_tpu.data.prophesee",
    "snn_for_object_detection_tpu.data.psee",
    "snn_for_object_detection_tpu.data.rasterize",
    "snn_for_object_detection_tpu.data.synthetic",
    "snn_for_object_detection_tpu.data.augment",
    "snn_for_object_detection_tpu.serve",
    "snn_for_object_detection_tpu.export",
    "snn_for_object_detection_tpu.train.loop",
    "snn_for_object_detection_tpu.train.metrics",
    "snn_for_object_detection_tpu.train.checkpoint",
    "snn_for_object_detection_tpu.train.loggers",
    "snn_for_object_detection_tpu.parallel.mesh",
    "snn_for_object_detection_tpu.parallel.distributed",
    "snn_for_object_detection_tpu.utils.config",
    "snn_for_object_detection_tpu.utils.plotter",
    "snn_for_object_detection_tpu.utils.analysis",
    "snn_for_object_detection_tpu.utils.summary",
    "snn_for_object_detection_tpu.native.bindings",
]

OUT_DIR = os.path.join("docs", "api")


def _clean_doc(obj) -> str:
    doc = inspect.getdoc(obj)
    if not doc:
        return ""
    lines, params = [], []
    for line in doc.splitlines():
        s = line.strip()
        # light RST-field -> markdown-bullet conversion
        if s.startswith(":param "):
            name, _, rest = s[len(":param "):].partition(":")
            params.append(f"- **{name.strip()}** — {rest.strip()}")
        elif s.startswith(":type ") or s.startswith(":rtype:"):
            continue
        elif s.startswith(":return:") or s.startswith(":returns:"):
            params.append(f"- **returns** — {s.split(':', 2)[2].strip()}")
        elif s.startswith(":raises "):
            name, _, rest = s[len(":raises "):].partition(":")
            params.append(f"- **raises {name.strip()}** — {rest.strip()}")
        else:
            lines.append(line)
    out = "\n".join(lines).rstrip()
    if params:
        out += "\n\n" + "\n".join(params)
    return out


def _signature(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _is_public(name: str) -> bool:
    return not name.startswith("_")


def _document_class(cls, md: list) -> None:
    md.append(f"### `class {cls.__name__}`\n")
    bases = [b.__name__ for b in cls.__bases__ if b is not object]
    if bases:
        md.append(f"*Bases: {', '.join(bases)}*\n")
    doc = _clean_doc(cls)
    if doc:
        md.append(doc + "\n")
    if "__init__" in cls.__dict__:
        md.append(f"```python\n{cls.__name__}{_signature(cls.__init__)}\n```\n")
    for name, member in sorted(vars(cls).items()):
        if not _is_public(name) or name == "__init__":
            continue
        if isinstance(member, staticmethod) or isinstance(member, classmethod):
            member = member.__func__
        if inspect.isfunction(member):
            md.append(f"#### `{cls.__name__}.{name}{_signature(member)}`\n")
            mdoc = _clean_doc(member)
            if mdoc:
                md.append(mdoc + "\n")
        elif isinstance(member, property):
            md.append(f"#### `{cls.__name__}.{name}` *(property)*\n")
            mdoc = _clean_doc(member)
            if mdoc:
                md.append(mdoc + "\n")


def document_module(modname: str) -> str:
    mod = importlib.import_module(modname)
    md = [f"# `{modname}`\n"]
    mdoc = _clean_doc(mod)
    if mdoc:
        md.append(mdoc + "\n")

    classes = [
        (n, o) for n, o in sorted(vars(mod).items())
        if _is_public(n) and inspect.isclass(o) and o.__module__ == modname
    ]
    functions = [
        (n, o) for n, o in sorted(vars(mod).items())
        # isfunction misses jax.jit-wrapped callables; accept any public
        # non-class callable defined in this module
        if _is_public(n) and callable(o) and not inspect.isclass(o)
        and not inspect.ismodule(o)
        and getattr(o, "__module__", None) == modname
    ]
    if classes:
        md.append("## Classes\n")
        for _, cls in classes:
            _document_class(cls, md)
    if functions:
        md.append("## Functions\n")
        for name, fn in functions:
            md.append(f"### `{name}{_signature(fn)}`\n")
            fdoc = _clean_doc(fn)
            if fdoc:
                md.append(fdoc + "\n")
    return "\n".join(md).rstrip() + "\n"


def page_name(modname: str) -> str:
    return modname.split(".", 1)[1].replace(".", "_") + ".md"


def generate(root: str = ".") -> dict:
    """Return {relative path: content} for every API page."""
    pages = {}
    index = [
        "# API reference\n",
        "Generated from docstrings by `scripts/gen_api_docs.py` "
        "(first-party autosummary; reference: docs/source/api.rst).\n",
    ]
    by_pkg: dict = {}
    for modname in MODULES:
        fname = page_name(modname)
        pages[os.path.join(OUT_DIR, fname)] = document_module(modname)
        pkg = modname.split(".")[1]
        by_pkg.setdefault(pkg, []).append((modname, fname))
    for pkg, entries in by_pkg.items():
        index.append(f"## `{pkg}`\n")
        for modname, fname in entries:
            short = modname.split(".", 1)[1]
            index.append(f"- [`{short}`]({fname})")
        index.append("")
    pages[os.path.join(OUT_DIR, "index.md")] = "\n".join(index).rstrip() + "\n"
    return pages


def main():
    pages = generate()
    os.makedirs(OUT_DIR, exist_ok=True)
    for path, content in pages.items():
        with open(path, "w") as f:
            f.write(content)
    print(f"wrote {len(pages)} pages under {OUT_DIR}/")


if __name__ == "__main__":
    main()
