"""API-reference freshness: the committed docs/api pages must match
what scripts/gen_api_docs.py generates from the current docstrings
(the CI-enforced analogue of Sphinx autosummary staying in sync,
reference docs/source/api.rst)."""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_generator():
    path = os.path.join(REPO, "scripts", "gen_api_docs.py")
    spec = importlib.util.spec_from_file_location("gen_api_docs", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_api_docs_are_current():
    gen = _load_generator()
    pages = gen.generate()
    assert len(pages) > 20
    stale = []
    for rel, content in pages.items():
        path = os.path.join(REPO, rel)
        if not os.path.exists(path):
            stale.append(f"missing: {rel}")
            continue
        with open(path) as f:
            if f.read() != content:
                stale.append(f"outdated: {rel}")
    assert not stale, (
        "API docs drifted from docstrings — run "
        "`python scripts/gen_api_docs.py`:\n" + "\n".join(stale)
    )


def test_api_docs_cover_core_symbols():
    gen = _load_generator()
    pages = gen.generate()
    text = "\n".join(pages.values())
    for symbol in (
        "class SODa", "class TinyYolo", "class Trainer",
        "class MeanAveragePrecision", "class PropheseeDataModule",
        "lif_step", "multibox_detection", "match_targets",
    ):
        assert symbol in text, f"{symbol} missing from API docs"
