"""Corpus loading + structural diff for the extractors."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

from .core import ExtractError
from .shims import FixtureSink

FIXTURES = Path(__file__).resolve().parents[1] / "fixtures"
BUCKETS = ("runtime", "combo", "json-only")


def load_corpus() -> dict[tuple[str, str], Any]:
    corpus: dict[tuple[str, str], Any] = {}
    for bucket in BUCKETS:
        for path in sorted((FIXTURES / bucket).glob("*.json")):
            corpus[(bucket, path.stem)] = json.loads(path.read_text())
    return corpus


def _diff(
    a: Any, b: Any, path: str, out: list[str], js_numbers: bool = False
) -> None:
    """Structural corpus diff — THE definition of wire parity for the
    extractors and the toolchain-gated replay alike.

    Type discipline: ``True`` is never equal to ``1`` (JSON bool vs
    number are different wire bytes), and JSON-equal int/float (1 vs
    1.0) are NOT equal because the wire value model distinguishes
    I64/F64 — except under ``js_numbers``, where 1 and 1.0 serialize to
    the same bytes because JS has one number type (tag-level I64/F64
    divergence is still caught at the enclosing dict key).
    """
    if isinstance(a, dict) and isinstance(b, dict):
        for key in sorted(set(a) | set(b)):
            if key not in a:
                out.append(f"{path}.{key}: extra in extracted")
            elif key not in b:
                out.append(f"{path}.{key}: missing in extracted")
            else:
                _diff(a[key], b[key], f"{path}.{key}", out, js_numbers)
        return
    if isinstance(a, list) and isinstance(b, list):
        if len(a) != len(b):
            out.append(f"{path}: length {len(a)} != {len(b)}")
            return
        for i, (x, y) in enumerate(zip(a, b)):
            _diff(x, y, f"{path}[{i}]", out, js_numbers)
        return
    if isinstance(a, bool) is not isinstance(b, bool):
        # bool vs number: different wire bytes in EVERY language
        out.append(f"{path}: {a!r} ({type(a).__name__}) != "
                   f"{b!r} ({type(b).__name__})")
        return
    if type(a) is not type(b):
        if (
            js_numbers
            and isinstance(a, (int, float))
            and isinstance(b, (int, float))
            and a == b
        ):
            return
        out.append(f"{path}: {a!r} ({type(a).__name__}) != "
                   f"{b!r} ({type(b).__name__})")
        return
    if a != b:
        out.append(f"{path}: {a!r} != {b!r}")


def extract_and_diff(language: str) -> tuple[int, list[str]]:
    """Run one language's extractor; returns (fixture_count, problems)."""
    sdks = Path(__file__).resolve().parents[3] / "sdks"
    sink = FixtureSink()
    if language == "rust":
        from . import rustfe

        src = (sdks / "rust/examples/generate_parity_fixtures.rs").read_text()
        rustfe.extract(src, sink)
    elif language == "typescript":
        from . import tsfe

        src = (sdks / "typescript/scripts/generate-fixtures.ts").read_text()
        tsfe.extract(src, sink)
    elif language == "go":
        from . import gofe

        src = (
            sdks / "go/cmd/generate-parity-fixtures/main.go"
        ).read_text()
        gofe.extract(src, sink)
    else:
        raise ExtractError(f"unknown language {language}")

    committed = load_corpus()
    problems: list[str] = []
    extracted = {}
    for (bucket, name), body in sink.corpus.items():
        body = json.loads(json.dumps(body))  # normalize tuples etc.
        extracted[(bucket, name)] = body
    for key in sorted(set(committed) | set(extracted)):
        bucket, name = key
        if key not in extracted:
            problems.append(f"{bucket}/{name}: not emitted by {language}")
            continue
        if key not in committed:
            problems.append(f"{bucket}/{name}: emitted but not committed")
            continue
        diffs: list[str] = []
        _diff(committed[key], extracted[key], f"{bucket}/{name}", diffs)
        problems.extend(diffs[:5])
    return len(extracted), problems
