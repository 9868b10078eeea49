"""Shared replay harness: run fixture buckets against a fresh engine.

Runtime fixtures execute in filename order against one engine instance
(writes seed state for later reads, mirroring the reference's runtime
replay ``run-helix.ts:16-48``).  Combo fixtures execute against the
post-seed state only (fixtures 001-004), since later runtime fixtures
mutate the dataset.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
FIXTURES = HERE / "fixtures"
EXPECTED = HERE / "expected"

sys.path.insert(0, str(HERE.parents[1]))

from helix_tpu.engine import Engine  # noqa: E402

SEED_PREFIXES = ("001-", "002-", "003-", "004-")


def fixture_paths(bucket: str) -> list[Path]:
    return sorted((FIXTURES / bucket).glob("*.json"))


def replay_runtime() -> dict[str, object]:
    engine = Engine()
    results: dict[str, object] = {}
    for path in fixture_paths("runtime"):
        request = json.loads(path.read_text())
        results[path.stem] = engine.execute(request)
    return results


def replay_combo() -> dict[str, object]:
    engine = Engine()
    for path in fixture_paths("runtime"):
        if path.name.startswith(SEED_PREFIXES):
            engine.execute(json.loads(path.read_text()))
    results: dict[str, object] = {}
    for path in fixture_paths("combo"):
        request = json.loads(path.read_text())
        results[path.stem] = engine.execute(request)
    return results


def main() -> None:
    EXPECTED.mkdir(exist_ok=True)
    (EXPECTED / "runtime.json").write_text(
        json.dumps(replay_runtime(), indent=2, ensure_ascii=False, sort_keys=True) + "\n"
    )
    (EXPECTED / "combo.json").write_text(
        json.dumps(replay_combo(), indent=2, ensure_ascii=False, sort_keys=True) + "\n"
    )
    print("wrote expected/runtime.json and expected/combo.json")


if __name__ == "__main__":
    main()
