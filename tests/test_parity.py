"""Parity corpus: validate every fixture, replay runtime + combo buckets,
and assert against committed goldens (the rebuild's analog of the
reference's cross-SDK parity tier, ``sdks/tests/parity/README.md``)."""

import json
import math
from pathlib import Path

import pytest

from helix_tpu import wire
from tests.parity import replay

FIXTURES = Path(__file__).parent / "parity" / "fixtures"
EXPECTED = Path(__file__).parent / "parity" / "expected"

ALL_FIXTURES = sorted(FIXTURES.glob("*/*.json"))


def approx_equal(left, right, rel=1e-6):
    """Structural equality with float tolerance (distances/scores)."""
    if isinstance(left, float) or isinstance(right, float):
        if not isinstance(left, (int, float)) or not isinstance(right, (int, float)):
            return False
        return math.isclose(float(left), float(right), rel_tol=rel, abs_tol=1e-9)
    if isinstance(left, list):
        return (
            isinstance(right, list)
            and len(left) == len(right)
            and all(approx_equal(a, b, rel) for a, b in zip(left, right))
        )
    if isinstance(left, dict):
        return (
            isinstance(right, dict)
            and left.keys() == right.keys()
            and all(approx_equal(left[k], right[k], rel) for k in left)
        )
    return left == right


def test_fixture_corpus_counts():
    assert len(list((FIXTURES / "runtime").glob("*.json"))) >= 25
    assert len(list((FIXTURES / "combo").glob("*.json"))) == 192
    assert len(list((FIXTURES / "json-only").glob("*.json"))) == 12


@pytest.mark.parametrize("path", ALL_FIXTURES, ids=lambda p: f"{p.parent.name}/{p.stem}")
def test_fixture_validates_and_roundtrips(path):
    body = json.loads(path.read_text())
    wire.validate_request(body)
    # Round-trip through compact serialization.
    assert json.loads(wire.dumps(body)) == body


def test_runtime_replay_matches_goldens():
    expected = json.loads((EXPECTED / "runtime.json").read_text())
    actual = replay.replay_runtime()
    assert set(actual) == set(expected)
    for name in expected:
        assert approx_equal(actual[name], expected[name]), (
            f"{name}:\nactual:   {json.dumps(actual[name], sort_keys=True)}\n"
            f"expected: {json.dumps(expected[name], sort_keys=True)}"
        )


def test_combo_replay_matches_goldens():
    expected = json.loads((EXPECTED / "combo.json").read_text())
    actual = replay.replay_combo()
    assert set(actual) == set(expected)
    mismatches = [
        name for name in expected if not approx_equal(actual[name], expected[name])
    ]
    assert not mismatches, f"combo mismatches: {mismatches[:10]}"


def test_three_fresh_instances_agree():
    """The reference parity harness replays fixtures against three fresh
    engine instances and diffs their outputs (run-helix.ts:16-48); the
    engine must be deterministic across instances."""
    runs = [replay.replay_runtime() for _ in range(3)]
    assert runs[0] == runs[1] == runs[2]
