"""SDK *serializer-layer* verification (round-4 verdict item 5).

The builder-call extraction (``tests/test_sdk_extract.py``) proves each
generator's CALLS reproduce the corpus via the Python DSL's encoder.
These tests go one layer deeper: each SDK's OWN builder bodies are
executed by a per-language interpreter (``tests/parity/extract/{go,ts}native``)
and the resulting wire values are diffed against the committed corpus —
so a bug in a Go composite literal or a TS object body fails here even
though the builder calls look right.

Mutation tests seed serializer bugs into the SDK source text and assert
the replay catches them.

Already caught for real (round 4): the TS generator passed raw ``55.0``
/ ``1.0`` where JS numbers cannot encode float-ness — real TypeScript
would emit ``{I64: 55}`` against the corpus's ``{F64: 55.0}``; the
generator now pins ``PropertyValue.f64`` like the reference's own TS
SDK requires (reference ``sdks/typescript/src/dsl.ts`` coerces whole
JS numbers to I64 the same way).
"""

import json
from pathlib import Path

import pytest

from tests.parity.extract.corpus import load_corpus
from tests.parity.extract.shims import FixtureSink

SDKS = Path(__file__).resolve().parents[1] / "sdks"


# The structural diff is THE shared parity definition — one
# implementation in corpus.py, not a drifting copy here.  (A local
# near-duplicate once accepted True vs 1 as equal through an inverted
# bool clause, which would have certified a serializer emitting 0/1
# for booleans.)
from tests.parity.extract.corpus import _diff


def _replay(language: str, src: str | None = None) -> list[str]:
    sink = FixtureSink()
    if language == "go":
        from tests.parity.extract.gonative import extract_native

        src = src or (SDKS / "go/cmd/generate-parity-fixtures/main.go").read_text()
        extract_native(src, sink)
        js_numbers = False
    elif language == "typescript":
        from tests.parity.extract.tsnative import extract_native

        src = src or (SDKS / "typescript/scripts/generate-fixtures.ts").read_text()
        extract_native(src, sink)
        js_numbers = True
    elif language == "rust":
        from tests.parity.extract.rustnative import extract_native

        src = src or (SDKS / "rust/examples/generate_parity_fixtures.rs").read_text()
        extract_native(src, sink)
        js_numbers = False
    else:
        raise ValueError(language)
    committed = load_corpus()
    extracted = {
        k: json.loads(json.dumps(v)) for k, v in sink.corpus.items()
    }
    problems: list[str] = []
    for key in sorted(set(committed) | set(extracted)):
        if key not in extracted:
            problems.append(f"{key}: not emitted")
            continue
        if key not in committed:
            problems.append(f"{key}: emitted but not committed")
            continue
        diffs: list[str] = []
        _diff(committed[key], extracted[key], str(key), diffs, js_numbers)
        problems.extend(diffs[:5])
    assert len(extracted) == len(committed), (
        f"extracted {len(extracted)} fixtures, corpus has {len(committed)}"
    )
    return problems


# ---------------------------------------------------------------- corpus


def test_go_serializer_reproduces_corpus():
    assert _replay("go") == []


def test_ts_serializer_reproduces_corpus():
    assert _replay("typescript") == []


_RUSTNATIVE = (
    Path(__file__).resolve().parent / "parity/extract/rustnative.py"
).exists()
rust_pending = pytest.mark.skipif(
    not _RUSTNATIVE, reason="rust serializer interpreter pending"
)


@rust_pending
def test_rust_serializer_reproduces_corpus():
    assert _replay("rust") == []


# ------------------------------------------------------------- mutations
#
# Each mutation edits the DSL SOURCE (not the generator): a serializer
# bug must fail the replay.  The interpreters read the dsl source from
# disk, so mutations go through a monkeypatched reader.


def _mutated_go(monkeypatch, old: str, new: str):
    import tests.parity.extract.gonative as gn

    dsl = (SDKS / "go/dsl.go").read_text()
    assert old in dsl, f"mutation anchor missing: {old!r}"
    mutated = dsl.replace(old, new)
    orig_module = gn.GoModule

    def patched(src):
        return orig_module(mutated)

    monkeypatch.setattr(gn, "GoModule", patched)


def _mutated_ts(monkeypatch, old: str, new: str):
    import tests.parity.extract.tsnative as tn

    dsl = (SDKS / "typescript/src/dsl.ts").read_text()
    assert old in dsl, f"mutation anchor missing: {old!r}"
    mutated = dsl.replace(old, new)
    orig_module = tn.TsModule

    def patched(src):
        return orig_module(mutated)

    monkeypatch.setattr(tn, "TsModule", patched)


GO_MUTATIONS = [
    # wrong step tag
    ('map[string]J{"Out": nilable(label)}',
     'map[string]J{"OUT": nilable(label)}'),
    # dropped field in the search payload
    ('"query_vector": map[string]J{"Value": map[string]J{"F32Array": query}},',
     ''),
    # integer property values mis-tagged
    ('case int:\n\t\treturn map[string]J{"I64": v}',
     'case int:\n\t\treturn map[string]J{"F64": v}'),
    # envelope field renamed (struct json tag)
    ('`json:"request_type"`', '`json:"requestType"`'),
    # condition field dropped from batch entries
    ('"name": name, "steps": t.Steps, "condition": nil,',
     '"name": name, "steps": t.Steps,'),
    # booleans serialized as 0/1 numbers (the diff must NOT accept
    # True vs 1 — a former inverted bool clause did)
    ('return map[string]J{"Bool": v}',
     'return map[string]J{"Bool": 1}'),
]


def _caught(language: str) -> bool:
    """A seeded bug is caught by a corpus diff OR by the SDK's own
    error paths throwing during the replay."""
    try:
        return bool(_replay(language))
    except Exception:
        return True


@pytest.mark.parametrize("mutation", range(len(GO_MUTATIONS)))
def test_go_seeded_serializer_bug_fails(monkeypatch, mutation):
    old, new = GO_MUTATIONS[mutation]
    _mutated_go(monkeypatch, old, new)
    assert _caught("go"), f"seeded Go bug survived: {old!r} -> {new!r}"


TS_MUTATIONS = [
    # wrong step tag
    ('return this.push({ Out: label });', 'return this.push({ OUT: label });'),
    # string property values mis-tagged
    ('case "string":\n      return { String: value };',
     'case "string":\n      return { Str: value };'),
    # envelope key renamed
    ('request_type: this.requestType,', 'requestType: this.requestType,'),
    # returns no longer emitted on encode
    ('return { queries: this.queries.slice(), returns: this.returns.slice() };',
     'return { queries: this.queries.slice() };'),
    # booleans serialized as 0/1 (must fail even under the JS
    # one-number tolerance: bool vs number are different wire bytes)
    ('case "boolean":\n      return { Bool: value };',
     'case "boolean":\n      return { Bool: value ? 1 : 0 };'),
]


@pytest.mark.parametrize("mutation", range(len(TS_MUTATIONS)))
def test_ts_seeded_serializer_bug_fails(monkeypatch, mutation):
    old, new = TS_MUTATIONS[mutation]
    _mutated_ts(monkeypatch, old, new)
    assert _caught("typescript"), f"seeded TS bug survived: {old!r} -> {new!r}"


RUST_MUTATIONS = [
    # wrong step tag
    ('self.step(json!({ "N": nodes }))', 'self.step(json!({ "NN": nodes }))'),
    # predicate tag array swapped
    ('Predicate(json!({ tag: [prop, encode_property_value(value)] }))',
     'Predicate(json!({ tag: [encode_property_value(value), prop] }))'),
    # envelope parameters always emitted
    ('if !self.parameters.is_empty() {', 'if self.parameters.is_empty() {'),
    # booleans serialized as 0/1 numbers
    ('Value::Bool(b) => json!({ "Bool": b }),',
     'Value::Bool(b) => json!({ "Bool": if b { 1 } else { 0 } }),'),
]


def _mutated_rust(monkeypatch, old: str, new: str):
    import tests.parity.extract.rustnative as rn

    dsl = (SDKS / "rust/src/dsl.rs").read_text()
    assert old in dsl, f"mutation anchor missing: {old!r}"
    mutated = dsl.replace(old, new)
    orig_module = rn.RsModule

    def patched(src):
        return orig_module(mutated)

    monkeypatch.setattr(rn, "RsModule", patched)


@rust_pending
@pytest.mark.parametrize("mutation", range(len(RUST_MUTATIONS)))
def test_rust_seeded_serializer_bug_fails(monkeypatch, mutation):
    old, new = RUST_MUTATIONS[mutation]
    _mutated_rust(monkeypatch, old, new)
    assert _caught("rust"), f"seeded Rust bug survived: {old!r} -> {new!r}"
