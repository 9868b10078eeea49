"""hxjson native codec: stdlib-equivalence (loads + dumps), fuzz."""

import json
import math
import random
import struct

import pytest

from helix_tpu import fastjson

pytestmark = pytest.mark.skipif(
    not fastjson.native_available(), reason="no native toolchain"
)


CASES = [
    None, True, False, 0, -1, 1, 2**31, 2**53 + 1, 2**63 - 1, 2**64 - 1,
    -(2**63), 2**80, -(2**80),
    0.0, -0.0, 1.0, 0.1, 1e-5, 1e16, 1e15, 123456.789, 3.141592653589793,
    5e-324, 1.7976931348623157e308, 1e100, -2.5e-10,
    "", "hello", "quote\"back\\slash", "tab\tnl\ncr\r", "\x01\x1f",
    "unicode: ñ 中文 🎉", "surrogate pair: \U0001F600",
    [], [1, 2, 3], [None, True, "x", 1.5], {},
    {"a": 1}, {"k": [1, {"n": None}], "z": "s"},
    {"nested": {"deep": [{"x": [0.25, -17]}]}},
]


@pytest.mark.parametrize("value", CASES, ids=range(len(CASES)))
def test_dumps_matches_stdlib(value):
    assert fastjson.dumps(value) == json.dumps(value, ensure_ascii=False)
    assert fastjson.dumps(value, compact=True) == json.dumps(
        value, ensure_ascii=False, separators=(",", ":")
    )


@pytest.mark.parametrize("value", CASES, ids=range(len(CASES)))
def test_loads_round_trip(value):
    text = json.dumps(value, ensure_ascii=False)
    assert fastjson.loads(text) == json.loads(text)
    assert fastjson.loads(text.encode()) == json.loads(text)


def test_nan_infinity_like_stdlib():
    for text in ["NaN", "Infinity", "-Infinity"]:
        got = fastjson.loads(text)
        ref = json.loads(text)
        assert (got == ref) or (math.isnan(got) and math.isnan(ref))
    assert fastjson.dumps(float("inf")) == "Infinity"
    assert fastjson.dumps(float("nan")) == "NaN"


def test_escapes_and_surrogate_pairs():
    text = r'"Aé中😀\t\\\""'
    assert fastjson.loads(text) == json.loads(text)


def test_duplicate_keys_last_wins():
    assert fastjson.loads('{"a":1,"a":2}') == {"a": 2}


def test_non_str_keys_coerced_like_stdlib():
    value = {1: "a", 2.5: "b", True: "c", None: "d"}
    assert fastjson.dumps(value) == json.dumps(value, ensure_ascii=False)


def test_errors():
    for bad in ["", "{", "[1,", '"unterminated', "{1:2}", "[1 2]",
                "tru", "nul", '{"a":}', "1.2.3", "[]extra"]:
        with pytest.raises(ValueError):
            fastjson.loads(bad)
    with pytest.raises(TypeError):
        fastjson._load().dumps(object())


def test_float_formatting_fuzz():
    rng = random.Random(7)
    for _ in range(20000):
        bits = rng.getrandbits(64)
        (v,) = struct.unpack("<d", struct.pack("<Q", bits))
        if math.isnan(v) or math.isinf(v):
            continue
        assert fastjson.dumps(v) == repr(v), hex(bits)
        # decode round-trips exactly
        assert fastjson.loads(fastjson.dumps(v)) == v


def test_float_parse_differential():
    """The Eisel-Lemire fast path (native/fastdouble.h) is bit-exact
    with stdlib json on shortest-repr, 17-digit, random-decimal, and
    boundary tokens (over/underflow keep their direction, subnormals
    survive)."""
    rng = random.Random(13)
    tokens = [
        "2.2250738585072011e-308", "2.2250738585072014e-308",
        "4.9406564584124654e-324", "1.7976931348623157e308", "5e-324",
        "2.4703282292062327e-324", "2.4703282292062328e-324",
        "9007199254740993", "1e309", "-1e309", "1e-325", "-1e-325",
        "1.00000000000000011102230246251565404236316680908203125",
        "7.2057594037927933e16",
    ]
    for q in range(-340, 320, 7):
        tokens.append(f"9.999999999999999e{q}")
        tokens.append(f"1e{q}")
    for _ in range(5000):
        bits = rng.getrandbits(64)
        (v,) = struct.unpack("<d", struct.pack("<Q", bits))
        if math.isnan(v) or math.isinf(v):
            continue
        tokens.append(repr(v))
        tokens.append(f"{v:.17g}")
    for _ in range(5000):
        digits = rng.choice("123456789") + "".join(
            rng.choice("0123456789") for _ in range(rng.randint(0, 20)))
        tokens.append(f"-{digits}e{rng.randint(-345, 315)}")
    for tok in tokens:
        expect = json.loads(tok)
        for text in (tok, f"[{tok}]", "[" + ",".join([tok] * 40) + "]"):
            got = fastjson.loads(text, fast_arrays=True)
            while isinstance(got, (list,)) or type(got).__name__ == "array":
                got = got[0]
            assert struct.pack("<d", got) == struct.pack("<d", expect), tok


def test_structure_fuzz():
    rng = random.Random(11)

    def gen(depth):
        roll = rng.random()
        if depth > 4 or roll < 0.3:
            return rng.choice(
                [None, True, False, rng.randint(-(2**64), 2**64),
                 rng.random() * 10 ** rng.randint(-20, 20),
                 "".join(chr(rng.randint(1, 0x2FFF)) for _ in range(rng.randint(0, 8)))]
            )
        if roll < 0.65:
            return [gen(depth + 1) for _ in range(rng.randint(0, 5))]
        return {
            "".join(chr(rng.randint(32, 500)) for _ in range(rng.randint(0, 6))): gen(depth + 1)
            for _ in range(rng.randint(0, 5))
        }

    for _ in range(300):
        value = gen(0)
        text = json.dumps(value, ensure_ascii=False)
        assert fastjson.dumps(value) == text
        assert fastjson.loads(text) == json.loads(text)


def test_adversarial_no_crash():
    """Hostile input must raise ValueError, never crash or mis-parse:
    key-cache boundaries (KEY_MAX, escaped-vs-plain collisions, dups),
    mutated wire bodies, and raw garbage.  Where stdlib also accepts a
    mutant, values must agree."""
    rng = random.Random(42)
    corpus = [
        b'{"' + b"k" * 39 + b'": 1}',  # KEY_MAX boundary (40)
        b'{"' + b"k" * 40 + b'": 1}',
        b'{"' + b"k" * 41 + b'": 1}',
        b'{"\\u0041same": 1, "Asame": 2}',
        b"[" * 900 + b"]" * 900,
        b'{"k\xc3\xa9": 1, "k\xc3\xa9": 2}',
        b'{"": 1, "": 2}',
        b"[0." + b"0" * 100 + b"1]",
        b"[1" + b"0" * 400 + b"]",
        b"[1e" + b"9" * 100 + b"]",
    ]
    for c in corpus:
        try:
            v = fastjson.loads(c)
            sv = json.loads(c)
            assert v == sv, (c, v, sv)
        except ValueError:
            pass
    assert fastjson.loads(b'{"\\u0041b": 1, "Ab": 2}') == {"Ab": 2}

    def norm(x):
        if isinstance(x, list) or type(x).__name__ == "array":
            return [norm(i) for i in x]
        if isinstance(x, dict):
            return {k: norm(v) for k, v in x.items()}
        return x

    base = json.dumps({"docs": [{"title": "x", "emb": [1.5] * 40}] * 5}).encode()
    for i in range(4000):
        b = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            pos = rng.randrange(len(b))
            op = rng.random()
            if op < 0.4:
                b[pos] = rng.randrange(256)
            elif op < 0.7:
                del b[pos]
            else:
                b.insert(pos, rng.randrange(256))
        data = bytes(b)
        try:
            fastjson.loads(data, fast_arrays=bool(i & 1))
        except (ValueError, RecursionError):
            continue
        try:
            sv = json.loads(data)
        except Exception:
            continue
        assert norm(fastjson.loads(data)) == norm(sv), data[:80]
    for _ in range(4000):
        data = bytes(rng.randrange(256) for _ in range(rng.randint(0, 120)))
        try:
            fastjson.loads(data)
        except (ValueError, RecursionError):
            pass


def test_parity_corpus_round_trips():
    """Every committed parity fixture decodes identically to stdlib."""
    import pathlib

    root = pathlib.Path(__file__).parent / "parity" / "fixtures"
    count = 0
    for path in root.rglob("*.json"):
        raw = path.read_text()
        assert fastjson.loads(raw) == json.loads(raw), path
        count += 1
    assert count > 200


def test_nan_null_mode_is_strict_json():
    """nan_null=True encodes non-finite floats as null so responses are
    strict JSON (bare NaN/Infinity tokens break strict parsers; the
    reference's serde/sonic-rs never emit them)."""
    value = {"a": float("nan"), "b": [float("inf"), float("-inf"), 1.5]}
    for text in (
        fastjson.dumps(value, nan_null=True),
        fastjson.dumpb(value, nan_null=True).decode(),
        fastjson.dumps(value, compact=True, nan_null=True),
    ):
        def _reject(tok):
            raise AssertionError(f"non-JSON token {tok!r} in output")

        parsed = json.loads(text, parse_constant=_reject)
        assert parsed == {"a": None, "b": [None, None, 1.5]}
    # fast-array buffer path honors the flag too
    import array

    blob = fastjson.dumps(
        {"v": array.array("d", [1.0, float("nan")])}, nan_null=True
    )
    assert json.loads(blob) == {"v": [1.0, None]}
    # default mode keeps lossless stdlib-compatible literals (WAL round-trip)
    assert fastjson.dumps(float("nan")) == "NaN"


def test_lone_surrogate_escapes_match_stdlib():
    """stdlib json accepts unpaired \\uD800-\\uDFFF escapes and returns
    the lone surrogate; the native codec must agree instead of raising
    UnicodeDecodeError."""
    import json as stdlib_json

    from helix_tpu import fastjson

    for payload in (r'"\ud800"', r'"\udfff"', r'"a\ud800b"',
                    r'"\ud800\ud800"', r'"😀"'):
        assert fastjson.loads(payload) == stdlib_json.loads(payload), payload
    # valid pairs still decode to the astral character
    assert fastjson.loads(r'"😀"') == "\U0001F600"


def test_raw_surrogate_bytes_still_rejected():
    """surrogatepass only admits surrogates produced by validated
    \\uXXXX escapes.  Raw CESU-8 surrogate BYTES are invalid UTF-8
    (RFC 3629) and stay rejected — stdlib json happens to accept them
    as an artifact of decoding byte input with surrogatepass; we are
    deliberately stricter there, and only there."""
    import pytest

    from helix_tpu import fastjson

    raw = b'"\\ud800' + b"\xed\xa0\x80" + b'"'
    with pytest.raises(ValueError):
        fastjson.loads(raw)
    with pytest.raises(ValueError):
        fastjson.loads(b'"' + b"\xed\xa0\x80" + b'"')
    # validated escapes alone still parse, matching stdlib
    assert fastjson.loads('"\\ud800\\ud801"') == "\ud800\ud801"
