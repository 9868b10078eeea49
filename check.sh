#!/usr/bin/env bash
# Static-analysis gate — the analog of the reference's lint gate
# (/root/reference/clippy_check.sh:1-4: `cargo clippy --all -- -D
# warnings`).  Warnings are errors: any finding fails the run.
#
# This image ships no Python linters and installs are disallowed, so
# the checks are stdlib-built:
#   1. byte-compile every source (syntax gate), and
#   2. tools/lint.py — an ast+symtable checker for undefined names,
#      unused imports, duplicate defs/keys, assert-on-tuple,
#      `is`-vs-literal, and mutable default arguments
#      (mutation-tested; see tests/test_lint_tool.py).
#
# Usage: ./check.sh   (from anywhere)
set -eu
cd "$(dirname "$0")"

echo "== compileall (syntax gate)" >&2
python -m compileall -q helix_tpu tests benchmarks tools \
    bench.py __graft_entry__.py

echo "== tools/lint.py (-D warnings)" >&2
python tools/lint.py

echo "check.sh: all gates clean" >&2
