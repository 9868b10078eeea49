"""CLI for the SDK-generator extractors.

    python -m tests.parity.extract rust            # diff vs committed corpus
    python -m tests.parity.extract all             # all three languages
    python -m tests.parity.extract ts --emit out/  # write extracted JSON

Exit code 1 when any language diverges from the committed corpus.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

from . import extract_and_diff

ALIASES = {"ts": "typescript", "golang": "go"}
LANGS = ("rust", "typescript", "go")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m tests.parity.extract")
    ap.add_argument("language", choices=[*LANGS, *ALIASES, "all"])
    ap.add_argument("--emit", default=None,
                    help="directory to write the extracted fixture JSON to")
    args = ap.parse_args(argv)
    langs = LANGS if args.language == "all" else (
        ALIASES.get(args.language, args.language),
    )

    failed = False
    for lang in langs:
        n, problems = extract_and_diff(lang)
        status = "OK" if not problems else f"{len(problems)} DIFFS"
        print(f"{lang}: {n} fixtures extracted — {status}")
        for p in problems[:20]:
            print(f"  {p}")
        failed |= bool(problems)
        if args.emit:
            from .shims import FixtureSink

            sink = FixtureSink()
            sdks = Path(__file__).resolve().parents[3] / "sdks"
            if lang == "rust":
                from . import rustfe as fe

                src = (sdks / "rust/examples/generate_parity_fixtures.rs")
            elif lang == "typescript":
                from . import tsfe as fe

                src = (sdks / "typescript/scripts/generate-fixtures.ts")
            else:
                from . import gofe as fe

                src = (sdks / "go/cmd/generate-parity-fixtures/main.go")
            fe.extract(src.read_text(), sink)
            for (bucket, name), body in sink.corpus.items():
                out = Path(args.emit) / lang / bucket
                out.mkdir(parents=True, exist_ok=True)
                (out / f"{name}.json").write_text(
                    json.dumps(json.loads(json.dumps(body)), indent=1) + "\n"
                )
            print(f"  wrote {len(sink.corpus)} fixtures under "
                  f"{args.emit}/{lang}/")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
