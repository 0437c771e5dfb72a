"""CLI: repair malformed JSON files.

    python -m json_remedy_ray FILE            # repair whole file -> stdout
    python -m json_remedy_ray --stream FILE   # NDJSON: repair per line
    python -m json_remedy_ray --debug FILE    # per-phase diagnostics
    echo '{bad json}' | python -m json_remedy_ray -

Exit code 0 on success, 1 if any document failed.
(Reference CLI-ish surface: from_file/repair_to_string,
lib/json_remedy.ex:152-187.)
"""

from __future__ import annotations

import argparse
import json
import sys

from json_remedy_ray.config import RepairConfig
from json_remedy_ray.repair.pipeline import repair


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="json_remedy_ray", description="Repair malformed JSON")
    ap.add_argument("file", help="input file, or - for stdin")
    ap.add_argument("--stream", action="store_true", help="treat input as one document per line")
    ap.add_argument("--debug", action="store_true", help="print per-phase diagnostics to stderr")
    ap.add_argument("--strict", action="store_true", help="strict mode: no repairs, validate only")
    ap.add_argument("--indent", type=int, default=None, help="pretty-print with N-space indent")
    args = ap.parse_args(argv)

    cfg = RepairConfig(strict_mode=args.strict)
    if args.file == "-":
        text = sys.stdin.read()
    else:
        try:
            with open(args.file, encoding="utf-8", errors="replace") as f:
                text = f.read()
        except OSError as e:
            print(f"error: cannot read {args.file}: {e}", file=sys.stderr)
            return 2

    def emit(res) -> bool:
        if not res.ok:
            print(f"error: {res.error}", file=sys.stderr)
            return False
        out = res.repaired_json
        if args.indent is not None:
            out = json.dumps(res.value, sort_keys=True, indent=args.indent, ensure_ascii=False)
        print(out)
        return True

    ok = True
    if args.stream:
        for line in text.splitlines():
            if line.strip():
                ok &= emit(repair(line, cfg))
    else:
        if args.debug:
            from json_remedy_ray.repair.debug import repair_with_debug

            d = repair_with_debug(text, cfg)
            for step in d["steps"]:
                print(f"  {step['layer']}: {step.get('us', 0)} us", file=sys.stderr)
        ok = emit(repair(text, cfg))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
