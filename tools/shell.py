"""Interactive SQL shell — the engine's analog of the reference's
REPL client (tools/local_client.py:23-52): reads ;-terminated
statements, executes them through AnalyticsEngine, pretty-prints.

    python tools/shell.py [--warehouse DIR] [--attach /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from andb_spark.api import AnalyticsEngine, EngineError  # noqa: E402


def _fmt(result) -> str:
    if not result.columns:
        return f"OK ({result.effect_rows} rows affected, {result.elapsed:.3f}s)"
    widths = [
        max(len(c), *(len(str(r[i])) for r in result.rows)) if result.rows else len(c)
        for i, c in enumerate(result.columns)
    ]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    lines = [sep]
    lines.append(
        "|" + "|".join(f" {c:<{w}} " for c, w in zip(result.columns, widths)) + "|"
    )
    lines.append(sep)
    for r in result.rows:
        lines.append(
            "|" + "|".join(f" {str(v):<{w}} " for v, w in zip(r, widths)) + "|"
        )
    lines.append(sep)
    lines.append(f"({len(result.rows)} rows, {result.elapsed:.3f}s)")
    if getattr(result, "warning", None):
        # e.g. the andb.max_result_rows truncation notice — a user must
        # never mistake a capped result for a complete one
        lines.append(f"WARNING: {result.warning}")
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", default=os.path.expanduser("~/.andb_spark/warehouse"))
    ap.add_argument("--attach", default=None, help="dir of parquet tables to attach read-only")
    ap.add_argument("-c", "--command", default=None, help="run one statement and exit")
    args = ap.parse_args()

    engine = AnalyticsEngine(args.warehouse, attach_dir=args.attach)
    if args.command:
        try:
            print(_fmt(engine.execute(args.command)))
        except EngineError as e:
            print(f"ERROR: {e}")
            raise SystemExit(1)
        return

    print("andb_spark shell — ;-terminated statements, \\q to quit")
    buf = ""
    while True:
        try:
            line = input("... " if buf else "sql> ")
        except EOFError:
            break
        if line.strip() in ("\\q", "exit", "quit"):
            break
        buf += " " + line
        if buf.rstrip().endswith(";"):
            stmt, buf = buf, ""
            try:
                print(_fmt(engine.execute(stmt)))
            except EngineError as e:
                print(f"ERROR: {e}")


if __name__ == "__main__":
    main()
