"""Bench-numbers block generator: rewrites the sentinel-marked block in
OPERATORS.md from the committed ``BENCH_DETAIL.json`` artifact, so the
doc's closing bench numbers can never drift from the artifact (the
stale-narrative class flagged in three consecutive verdicts).

Run: python -m sales_telegram_bot_data_pipeline_spark.bench_summary [operators_md]

tests/test_correctness_oracle.py::test_operators_md_bench_block_is_fresh
pins the block against the artifact, same pattern as REGISTRY.md.
"""

from __future__ import annotations

import json
import pathlib
import sys

BEGIN = "<!-- BENCH_NUMBERS:BEGIN (generated from BENCH_DETAIL.json; regenerate with `python -m sales_telegram_bot_data_pipeline_spark.bench_summary`, do not edit by hand) -->"
END = "<!-- BENCH_NUMBERS:END -->"

TOP_N = 8


def render_block(detail_path: pathlib.Path | None = None) -> str:
    """The generated block text (between, not including, the sentinels).

    Every number is read from ``BENCH_DETAIL.json`` — nothing here is
    hand-written prose."""
    root = pathlib.Path(__file__).resolve().parent.parent
    d = json.loads((detail_path or root / "BENCH_DETAIL.json").read_text())
    q = d["queries"]
    ns = d.get("n_samples", {})
    total = sum(q.values())
    n = len(q)
    multi = sum(1 for name in q if ns.get(name, 1) >= 2)
    over2 = [name for name, sec in q.items() if sec > 2.0]
    over2_multi = sum(1 for name in over2 if ns.get(name, 1) >= 2)
    top = sorted(q.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_N]
    top_txt = ", ".join(f"`{name}` {sec:.2f}" for name, sec in top)
    lines = [
        f"**Committed bench artifact** (`BENCH_DETAIL.json`): "
        f"**{total:.2f} s / {n} queries at sf{d['sf']}** "
        f"(recorded total {d['value']:.2f} s; mean {total / n:.3f} s/query; "
        f"{multi} rows carry min-of-2+ samples, "
        f"{over2_multi}/{len(over2)} of the >2 s rows). "
        f"Slowest rows: {top_txt}.",
    ]
    return "\n".join(lines)


def rewrite(md_path: pathlib.Path) -> bool:
    """Replace the sentinel block in *md_path*; returns True if changed."""
    text = md_path.read_text()
    try:
        head, rest = text.split(BEGIN, 1)
        _, tail = rest.split(END, 1)
    except ValueError as exc:  # pragma: no cover - doc structure broken
        raise SystemExit(
            f"{md_path}: sentinel markers not found — re-add\n{BEGIN}\n{END}"
        ) from exc
    new = head + BEGIN + "\n" + render_block() + "\n" + END + tail
    if new != text:
        md_path.write_text(new)
        return True
    return False


def main() -> None:
    root = pathlib.Path(__file__).resolve().parent.parent
    md = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else root / "OPERATORS.md"
    changed = rewrite(md)
    print(f"{'rewrote' if changed else 'unchanged'}: {md}")


if __name__ == "__main__":
    main()
