"""Bench-numbers block generator: rewrites the sentinel-marked block in
OPERATORS.md from the committed ``BENCH_DETAIL.json`` artifact, so the
doc's closing bench numbers can never drift from the artifact (the
stale-narrative class flagged in three consecutive verdicts).

The block also carries the CROSS-ROUND comparison (verdict r11 task 4):
it diffs the current artifact against the newest *differing* committed
version of ``BENCH_DETAIL.json`` in git history, so the "vs last round"
numbers are generated too — hand-written delta prose quotes no totals
(pinned by ``test_operators_md_no_totals_outside_block``).

Run: python -m sales_telegram_bot_data_pipeline_spark.bench_summary [operators_md]

tests/test_correctness_oracle.py::test_operators_md_bench_block_is_fresh
pins the block against the artifact, same pattern as REGISTRY.md.
"""

from __future__ import annotations

import json
import pathlib
import statistics
import subprocess
import sys

BEGIN = "<!-- BENCH_NUMBERS:BEGIN (generated from BENCH_DETAIL.json; regenerate with `python -m sales_telegram_bot_data_pipeline_spark.bench_summary`, do not edit by hand) -->"
END = "<!-- BENCH_NUMBERS:END -->"

TOP_N = 8


def _previous_committed(detail_path: pathlib.Path, current_text: str):
    """Newest committed version of the artifact whose CONTENT differs from
    *current_text* — the stable cross-round baseline (walking past
    identical blobs makes the result invariant to committing the current
    artifact: before and after the commit, the chosen baseline is the
    same).  Returns (short_hash, parsed_json) or None when git is
    unavailable or no differing version exists."""
    try:
        # --abbrev pinned: the default %h width grows with the repo, which
        # would silently change the rendered hash and break block equality
        # (ADVICE r12)
        commits = subprocess.run(
            ["git", "log", "--format=%h", "--abbrev=10", "--", detail_path.name],
            cwd=detail_path.parent, capture_output=True, text=True, check=True,
        ).stdout.split()
        for c in commits:
            blob = subprocess.run(
                ["git", "show", f"{c}:{detail_path.name}"],
                cwd=detail_path.parent, capture_output=True, text=True,
                check=True,
            ).stdout
            if blob != current_text:
                return c, json.loads(blob)
    except Exception:
        return None
    return None


def render_block(detail_path: pathlib.Path | None = None) -> str:
    """The generated block text (between, not including, the sentinels).

    Every number is read from ``BENCH_DETAIL.json`` (or its committed
    predecessor, for the comparison line) — nothing here is hand-written
    prose."""
    root = pathlib.Path(__file__).resolve().parent.parent
    detail_path = detail_path or root / "BENCH_DETAIL.json"
    text = detail_path.read_text()
    d = json.loads(text)
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
    if "deadline_hit" in d:
        if d["deadline_hit"]:
            unfinished = ", ".join(d.get("protocol_unfinished", [])) or "?"
            lines.append(
                f"**Deadline hit: the sampling protocol did NOT finish** "
                f"(unfinished: {unfinished}; "
                f"{len(d.get('fallback', []))} warm-time fallback rows) — "
                f"treat the total as a contention-inflated upper bound."
            )
        else:
            lines.append(
                "Sampling protocol complete (deadline_hit: false — "
                "steady pass-1 coverage on every row, min-of-2 on every "
                ">2 s row)."
            )
    prev = _previous_committed(detail_path, text)
    if prev is not None:
        c, p = prev
        pq = p.get("queries", {})
        common = sorted(set(q) & set(pq))
        ratios = [q[k] / pq[k] for k in common if pq[k] > 0]
        if common and ratios:
            cur_c = sum(q[k] for k in common)
            prev_c = sum(pq[k] for k in common)
            med = statistics.median(ratios)
            lines.append(
                f"Vs previous committed artifact ({c}: "
                f"{sum(pq.values()):.2f} s / {len(pq)} queries, "
                f"{len(p.get('fallback', []))} fallback rows): "
                f"on the {len(common)} common queries "
                f"{prev_c:.2f} → {cur_c:.2f} s "
                f"(ratio {cur_c / prev_c:.2f}, median per-query ratio "
                f"{med:.2f})."
            )
    return "\n".join(lines)


def rewrite(md_path: pathlib.Path, detail_path: pathlib.Path | None = None) -> bool:
    """Replace the sentinel block in *md_path*; returns True if changed.

    Raises ValueError (NOT SystemExit — bench.py's best-effort resync
    catches Exception; ADVICE r11) when the sentinels are missing."""
    text = md_path.read_text()
    try:
        head, rest = text.split(BEGIN, 1)
        _, tail = rest.split(END, 1)
    except ValueError as exc:
        raise ValueError(
            f"{md_path}: sentinel markers not found — re-add\n{BEGIN}\n{END}"
        ) from exc
    new = head + BEGIN + "\n" + render_block(detail_path) + "\n" + END + tail
    if new != text:
        md_path.write_text(new)
        return True
    return False


def main() -> None:
    root = pathlib.Path(__file__).resolve().parent.parent
    md = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else root / "OPERATORS.md"
    try:
        changed = rewrite(md)
    except ValueError as exc:
        print(str(exc), file=sys.stderr)
        raise SystemExit(2)
    print(f"{'rewrote' if changed else 'unchanged'}: {md}")


if __name__ == "__main__":
    main()
