"""Round-10 second-batch pins: Gumbel MoM, tie-corrected Friedman,
bias-corrected Cramer's V, Katz power iterations, SAX motifs, MI/NMI,
and LOSO influence re-derived in pure Python at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from sales_telegram_bot_data_pipeline_spark import queries as q
from sales_telegram_bot_data_pipeline_spark.sources.tables import load_table

from conftest import SF_SMOKE

_GAMMA = 0.5772156649015329
_S6PI = 0.7796968012336761


def _daily_cents(spark):
    daily = defaultdict(int)
    for r in load_table(spark, SF_SMOKE, "orders").selectExpr(
        "datediff(to_date(o_orderdate), to_date('1970-01-01')) AS day",
        "date_format(to_date(o_orderdate), 'yyyy-MM') AS ym",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x",
    ).collect():
        daily[(r.ym, r.day)] += r.x
    return daily


def test_gumbel_matches_python(spark):
    row = q.REGISTRY["gumbel_block_maxima_fit"].fn(spark, SF_SMOKE).collect()[0]
    daily = _daily_cents(spark)
    blocks = defaultdict(int)
    for (ym, _), cents in daily.items():
        blocks[ym] = max(blocks[ym], cents)
    xs = list(blocks.values())
    n = len(xs)
    s1, s2 = sum(xs), sum(x * x for x in xs)
    mean = s1 / n / 100
    sd = math.sqrt((n * s2 - s1 * s1) / n / (n - 1)) / 100
    scale = sd * _S6PI
    loc = mean - _GAMMA * scale
    rl = loc - scale * math.log(-math.log(1 - 1 / 12))
    assert row.n_blocks == n
    assert abs(row.mean_block_max_dollars - round(mean, 2)) < 1e-6
    assert abs(row.gumbel_scale - scale) < 1e-4
    assert abs(row.gumbel_loc - loc) < 1e-4
    assert abs(row.return_level_12_blocks - rl) < 1e-4
    assert row.return_level_12_blocks > row.gumbel_loc


def test_friedman_matches_python(spark):
    rows = {r.event_type: r for r in q.REGISTRY["friedman_rank_test"].fn(spark, SF_SMOKE).collect()}
    cells = defaultdict(int)
    for r in load_table(spark, SF_SMOKE, "events").selectExpr(
        "to_date(ts) AS day", "event_type"
    ).collect():
        cells[(r.day, r.event_type)] += 1
    days = sorted({d for d, _ in cells})
    types = sorted({t for _, t in cells})
    k, n = len(types), len(days)
    r2sum = Counter()
    r2sq = 0
    for d in days:
        cnts = [(cells.get((d, t), 0), t) for t in types]
        for c, t in cnts:
            smaller = sum(1 for c2, _ in cnts if c2 < c)
            ties = sum(1 for c2, _ in cnts if c2 == c)
            r2 = 2 * (smaller + 1) + ties - 1  # 2x tie-averaged rank
            r2sum[t] += r2
            r2sq += r2 * r2
    num = sum((r2sum[t] - n * (k + 1)) ** 2 for t in types)
    den = r2sq - n * k * (k + 1) ** 2
    qstat = (k - 1) * num / den
    for t in types:
        r = rows[t]
        assert abs(r.mean_rank - r2sum[t] / 2 / n) < 1e-6
        assert (r.n_days, r.k_treatments) == (n, k)
        assert abs(r.friedman_chi2 - qstat) < 1e-5
        assert r.reject_equal_5pct == (1 if qstat > 9.488 else 0)


def test_cramers_v_matches_python(spark):
    row = q.REGISTRY["cramers_v_bias_corrected"].fn(spark, SF_SMOKE).collect()[0]
    cells = Counter()
    for r in load_table(spark, SF_SMOKE, "orders").select(
        "o_orderpriority", "o_orderstatus"
    ).collect():
        cells[(r.o_orderpriority, r.o_orderstatus)] += 1
    ra = Counter(); cb = Counter()
    for (a, b), c in cells.items():
        ra[a] += c
        cb[b] += c
    n = sum(cells.values())
    rr, cc = len(ra), len(cb)
    chi_nano = 0
    for a in ra:
        for b in cb:
            e = ra[a] * cb[b] / n
            o = cells.get((a, b), 0)
            chi_nano += math.floor((o - e) ** 2 / e * 1e9)
    chi2 = chi_nano / 1e9
    phi2 = chi2 / n
    v = math.sqrt(phi2 / (min(rr, cc) - 1))
    phi2c = max(0.0, phi2 - (rr - 1) * (cc - 1) / (n - 1))
    rc = rr - (rr - 1) ** 2 / (n - 1)
    ccc = cc - (cc - 1) ** 2 / (n - 1)
    vc = math.sqrt(phi2c / (min(rc, ccc) - 1))
    assert (row.n_orders, row.n_priorities, row.n_statuses) == (n, rr, cc)
    assert abs(row.chi_squared - chi2) < 1e-5
    assert abs(row.cramers_v - v) < 1e-6
    assert abs(row.cramers_v_corrected - vc) < 1e-6
    assert 0 <= row.cramers_v_corrected <= row.cramers_v + 1e-9


def test_katz_matches_python(spark):
    rows = q.REGISTRY["katz_centrality"].fn(spark, SF_SMOKE).collect()
    pairs = [
        (r.doc_a, r.doc_b)
        for r in q.REGISTRY["dedup_minhash_lsh"].fn(spark, SF_SMOKE).collect()
    ]
    nbr = defaultdict(list)
    for a, b in pairs:
        nbr[a].append(b)
        nbr[b].append(a)
    x = {v: 10**12 for v in nbr}
    for _ in range(6):
        x = {v: 10**12 + sum(x[u] for u in nbr[v]) // 10 for v in nbr}
    want = sorted(x.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r.doc_id, r.katz_centrality) for r in rows] == [
        (v, round(xv / 1e12, 6)) for v, xv in want
    ]


def test_sax_matches_python(spark):
    rows = q.REGISTRY["sax_daily_revenue_motifs"].fn(spark, SF_SMOKE).collect()
    daily = defaultdict(int)
    for (ym, day), cents in _daily_cents(spark).items():
        daily[day] += cents
    xs = list(daily.values())
    n = len(xs)
    s1, s2 = sum(xs), sum(v * v for v in xs)
    mean = s1 / n
    sd = math.sqrt((n * s2 - s1 * s1) / n / (n - 1))

    def sym(v):
        z = (v - mean) / sd
        return "a" if z < -0.6745 else ("b" if z < 0 else ("c" if z < 0.6745 else "d"))

    sax = {d: sym(v) for d, v in daily.items()}
    words = Counter(
        sax[d] + sax[d + 1] + sax[d + 2]
        for d in sax
        if d + 1 in sax and d + 2 in sax
    )
    got = {(r.motif, r.n_occurrences) for r in rows}
    assert got == set(words.items())
    # output ordering: count desc then motif
    ordered = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(r.motif, r.n_occurrences) for r in rows] == ordered


def test_mi_matches_python(spark):
    row = q.REGISTRY["mutual_information_source_lang"].fn(spark, SF_SMOKE).collect()[0]
    cells = Counter()
    for r in load_table(spark, SF_SMOKE, "documents").select("source", "lang").collect():
        cells[(r.source, r.lang)] += 1
    n = sum(cells.values())
    ms = Counter(); ml = Counter()
    for (s, l), c in cells.items():
        ms[s] += c
        ml[l] += c
    mi = sum(
        math.floor((c / n) * math.log(c * n / (ms[s] * ml[l])) * 1e9)
        for (s, l), c in cells.items()
    )
    hs = sum(math.floor(-(c / n) * math.log(c / n) * 1e9) for c in ms.values())
    hl = sum(math.floor(-(c / n) * math.log(c / n) * 1e9) for c in ml.values())
    assert row.n_docs == n
    assert abs(row.mi_nats - mi / 1e9) < 1e-6
    assert abs(row.h_source_nats - hs / 1e9) < 1e-6
    assert abs(row.h_lang_nats - hl / 1e9) < 1e-6
    assert abs(row.nmi - 2 * mi / (hs + hl)) < 1e-5
    assert 0 <= row.nmi <= 1.000001


def test_loso_matches_python(spark):
    rows = {r.source: r for r in q.REGISTRY["loso_source_influence"].fn(spark, SF_SMOKE).collect()}
    groups = defaultdict(list)
    for r in load_table(spark, SF_SMOKE, "documents").select("source", "n_chars").collect():
        groups[r.source].append(r.n_chars)
    n = sum(len(v) for v in groups.values())
    s = sum(sum(v) for v in groups.values())
    for src, vs in groups.items():
        r = rows[src]
        assert r.n_docs == len(vs)
        assert abs(r.mean_chars_source - sum(vs) / len(vs)) < 1e-5
        without = (s - sum(vs)) / (n - len(vs))
        assert abs(r.mean_chars_without - without) < 1e-5
        assert abs(r.delta_mean_chars - (s / n - without)) < 1e-5
    # influence sums to ~0 weighted by (n - n_g) -- sanity: deltas not all
    # the same sign unless one source dominates
    signs = {r.delta_mean_chars > 0 for r in rows.values()}
    assert len(rows) == len(groups)


def _hilbert_xy2d(n, x, y):
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_recurrence_is_a_true_hilbert_curve():
    """The unrolled SQL recurrence's Python twin must be a bijection on
    the grid with perfect step-1 Manhattan adjacency (the no-jump
    property that makes Hilbert beat Z-order)."""
    n = 16
    ds = {}
    for x in range(n):
        for y in range(n):
            ds[_hilbert_xy2d(n, x, y)] = (x, y)
    assert sorted(ds) == list(range(n * n))
    for i in range(n * n - 1):
        (x1, y1), (x2, y2) = ds[i], ds[i + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_fold_equals_unrolled_chain_full_grid(spark):
    """The Spark-side aggregate() fold (O(1) expression tree — the
    unrolled CTE chain collapses to a 2^bits-expanded projection under
    CollapseProject) must be bit-identical to the chain the DuckDB
    oracle still runs, over the ENTIRE 256x256 grid."""
    from sales_telegram_bot_data_pipeline_spark.operators.round10b import (
        _hilbert_fold_expr,
        _hilbert_steps_sql,
    )

    steps_sql, last = _hilbert_steps_sql(8)
    spark.sql(
        "SELECT CAST(id % 256 AS INT) AS bx, CAST(id DIV 256 AS INT) AS by "
        "FROM range(65536)"
    ).createOrReplaceTempView("hilb_grid_full")
    mismatches = spark.sql(
        f"""
WITH fold AS (SELECT bx, by, {_hilbert_fold_expr(8)} AS hd FROM hilb_grid_full),
h0 AS (SELECT bx, by, bx AS x, by AS y, CAST(0 AS BIGINT) AS d,
              CAST(bx AS BIGINT) AS okey, CAST(0 AS BIGINT) AS z
       FROM hilb_grid_full),
{steps_sql},
chain AS (SELECT bx, by, d AS hd FROM {last})
SELECT COUNT(*) AS n FROM fold f JOIN chain c
  ON f.bx = c.bx AND f.by = c.by AND f.hd <> c.hd
"""
    ).collect()[0]["n"]
    assert mismatches == 0


def test_hilbert_layout_audit_matches_python(spark):
    rows = {r.layout: r for r in q.REGISTRY["hilbert_layout_audit"].fn(spark, SF_SMOKE).collect()}
    orders = load_table(spark, SF_SMOKE, "orders").selectExpr(
        "o_orderkey AS okey", "o_custkey AS ck",
        "datediff(to_date(o_orderdate), to_date('1970-01-01')) AS day",
    ).collect()
    grid = 256
    mnc = min(r.ck for r in orders); mxc = max(r.ck for r in orders)
    mnd = min(r.day for r in orders); mxd = max(r.day for r in orders)
    pts = []
    for r in orders:
        bx = grid * (r.ck - mnc) // (mxc - mnc + 1)
        by = grid * (r.day - mnd) // (mxd - mnd + 1)
        zx = sum(((bx >> k) & 1) * 4**k for k in range(8))
        zy = sum(((by >> k) & 1) * 2 * 4**k for k in range(8))
        pts.append((r.okey, bx, by, zx + zy, _hilbert_xy2d(grid, bx, by)))
    file_rows = 1024
    for layout, key in (("custkey_1d", 1), ("zorder", 3), ("hilbert", 4)):
        order = sorted(pts, key=lambda p: (p[key], p[0]))
        files = defaultdict(list)
        for i, p in enumerate(order):
            files[i // file_rows].append(p)
        n_files = len(files)
        ax = sum(max(p[1] for p in f) - min(p[1] for p in f) + 1 for f in files.values()) / n_files
        ay = sum(max(p[2] for p in f) - min(p[2] for p in f) + 1 for f in files.values()) / n_files
        aa = sum(
            (max(p[1] for p in f) - min(p[1] for p in f) + 1)
            * (max(p[2] for p in f) - min(p[2] for p in f) + 1)
            for f in files.values()
        ) / n_files
        r = rows[layout]
        assert r.n_files == n_files
        assert abs(r.avg_x_span_frac - round(ax / grid, 6)) < 1e-6
        assert abs(r.avg_y_span_frac - round(ay / grid, 6)) < 1e-6
        assert abs(r.avg_file_area_frac - round(aa / grid / grid, 6)) < 1e-6


def test_bucketed_packing_matches_python(spark):
    import hashlib as _hashlib

    rows = {r.bucket: r for r in q.REGISTRY["bucketed_packing_plan"].fn(spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    n = len(docs)
    nshard = (n + 999) // 1000

    def bucket_of(t):
        for b in (16, 32, 64, 128, 256, 512, 1024):
            if t <= b:
                return b
        return 2048

    groups = defaultdict(list)  # (shard, bucket) -> [(doc_id, n_tok)]
    for r in docs:
        nt = len(r.text.split())
        h = int(_hashlib.md5(f"pack|{r.doc_id}".encode()).hexdigest()[:15], 16)
        groups[(h % nshard, bucket_of(nt))].append((r.doc_id, nt))
    per_bucket = defaultdict(lambda: [0, 0, 0])  # bucket -> [docs, bins, toks]
    for (shard, b), items in groups.items():
        items.sort()
        per_bin = 2048 // b
        nbins = (len(items) + per_bin - 1) // per_bin
        per_bucket[b][0] += len(items)
        per_bucket[b][1] += nbins
        per_bucket[b][2] += sum(t for _, t in items)
    assert set(rows) == set(per_bucket)
    for b, (nd, nb, toks) in per_bucket.items():
        r = rows[b]
        assert (r.n_docs, r.n_bins) == (nd, nb)
        assert abs(r.fill_frac_vs_cap - round(toks / (nb * 2048), 6)) < 1e-9
        assert abs(r.fill_frac_vs_bucket - round(toks / (nd * b), 6)) < 1e-9
    # boundary purity: fill vs bucket is high (docs near their bucket
    # size), fill vs cap reflects the padding the bucket granularity costs
    assert all(r.fill_frac_vs_bucket > 0.5 for r in rows.values())
