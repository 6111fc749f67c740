"""Definition-level checks for the robust-stats (X113-X116) and LM-corpus
(X117-X123) queries: independent Python brute force at sf0.001, so the
semantics are validated against the textbook DEFINITION, not just the
(same-shaped) DuckDB oracle the parity mirror uses."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from seng550_a3_etl_spark.suite import QUERIES
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text", "source", "n_chars")
        .collect()
    )


def _ctoks(text: str) -> list[str]:
    return [t for t in text.split() if t]


def test_ewma_matches_definition(spark):
    """EWMA per (priority, day) == Σ w_k·rev_{t-k} / Σ w_k over the
    trailing 7 OBSERVED days, decay 0.5 — brute-forced from the raw
    orders table."""
    orders = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderpriority", "o_orderdate", "o_totalprice")
        .collect()
    )
    daily: dict[tuple[str, object], int] = {}
    for r in orders:
        d = r.o_orderdate.date()
        key = (r.o_orderpriority, d)
        daily[key] = daily.get(key, 0) + round(r.o_totalprice * 100)
    expect = {}
    for (pri, d), cents in daily.items():
        num = den = 0.0
        for k in range(7):
            prev = (pri, d - __import__("datetime").timedelta(days=k))
            if prev in daily:
                w = 0.5 ** k
                num += daily[prev] * w
                den += w
        expect[(pri, d.isoformat())] = (cents, round(num / den, 4))
    got = {
        (r.o_orderpriority, r.day): (r.day_cents, r.ewma_cents)
        for r in QUERIES["ewma_daily_revenue"](spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_session_concurrency_brute_force(spark):
    """Peak per day == the maximum, over all session-segment start
    points that day, of how many segments cover that point (intervals
    closed on both ends) — checked without any sweep machinery."""
    sess = [
        (r.session_start, r.session_end)
        for r in QUERIES["user_sessions"](spark, SF_SMOKE).collect()
    ]
    # Parse the formatted strings back; split at midnight like the query.
    from datetime import datetime, time, timedelta

    fmt = "%Y-%m-%d %H:%M:%S.%f"
    segs: list[tuple[object, datetime, datetime]] = []
    for s, e in sess:
        start, end = datetime.strptime(s, fmt), datetime.strptime(e, fmt)
        d = start.date()
        while d <= end.date():
            lo = max(start, datetime.combine(d, time.min))
            hi = min(
                end,
                datetime.combine(d + timedelta(days=1), time.min)
                - timedelta(microseconds=1),
            )
            segs.append((d, lo, hi))
            d += timedelta(days=1)
    by_day: dict[object, list[tuple[datetime, datetime]]] = {}
    for d, lo, hi in segs:
        by_day.setdefault(d, []).append((lo, hi))
    expect = {}
    for d, iv in by_day.items():
        peak = max(
            sum(1 for lo2, hi2 in iv if lo2 <= lo <= hi2)
            for lo, _ in iv
        )
        expect[d.isoformat()] = (peak, len(iv))
    got = {
        r.day: (r.peak_concurrency, r.n_session_segments)
        for r in QUERIES["session_concurrency"](
            spark, SF_SMOKE
        ).collect()
    }
    assert got == expect


def test_mad_is_rank_picked_median(spark):
    """median_cents / mad_cents are the ceil(n/2)-th order statistics of
    the cents and |dev| sequences; outlier count matches the
    definitional filter."""
    orders = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    groups: dict[str, list[int]] = {}
    for r in orders:
        groups.setdefault(r.o_orderpriority, []).append(
            round(r.o_totalprice * 100)
        )
    got = {
        r.o_orderpriority: r
        for r in QUERIES["price_mad_outliers"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(groups)
    for pri, cents in groups.items():
        n = len(cents)
        med = sorted(cents)[math.ceil(n * 0.5) - 1]
        devs = sorted(abs(c - med) for c in cents)
        mad = devs[math.ceil(n * 0.5) - 1]
        n_out = sum(1 for c in cents if abs(c - med) > 4.4478 * mad)
        r = got[pri]
        assert (r.n_orders, r.median_cents, r.mad_cents, r.n_outliers) == (
            n,
            med,
            mad,
            n_out,
        )


def test_winsorized_stats_brute_force(spark):
    items = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_returnflag", "l_extendedprice")
        .collect()
    )
    groups: dict[str, list[int]] = {}
    for r in items:
        groups.setdefault(r.l_returnflag, []).append(
            round(r.l_extendedprice * 100)
        )
    got = {
        r.l_returnflag: r
        for r in QUERIES["winsorized_price_stats"](
            spark, SF_SMOKE
        ).collect()
    }
    for flag, cents in groups.items():
        n = len(cents)
        s = sorted(cents)
        lo, hi = s[math.ceil(n * 0.05) - 1], s[math.ceil(n * 0.95) - 1]
        w = [min(max(c, lo), hi) for c in cents]
        mean = sum(w) / n
        var = sum((x - mean) ** 2 for x in w) / (n - 1)
        r = got[flag]
        assert r.n_clamped_lo == sum(1 for c in cents if c < lo)
        assert r.n_clamped_hi == sum(1 for c in cents if c > hi)
        assert r.winsor_mean == pytest.approx(mean / 100, abs=1e-3)
        assert r.winsor_std == pytest.approx(
            math.sqrt(var) / 100, abs=1e-3
        )


def test_entropy_matches_definition(spark, docs):
    freq: dict[str, Counter] = {}
    for r in docs:
        freq.setdefault(r.source, Counter()).update(_ctoks(r.text))
    got = {
        r.source: r
        for r in QUERIES["source_token_entropy"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(got) == set(freq)
    for src, c in freq.items():
        n = sum(c.values())
        h = -sum((v / n) * math.log2(v / n) for v in c.values())
        r = got[src]
        assert (r.n_tokens, r.vocab) == (n, len(c))
        assert r.entropy_bits == pytest.approx(h, abs=1e-3)
        assert r.norm_entropy == pytest.approx(
            h / math.log2(len(c)), abs=1e-3
        )


def test_coverage_curve_monotone_and_exact(spark, docs):
    c = Counter()
    for r in docs:
        c.update(_ctoks(r.text))
    total = sum(c.values())
    by_freq = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    rows = sorted(
        QUERIES["vocab_coverage_curve"](spark, SF_SMOKE).collect(),
        key=lambda r: r.k,
    )
    prev = 0.0
    for r in rows:
        k = min(r.k, len(by_freq))
        cov = sum(v for _, v in by_freq[:k]) / total
        assert r.topk_vocab == k
        assert r.coverage == pytest.approx(cov, abs=1e-5)
        assert r.coverage >= prev
        prev = r.coverage
    assert rows[-1].coverage == pytest.approx(1.0)


def test_bm25_matches_reference_implementation(spark, docs):
    terms, k1, b = ("spark", "join", "vector"), 1.2, 0.75
    toks = {r.doc_id: _ctoks(r.text) for r in docs}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {
        q: sum(1 for t in toks.values() if q in t) for q in terms
    }
    scores = {}
    for d, t in toks.items():
        s = 0.0
        for q in terms:
            tf = t.count(q)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(t) / avgdl)
            )
        if s > 0:
            scores[d] = s
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = QUERIES["bm25_doc_scores"](spark, SF_SMOKE).collect()
    assert [r.doc_id for r in got] == [d for d, _ in top]
    for r, (_, s) in zip(got, top):
        assert r.bm25 == pytest.approx(s, abs=1e-3)


def test_bigram_lm_probabilities_normalize(spark, docs):
    """For any emitted head: every pair count matches brute force, and
    the smoothed distribution over the FULL vocab sums to 1 (the
    property add-k smoothing exists to guarantee)."""
    bigrams = Counter()
    vocab = set()
    for r in docs:
        t = _ctoks(r.text)
        vocab.update(t)
        bigrams.update(zip(t, t[1:]))
    v = len(vocab)
    rows = QUERIES["bigram_lm_probs"](spark, SF_SMOKE).collect()
    heads = {}
    for r in rows:
        assert bigrams[(r.head, r.next_tok)] == r.pair_count
        heads.setdefault(r.head, []).append(r)
    for head, rs in heads.items():
        ch = sum(c for (h, _), c in bigrams.items() if h == head)
        mass = sum(
            (bigrams.get((head, w), 0) + 0.5) / (ch + 0.5 * v)
            for w in vocab
        )
        assert mass == pytest.approx(1.0, abs=1e-9)
        for r in rs:
            logp = math.log(
                (r.pair_count + 0.5) / (ch + 0.5 * v)
            )
            assert r.logp == pytest.approx(logp, abs=1e-3)


def test_bpe_pair_counts(spark, docs):
    words = Counter()
    for r in docs:
        words.update(_ctoks(r.text))
    pairs = Counter()
    for w, wc in words.items():
        for a, b2 in zip(w, w[1:]):
            pairs[(a, b2)] += wc
    top = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = QUERIES["bpe_merge_candidates"](spark, SF_SMOKE).collect()
    assert [
        ((r.left_ch, r.right_ch), r.pair_count) for r in got
    ] == top


def test_gini_matches_mean_absolute_difference(spark, docs):
    """The sorted closed form equals the definitional Gini
    G = Σᵢⱼ|xᵢ-xⱼ| / (2n²·mean) — the O(n²) definition the distributed
    query exists to avoid."""
    by_src: dict[str, list[int]] = {}
    for r in docs:
        by_src.setdefault(r.source, []).append(r.n_chars)
    got = {
        r.source: r
        for r in QUERIES["doc_length_gini"](spark, SF_SMOKE).collect()
    }
    for src, xs in by_src.items():
        n = len(xs)
        mad = sum(abs(a - b) for a in xs for b in xs)
        gini = mad / (2 * n * n * (sum(xs) / n))
        r = got[src]
        assert (r.n_docs, r.total_chars) == (n, sum(xs))
        assert r.gini == pytest.approx(gini, abs=1e-5)


def test_containment_superset_and_definition(spark, docs):
    """Containment pairs ⊇ Jaccard pairs at the same threshold, and
    every emitted containment matches the set-theoretic definition
    computed from raw shingle sets."""
    def sets3(text):
        t = text.split()  # unfiltered, mirroring the suite tokenizer
        return {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}

    sh = {r.doc_id: sets3(r.text) for r in docs}
    sh = {d: s for d, s in sh.items() if s}
    expect = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            if inter and max(inter / len(sh[a]), inter / len(sh[b])) >= 0.8:
                expect[(a, b)] = (inter, len(sh[a]), len(sh[b]))
    got = {
        (r.doc_a, r.doc_b): (r.inter, r.size_a, r.size_b)
        for r in QUERIES["doc_containment_pairs"](
            spark, SF_SMOKE
        ).collect()
    }
    assert got == expect
    jac = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["ngram_dup_pairs"](spark, SF_SMOKE).collect()
    }
    assert jac <= set(got)


def test_lang_source_mi_definition(spark):
    meta = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("lang", "source")
        .collect()
    )
    joint = Counter((r.lang, r.source) for r in meta)
    n = sum(joint.values())
    cl = Counter()
    cs = Counter()
    for (la, so), c in joint.items():
        cl[la] += c
        cs[so] += c
    mi = sum(
        c / n * math.log2(c * n / (cl[la] * cs[so]))
        for (la, so), c in joint.items()
    )
    h_lang = -sum(c / n * math.log2(c / n) for c in cl.values())
    r = QUERIES["lang_source_mi"](spark, SF_SMOKE).collect()[0]
    assert r.n_docs == n
    assert r.mi_bits == pytest.approx(mi, abs=1e-3)
    assert r.uncertainty_coeff == pytest.approx(mi / h_lang, abs=1e-3)
    assert 0 <= r.mi_bits  # MI is non-negative by Gibbs' inequality


def test_interpolation_contract(spark):
    """Observed days keep their value; interior gap days sit on the
    straight line between neighbors; leading/trailing gaps stay NULL;
    the day spine is complete per type."""
    rows = QUERIES["interpolate_daily_series"](spark, SF_SMOKE).collect()
    from datetime import date

    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for series in by_type.values():
        series.sort(key=lambda r: r.day)
        days = [date.fromisoformat(r.day) for r in series]
        assert all(
            (b - a).days == 1 for a, b in zip(days, days[1:])
        ), "spine has holes"
        obs = [
            (i, r.day_value)
            for i, r in enumerate(series)
            if not r.is_gap
        ]
        for i, r in enumerate(series):
            if not r.is_gap:
                assert r.interp_value == pytest.approx(r.day_value)
                continue
            prev = max(((j, v) for j, v in obs if j < i), default=None)
            nxt = min(((j, v) for j, v in obs if j > i), default=None)
            if prev is None or nxt is None:
                assert r.interp_value is None
            else:
                (jp, vp), (jn, vn) = prev, nxt
                want = vp + (vn - vp) * (i - jp) / (jn - jp)
                assert r.interp_value == pytest.approx(want, abs=1e-3)


def test_dup_threshold_sweep_consistency(spark):
    """The sweep's n_pairs at t=0.8 equals |ngram_dup_pairs|, counts
    are monotone non-increasing in t, and droppable docs are bounded
    by pair count."""
    rows = {
        r.threshold: r
        for r in QUERIES["dup_threshold_sweep"](spark, SF_SMOKE).collect()
    }
    n_08 = QUERIES["ngram_dup_pairs"](spark, SF_SMOKE).count()
    assert rows[0.8].n_pairs == n_08
    ts = sorted(rows)
    for a, b in zip(ts, ts[1:]):
        assert rows[a].n_pairs >= rows[b].n_pairs
        assert rows[a].n_docs_droppable >= rows[b].n_docs_droppable
    for r in rows.values():
        assert r.n_docs_droppable <= r.n_pairs


def test_weekday_chisq_definition(spark):
    from datetime import date

    orders = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderdate")
        .collect()
    )
    obs = Counter(
        ((r.o_orderdate.date() - date(1970, 1, 1)).days + 4) % 7
        for r in orders
    )
    # sanity: the integer formula really is "0 = Sunday"
    assert (date(2026, 8, 9) - date(1970, 1, 1)).days % 7 == 3  # Sun + 4 ≡ 0
    n = sum(obs.values())
    exp = n / 7
    got = {
        r.dow: r for r in QUERIES["weekday_chisq"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(obs)
    for dow, c in obs.items():
        r = got[dow]
        assert r.n_orders == c
        assert r.expected == pytest.approx(exp, abs=1e-3)
        assert r.chisq_term == pytest.approx(
            (c - exp) ** 2 / exp, abs=1e-3
        )


def test_token_pmi_matches_definition(spark, docs):
    window, min_c = 4, 5
    pairs = Counter()
    uni = Counter()
    for r in docs:
        t = _ctoks(r.text)
        uni.update(t)
        for i, a in enumerate(t):
            for b in t[i + 1 : i + 1 + window]:
                pairs[tuple(sorted((a, b)))] += 1
    n = sum(uni.values())
    p = sum(pairs.values())
    cand = {
        k: c / p / ((uni[k[0]] / n) * (uni[k[1]] / n))
        for k, c in pairs.items()
        if c >= min_c
    }
    top = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = QUERIES["token_pmi_pairs"](spark, SF_SMOKE).collect()
    assert [(r.tok_a, r.tok_b) for r in got] == [k for k, _ in top]
    for r, (k, ratio) in zip(got, top):
        assert r.c_ab == pairs[k]
        assert r.pmi == pytest.approx(math.log2(ratio), abs=1e-3)


def test_kanon_census_brute_force(spark):
    cust = (
        spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
        .select("c_nationkey", "c_mktsegment", "c_acctbal")
        .collect()
    )
    classes = Counter(
        (r.c_nationkey, r.c_mktsegment, math.floor(r.c_acctbal / 1000))
        for r in cust
    )
    hist = Counter(classes.values())
    got = {
        r.class_size: r
        for r in QUERIES["quasi_id_kanon"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(hist)
    for size, n_classes in hist.items():
        r = got[size]
        assert r.n_classes == n_classes
        assert r.n_rows == size * n_classes
        assert r.below_k == (size < 5)
    # every customer row is accounted for exactly once
    assert sum(r.n_rows for r in got.values()) == len(cust)


def test_benford_census_brute_force(spark):
    orders = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_totalprice")
        .collect()
    )
    obs = Counter(
        int(str(round(r.o_totalprice * 100))[0])
        for r in orders
        if r.o_totalprice > 0
    )
    n = sum(obs.values())
    got = {
        r.digit: r
        for r in QUERIES["benford_digit_census"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(obs)
    for d, c in obs.items():
        r = got[d]
        exp = n * math.log10(1 + 1 / d)
        assert r.n_orders == c
        assert r.benford_frac == pytest.approx(
            math.log10(1 + 1 / d), abs=1e-5
        )
        assert r.chisq_term == pytest.approx((c - exp) ** 2 / exp, abs=1e-3)


def test_welch_ttest_brute_force(spark):
    import statistics

    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_type", "value")
        .collect()
    )
    a = [
        round(r.value * 1e6) / 1e6
        for r in ev
        if r.event_type == "click" and r.value is not None
    ]
    b = [
        round(r.value * 1e6) / 1e6
        for r in ev
        if r.event_type == "purchase" and r.value is not None
    ]
    ma, mb = statistics.fmean(a), statistics.fmean(b)
    va, vb = statistics.variance(a) / len(a), statistics.variance(b) / len(b)
    t = (ma - mb) / math.sqrt(va + vb)
    dof = (va + vb) ** 2 / (
        va**2 / (len(a) - 1) + vb**2 / (len(b) - 1)
    )
    r = QUERIES["ab_welch_ttest"](spark, SF_SMOKE).collect()[0]
    assert (r.n_a, r.n_b) == (len(a), len(b))
    assert r.mean_diff == pytest.approx(ma - mb, abs=1e-3)
    assert r.t_stat == pytest.approx(t, abs=1e-2)
    assert r.welch_dof == pytest.approx(dof, rel=1e-3)


def test_ks_drift_brute_force(spark, docs):
    a = sorted(r.n_chars for r in docs if r.source == "src0")
    b = sorted(r.n_chars for r in docs if r.source == "src1")

    def cdf(xs, v):
        import bisect

        return bisect.bisect_right(xs, v) / len(xs)

    grid = sorted(set(a) | set(b))
    d = max(abs(cdf(a, v) - cdf(b, v)) for v in grid)
    crit = 1.358 * math.sqrt((len(a) + len(b)) / (len(a) * len(b)))
    r = QUERIES["length_ks_drift"](spark, SF_SMOKE).collect()[0]
    assert (r.n_a, r.n_b) == (len(a), len(b))
    assert r.ks_stat == pytest.approx(d, abs=1e-5)
    assert r.reject_h0 == (d > crit)


def test_multi_touch_attribution_brute_force(spark):
    from datetime import timedelta

    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_id", "user_id", "event_type", "ts")
        .collect()
    )
    clicks = sorted(
        (r for r in ev if r.event_type == "click"),
        key=lambda r: (r.ts, r.event_id),
    )
    purchases = [r for r in ev if r.event_type == "purchase"]
    credit: dict[tuple[str, str], float] = {}
    touches: dict[tuple[str, str], int] = {}

    def add(model, day, c, touched):
        k = (model, day)
        credit[k] = credit.get(k, 0.0) + c
        touches[k] = touches.get(k, 0) + (1 if touched else 0)

    for pr in purchases:
        win = [
            c
            for c in clicks
            if c.user_id == pr.user_id
            and c.ts < pr.ts
            and c.ts >= pr.ts - timedelta(hours=1)
        ]
        if not win:
            continue
        for i, c in enumerate(win):
            day = c.ts.date().isoformat()
            add("first_touch", day, 1.0 if i == 0 else 0.0, i == 0)
            add(
                "last_touch",
                day,
                1.0 if i == len(win) - 1 else 0.0,
                i == len(win) - 1,
            )
            add("linear", day, 1.0 / len(win), True)
    got = {
        (r.model, r.click_day): (r.credited_conversions, r.n_credited_touches)
        for r in QUERIES["multi_touch_attribution"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(got) == set(credit)
    for k, c in credit.items():
        assert got[k][0] == pytest.approx(c, abs=1e-3), k
        assert got[k][1] == touches[k], k
    # credit conservation: every model distributes exactly one unit per
    # attributed purchase, so the three totals are equal.
    tot = {}
    for (model, _), (c, _n) in got.items():
        tot[model] = tot.get(model, 0.0) + c
    vals = list(tot.values())
    assert vals[0] == pytest.approx(vals[1], abs=1e-2)
    assert vals[1] == pytest.approx(vals[2], abs=1e-2)


def test_bootstrap_ci_brute_force(spark):
    import hashlib

    orders = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderkey", "o_totalprice")
        .collect()
    )
    rows = [
        (
            int(
                hashlib.md5(str(r.o_orderkey).encode()).hexdigest()[:15], 16
            ),
            round(r.o_totalprice * 100),
        )
        for r in orders
    ]
    means = sorted(
        sum(c for h, c in rows if not (h >> b) & 1)
        / sum(1 for h, c in rows if not (h >> b) & 1)
        for b in range(32)
    )
    grand = sum(c for _, c in rows) / len(rows)
    r = QUERIES["bootstrap_mean_ci"](spark, SF_SMOKE).collect()[0]
    assert (r.n_rows, r.n_replicas) == (len(rows), 32)
    assert r.grand_mean == pytest.approx(grand / 100, abs=1e-3)
    assert r.ci_lo == pytest.approx(means[1] / 100, abs=1e-3)
    assert r.ci_hi == pytest.approx(means[30] / 100, abs=1e-3)
    assert r.ci_lo <= r.grand_mean <= r.ci_hi


def test_seasonal_decompose_identity_and_trend(spark):
    """trend+seasonal+remainder == day value wherever trend exists;
    trend is the exact centered 7-day mean; seasonal means come from
    the detrended series."""
    from datetime import timedelta

    orders = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    daily: dict[object, int] = {}
    for r in orders:
        d = r.o_orderdate.date()
        daily[d] = daily.get(d, 0) + round(r.o_totalprice * 100)
    got = {
        r.day: r
        for r in QUERIES["seasonal_decompose_daily"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(got) == {d.isoformat() for d in daily}
    for d, x in daily.items():
        r = got[d.isoformat()]
        assert r.day_cents == x
        win = [
            daily.get(d + timedelta(days=k)) for k in range(-3, 4)
        ]
        if any(v is None for v in win):
            assert r.trend is None and r.remainder is None
        else:
            assert r.trend == pytest.approx(sum(win) / 7, abs=1e-3)
            if r.seasonal is not None:
                assert (
                    r.trend + r.seasonal + r.remainder
                    == pytest.approx(x, abs=1e-2)
                )


def test_cusum_changepoint_brute_force(spark):
    orders = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    daily: dict[object, int] = {}
    for r in orders:
        d = r.o_orderdate.date()
        daily[d] = daily.get(d, 0) + round(r.o_totalprice * 100)
    days = sorted(daily)
    xs = [daily[d] for d in days]
    n, sx = len(xs), sum(xs)
    best = None
    run = 0
    for t, (d, x) in enumerate(zip(days, xs), start=1):
        run += x
        c = run * n - t * sx
        key = (abs(c), -t)  # argmax |c|, earliest day wins ties
        if best is None or key > best[0]:
            best = (key, d, t, c, run)
    _, d, t, c, run = best
    r = QUERIES["revenue_cusum_changepoint"](spark, SF_SMOKE).collect()[0]
    assert r.changepoint_day == d.isoformat()
    assert (r.days_before, r.days_after) == (t, n - t)
    assert r.cusum_peak_dollars == pytest.approx(c / n / 100, abs=1e-3)
    assert r.mean_before == pytest.approx(run / t / 100, abs=1e-3)
    assert r.mean_after == pytest.approx(
        (sx - run) / (n - t) / 100, abs=1e-3
    )
