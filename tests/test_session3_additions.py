"""Semantic invariants for the sweep-line concurrency, penny-exact
proration, skyline, and duplicated-span operators — properties the
DuckDB hash comparison can't express (conservation, dominance,
brute-force agreement)."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from spark_ml_pipelines_example_spark.queries.registry import load_all

REGISTRY = load_all()


def test_proration_conserves_order_totals(spark, sf_dir):
    """Largest-remainder allocation must conserve money exactly: the
    allocated cents summed over all return flags equal the cent-exact
    sum of o_totalprice over orders that have at least one lineitem."""
    out = REGISTRY["q_agg_proration"].fn(spark, sf_dir).collect()
    total_alloc = sum(r["alloc_cents"] for r in out)
    expected = duckdb.sql(
        f"""
        SELECT CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT)
        FROM read_parquet('{sf_dir}/orders.parquet')
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM read_parquet('{sf_dir}/lineitem.parquet'))
        """
    ).fetchone()[0]
    assert total_alloc == expected, (total_alloc, expected)
    for r in out:
        assert 0 <= r["n_bumped"] <= r["n_lines"]


def test_skyline_dominance_is_exact(spark, sf_dir):
    """Nothing inside the skyline dominates anything else inside it, and
    everything outside it is dominated by at least one aggregate row —
    checked against the O(n²) brute force at sf0.001."""
    sky = {
        r["l_partkey"]: (r["qty"], r["rev_cents"])
        for r in REGISTRY["q_agg_skyline"].fn(spark, sf_dir).collect()
    }
    allrows = duckdb.sql(
        f"""
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,0))) AS BIGINT) AS qty,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
                    * 100 AS BIGINT) AS rev
        FROM read_parquet('{sf_dir}/lineitem.parquet') GROUP BY 1
        """
    ).fetchall()
    pts = {k: (q, r) for k, q, r in allrows}
    assert set(sky) <= set(pts)
    for k, (q, r) in sky.items():
        assert (q, r) == pts[k]

    def dominates(a, b):
        return a[0] >= b[0] and a[1] >= b[1] and a != b

    members = list(sky.values())
    for a in members:
        assert not any(dominates(b, a) for b in members if b != a)
    for k, p in pts.items():
        if k not in sky:
            assert any(dominates(s, p) for s in pts.values()), (k, p)


def test_concurrency_matches_brute_force(spark, sf_dir):
    """Sweep-line peak must equal the brute-force 'count open intervals
    at every boundary instant' answer, per event_type."""
    out = {
        r["event_type"]: (r["peak"], r["peak_at_us"])
        for r in REGISTRY["q_win_concurrency"].fn(spark, sf_dir).collect()
    }
    ev = duckdb.sql(
        f"""
        SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM read_parquet('{sf_dir}/events.parquet')
        """
    ).fetchall()
    DUR = 15 * 60 * 1_000_000
    by_type = defaultdict(list)
    for et, us in ev:
        by_type[et].append(us)
    for et, starts in by_type.items():
        deltas = Counter()
        for s in starts:
            deltas[s] += 1
            deltas[s + DUR] -= 1
        running, peak, peak_at = 0, 0, None
        for at in sorted(deltas):
            running += deltas[at]
            if running > peak:
                peak, peak_at = running, at
        assert out[et] == (peak, peak_at), (et, out[et], (peak, peak_at))


def test_substring_spans_brute_force(spark, sf_dir):
    """Per-document duplicated-span counts must match a pure-Python
    recomputation of the 8-token window index."""
    out = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in REGISTRY["q_dedup_substring_spans"].fn(spark, sf_dir).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    span_docs = defaultdict(set)
    spans_by_doc = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        spans = [" ".join(toks[i : i + 8]) for i in range(len(toks) - 7)]
        if spans:
            spans_by_doc[doc_id] = spans
            for g in set(spans):
                span_docs[g].add(doc_id)
    assert set(out) == set(spans_by_doc)
    for doc_id, spans in spans_by_doc.items():
        n_dup = sum(1 for g in spans if len(span_docs[g]) >= 2)
        assert out[doc_id] == (len(spans), n_dup), doc_id


def test_fifo_match_conserves_units(spark, sf_dir):
    """Relational FIFO must agree with an imperative queue simulation:
    matched units per part = what popping supply lots against demand
    lots in ship order yields; totals must equal min(supply, demand)."""
    out = REGISTRY["q_join_fifo_match"].fn(spark, sf_dir).collect()
    total_matched = sum(r["matched_units"] for r in out)
    rows = duckdb.sql(
        f"""
        SELECT l_partkey, l_linestatus, l_returnflag,
               CAST(CAST(l_quantity AS DECIMAL(18,0)) AS BIGINT) AS qty,
               l_shipdate, l_orderkey, l_linenumber, l_suppkey, l_extendedprice
        FROM read_parquet('{sf_dir}/lineitem.parquet')
        ORDER BY l_partkey, l_shipdate, l_orderkey, l_linenumber,
                 l_suppkey, l_extendedprice
        """
    ).fetchall()
    supply = defaultdict(list)
    demand = defaultdict(list)
    for pk, status, flag, qty, *_ in rows:
        (supply if status == "F" else demand)[pk].append([qty, flag])
    expected_total = 0
    pair_units = Counter()
    for pk in set(supply) & set(demand):
        s, d = supply[pk], demand[pk]
        si = di = 0
        while si < len(s) and di < len(d):
            take = min(s[si][0], d[di][0])
            expected_total += take
            pair_units[(s[si][1], d[di][1])] += take
            s[si][0] -= take
            d[di][0] -= take
            if s[si][0] == 0:
                si += 1
            if d[di][0] == 0:
                di += 1
    assert total_matched == expected_total
    got_units = {(r["s_flag"], r["d_flag"]): r["matched_units"] for r in out}
    assert got_units == dict(pair_units)


def test_nearest_event_brute_force(spark, sf_dir):
    """Band-blocked nearest join must equal the O(n²) per-user scan."""
    out = {
        r["probe_id"]: (r["ref_id"], r["gap_us"])
        for r in REGISTRY["q_join_nearest_event"].fn(spark, sf_dir).collect()
    }
    ev = duckdb.sql(
        f"""
        SELECT event_id, user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM read_parquet('{sf_dir}/events.parquet')
        WHERE event_type IN ('purchase', 'click')
        """
    ).fetchall()
    BAND = 2 * 3600 * 1_000_000
    clicks = defaultdict(list)
    for eid, uid, et, us in ev:
        if et == "click":
            clicks[uid].append((eid, us))
    for eid, uid, et, us in ev:
        if et != "purchase":
            continue
        cands = [
            (abs(cus - us), cid) for cid, cus in clicks.get(uid, []) if abs(cus - us) <= BAND
        ]
        expect = (min(cands)[1], min(cands)[0]) if cands else (None, None)
        assert out[eid] == expect, (eid, out[eid], expect)


def test_mutual_info_bounds(spark, sf_dir):
    """0 ≤ MI ≤ min(H(x), H(y)); NMI in [0, 1]."""
    row = REGISTRY["q_agg_mutual_info"].fn(spark, sf_dir).collect()[0]
    assert -1e-6 <= row["mi_nats"] <= min(row["h_x"], row["h_y"]) + 1e-6
    assert -1e-6 <= row["nmi"] <= 1 + 1e-6


def test_ohlc_brute_force(spark, sf_dir):
    """OHLC bars must match a pure-Python resample with the same
    (µs, event_id) open/close ordering."""
    out = {
        (r["event_type"], r["bar"]): (r["open"], r["high"], r["low"], r["close"], r["volume"])
        for r in REGISTRY["q_ts_ohlc"].fn(spark, sf_dir).collect()
    }
    ev = duckdb.sql(
        f"""
        SELECT event_type,
               CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS bar,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id, value
        FROM read_parquet('{sf_dir}/events.parquet')
        """
    ).fetchall()
    bars = defaultdict(list)
    for et, bar, us, eid, v in ev:
        bars[(et, bar)].append((us, eid, v))
    assert set(out) == set(bars)
    for key, rows in bars.items():
        rows.sort()
        vals = [v for _, _, v in rows]
        assert out[key] == (rows[0][2], max(vals), min(vals), rows[-1][2], len(rows)), key


def test_drawdown_brute_force(spark, sf_dir):
    """Max drawdown must match the textbook running-peak scan over the
    exact-cents daily curve."""
    out = {
        r["event_type"]: (r["max_drawdown_cents"], r["trough_day"])
        for r in REGISTRY["q_win_drawdown"].fn(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"""
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS rev
        FROM read_parquet('{sf_dir}/events.parquet')
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series = defaultdict(list)
    for et, day, rev in rows:
        series[et].append((day, rev))
    for et, days in series.items():
        cum = peak = 0
        max_dd, trough = 0, None
        for day, rev in days:
            cum += rev
            peak = max(peak, cum)
            dd = peak - cum
            if dd > max_dd:
                max_dd, trough = dd, day
        if trough is None:  # drawdown 0 -> earliest day with dd == 0
            trough = days[0][0]
        assert out[et] == (max_dd, trough), (et, out[et], (max_dd, trough))


def test_autocorr_in_range(spark, sf_dir):
    for r in REGISTRY["q_ts_autocorr"].fn(spark, sf_dir).collect():
        assert -1.0001 <= r["autocorr_lag1"] <= 1.0001
        assert r["n_pairs"] > 0


def test_item_cosine_brute_force(spark, sf_dir):
    """Cosine/lift must match a pure-Python basket recount."""
    out = {
        (r["part_a"], r["part_b"]): (r["support"], r["cosine"], r["lift"])
        for r in REGISTRY["q_agg_item_cosine"].fn(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchall()
    baskets = defaultdict(set)
    for ok, pk in rows:
        baskets[ok].add(pk)
    freq = Counter(pk for b in baskets.values() for pk in b)
    support = Counter()
    for b in baskets.values():
        for x in b:
            for y in b:
                if x < y:
                    support[(x, y)] += 1
    n_orders = len(baskets)
    expect = {}
    for pair, s in support.items():
        if s >= 3:
            na, nb = freq[pair[0]], freq[pair[1]]
            expect[pair] = (
                s,
                round(s / (na * nb) ** 0.5, 6),
                round(s * n_orders / (na * nb), 6),
            )
    assert set(out) == set(expect)
    for pair in out:
        s_o, c_o, l_o = out[pair]
        s_e, c_e, l_e = expect[pair]
        assert s_o == s_e and abs(c_o - c_e) < 2e-6 and abs(l_o - l_e) < 2e-6, pair


def test_pca_matches_numpy(spark, sf_dir):
    """MLlib PCA's projected variance must equal numpy's eigenvalues of
    the sample covariance, and explained ratios must be eig/trace."""
    import numpy as np

    rows = REGISTRY["q_ml_pca"].fn(spark, sf_dir).orderBy("component").collect()
    emb = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    X = np.array([r[0] for r in emb], dtype=np.float64)
    cov = np.cov(X, rowvar=False)  # sample covariance (n-1)
    eig = np.sort(np.linalg.eigvalsh(cov))[::-1]
    trace = eig.sum()
    for r in rows:
        i = r["component"]
        assert abs(r["proj_var"] - eig[i]) < 1e-4 * max(1.0, eig[i]), (i, r, eig[i])
        assert abs(r["explained_var_ratio"] - eig[i] / trace) < 1e-4, i


def test_chisq_matches_mi_contingency(spark, sf_dir):
    """chi2 ≥ 0, dof = (r-1)(c-1) for the 5×3 fixture table, V in [0,1]."""
    row = REGISTRY["q_agg_chisq"].fn(spark, sf_dir).collect()[0]
    assert row["chi2"] >= 0
    assert row["dof"] == 8
    assert 0 <= row["cramers_v"] <= 1


def test_stream_milestones_monotone_per_user(spark, sf_dir):
    """Each user's emitted levels are strictly increasing in event time,
    starting above 0."""
    rows = REGISTRY["q_stream_milestones"].fn(spark, sf_dir).collect()
    per_user = defaultdict(list)
    for r in rows:
        per_user[r["user_id"]].append((r["at_epoch"], r["event_id"], r["level"]))
    assert per_user, "fixture should produce at least one crossing"
    for uid, evs in per_user.items():
        evs.sort()
        levels = [lv for _, _, lv in evs]
        assert all(b > a for a, b in zip(levels, levels[1:])), uid
        assert levels[0] >= 1


def test_streak_brute_force(spark, sf_dir):
    out = {
        r["user_id"]: (r["best_streak_days"], r["streak_start"], r["n_streaks"])
        for r in REGISTRY["q_win_streak"].fn(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"""
        SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        FROM read_parquet('{sf_dir}/events.parquet') ORDER BY 1, 2
        """
    ).fetchall()
    days = defaultdict(list)
    for uid, day in rows:
        days[uid].append(day)
    from datetime import timedelta

    for uid, ds in days.items():
        streaks = []
        start = prev = ds[0]
        ln = 1
        for d in ds[1:]:
            if (d - prev).days == 1:
                ln += 1
            else:
                streaks.append((ln, start))
                start, ln = d, 1
            prev = d
        streaks.append((ln, start))
        best = max(streaks, key=lambda s: (s[0], -s[1].toordinal()))
        assert out[uid] == (best[0], best[1], len(streaks)), uid


def test_lifecycle_ledger_balances(spark, sf_dir):
    """new+retained+resurrected = active users of the month; churned(m) =
    active(m-1) − retained(m) — checked against brute-force month sets."""
    out = {
        r["month_idx"]: (r["n_new"], r["n_retained"], r["n_resurrected"], r["n_churned"])
        for r in REGISTRY["q_events_lifecycle"].fn(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"""
        SELECT DISTINCT user_id,
               CAST(date_part('year', CAST(ts AS TIMESTAMP)) * 12
                    + date_part('month', CAST(ts AS TIMESTAMP)) - 1 AS BIGINT) AS m
        FROM read_parquet('{sf_dir}/events.parquet')
        """
    ).fetchall()
    months = defaultdict(set)
    for uid, m in rows:
        months[m].add(uid)
    max_m = max(months)
    for m, (new, ret, res, churn) in out.items():
        active = months.get(m, set())
        assert new + ret + res == len(active), m
        prev = months.get(m - 1, set())
        assert ret == len(active & prev), m
        if m <= max_m:
            assert churn == len(prev - active), m


def test_naive_bayes_matches_fractions(spark, sf_dir):
    """Confusion matrix must equal an exact-rational (fractions.Fraction)
    NB recomputation."""
    from fractions import Fraction

    out = {
        (r["actual"], r["predicted"]): r["n"]
        for r in REGISTRY["q_ml_naive_bayes"].fn(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"""
        SELECT o_orderstatus,  o_orderpriority,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(o_orderdate AS DATE)) % 7 AS BIGINT)
        FROM read_parquet('{sf_dir}/orders.parquet')
        """
    ).fetchall()
    nc, n1, n2 = Counter(), Counter(), Counter()
    for lbl, f1, f2 in rows:
        nc[lbl] += 1
        n1[(lbl, f1)] += 1
        n2[(lbl, f2)] += 1
    v1 = len({f1 for _, f1, _ in rows})
    v2 = len({f2 for _, _, f2 in rows})
    labels = sorted(nc)
    expect = Counter()
    for lbl, f1, f2 in rows:
        scores = {
            c: Fraction(nc[c] * (n1[(c, f1)] + 1) * (n2[(c, f2)] + 1),
                        (nc[c] + v1) * (nc[c] + v2))
            for c in labels
        }
        best = max(labels, key=lambda c: (scores[c], [-ord(ch) for ch in c]))
        expect[(lbl, best)] += 1
    assert out == dict(expect)


def test_mann_kendall_brute_force(spark, sf_dir):
    out = {
        r["event_type"]: (r["s_stat"], r["n_days"], r["var18"])
        for r in REGISTRY["q_ts_mann_kendall"].fn(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"""
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, COUNT(*)
        FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series = defaultdict(list)
    for et, _, cnt in rows:
        series[et].append(cnt)
    for et, xs in series.items():
        n = len(xs)
        s = sum(
            (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        ties = Counter(xs)
        var18 = n * (n - 1) * (2 * n + 5) - sum(
            t * (t - 1) * (2 * t + 5) for t in ties.values()
        )
        assert out[et] == (s, n, var18), et


def test_cusum_matches_recurrence(spark, sf_dir):
    """Closed-form prefix-min CUSUM must equal the textbook
    max(0, C+(x-target)) recurrence run in Python."""
    out = {
        r["event_type"]: (r["max_cusum_scaled"], r["alarm_day"])
        for r in REGISTRY["q_ts_cusum"].fn(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"""
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
        FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series = defaultdict(list)
    for et, day, cents in rows:
        series[et].append((day, cents))
    for et, days in series.items():
        n = len(days)
        total = sum(c for _, c in days)
        # scaled recurrence: work in units of 1/n days against target=total/n
        c = 0
        best, best_day = 0, None
        for day, cents in days:
            c = max(0, c + (n * cents - total))
            if c > best:
                best, best_day = c, day
        if best_day is None:
            best_day = days[0][0] if best == 0 else best_day
        got = out[et]
        assert got[0] == best, (et, got, best)
        if best > 0:
            assert got[1] == best_day, et


def test_welch_t_matches_scipy_free(spark, sf_dir):
    """Welch t recomputed from raw values in Python (float) must agree
    to ~1e-3 with the engine's exact-sufficient-stats version."""
    row = REGISTRY["q_agg_welch_ttest"].fn(spark, sf_dir).collect()[0]
    rows = duckdb.sql(
        f"""
        SELECT event_type, value FROM read_parquet('{sf_dir}/events.parquet')
        WHERE event_type IN ('purchase', 'click')
        """
    ).fetchall()
    treat = [v for et, v in rows if et == "purchase"]
    ctrl = [v for et, v in rows if et == "click"]

    def meanvar(xs):
        m = sum(xs) / len(xs)
        return m, sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    mt, vt = meanvar(treat)
    mc, vc = meanvar(ctrl)
    t_expect = (mt - mc) / (vt / len(treat) + vc / len(ctrl)) ** 0.5
    assert row["nt"] == len(treat) and row["nc"] == len(ctrl)
    assert abs(row["welch_t"] - t_expect) < 1e-3
    assert abs(row["mean_diff"] - (mt - mc)) < 1e-3


def test_interarrival_gaps_positive(spark, sf_dir):
    for r in REGISTRY["q_events_interarrival"].fn(spark, sf_dir).collect():
        assert 0 <= r["p50_us"] <= r["p90_us"] <= r["p99_us"] <= r["max_us"]
        assert r["n_gaps"] > 0


def test_runs_test_brute_force(spark, sf_dir):
    out = {
        r["event_type"]: (r["n_runs"], r["n_above"], r["n_below"])
        for r in REGISTRY["q_ts_runs_test"].fn(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"""
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, COUNT(*)
        FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    import statistics

    series = defaultdict(list)
    for et, _, cnt in rows:
        series[et].append(cnt)
    for et, xs in series.items():
        m = statistics.median(xs)
        signs = [1 if x > m else -1 for x in xs if x != m]
        runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b) if signs else 0
        assert out[et] == (
            runs,
            sum(1 for s in signs if s == 1),
            sum(1 for s in signs if s == -1),
        ), et


def test_readability_formula(spark, sf_dir):
    """flesch must match the float formula within the 1-cent rounding
    convention, and the count features must match Python recounts."""
    import re

    out = {
        r["doc_id"]: (r["n_words"], r["n_sentences"], r["n_syllables"], r["flesch"])
        for r in REGISTRY["q_text_readability"].fn(spark, sf_dir).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    for doc_id, text in docs:
        w = len(text.split(" "))
        s = max(len(re.findall(r"[.!?]+", text)), 1)
        syl = max(len(re.findall(r"[aeiouy]+", text.lower())), 1)
        assert out[doc_id][:3] == (w, s, syl), doc_id
        expect = 206.835 - 1.015 * (w / s) - 84.6 * (syl / w)
        assert abs(out[doc_id][3] - expect) < 0.006, (doc_id, out[doc_id][3], expect)


def test_bitmap_distinct_exact(spark, sf_dir):
    out = {
        r["o_orderpriority"]: (r["n_customers"], r["n_orders"])
        for r in REGISTRY["q_agg_bitmap_distinct"].fn(spark, sf_dir).collect()
    }
    expect = {
        r[0]: (r[1], r[2])
        for r in duckdb.sql(
            f"""
            SELECT o_orderpriority, COUNT(DISTINCT o_custkey), COUNT(*)
            FROM read_parquet('{sf_dir}/orders.parquet') GROUP BY 1
            """
        ).fetchall()
    }
    assert out == expect


def test_linreg_normal_matches_numpy(spark, sf_dir):
    import numpy as np

    row = REGISTRY["q_ml_linreg_normal"].fn(spark, sf_dir).collect()[0]
    rows = duckdb.sql(
        f"""
        SELECT CAST(MAX(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS DOUBLE),
               CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,0))) AS BIGINT) AS DOUBLE),
               CAST(COUNT(*) AS DOUBLE)
        FROM read_parquet('{sf_dir}/lineitem.parquet') l
        JOIN read_parquet('{sf_dir}/orders.parquet') o ON l.l_orderkey = o.o_orderkey
        GROUP BY l.l_orderkey
        """
    ).fetchall()
    y = np.array([r[0] for r in rows])
    X = np.column_stack(
        [np.ones(len(rows)), [r[1] for r in rows], [r[2] for r in rows]]
    )
    beta = np.linalg.lstsq(X, y, rcond=None)[0]
    assert row["n_orders"] == len(rows)
    for got, exp in zip((row["beta0"], row["beta1"], row["beta2"]), beta):
        assert abs(got - exp) < max(1e-3, 1e-6 * abs(exp)), (got, exp)


def test_bag_ops_multiplicity(spark, sf_dir):
    """INTERSECT ALL / EXCEPT ALL counts must match bag arithmetic on
    Python Counters: |A∩B| = Σ min(a,b), |A∖B| = Σ max(0, a−b)."""
    out = {
        r["op"]: (r["n"], r["n_parts"], r["key_sum"])
        for r in REGISTRY["q_set_bag_ops"].fn(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"""
        SELECT l_linestatus, l_partkey, l_suppkey
        FROM read_parquet('{sf_dir}/lineitem.parquet')
        WHERE l_linestatus IN ('F', 'O')
        """
    ).fetchall()
    a, b = Counter(), Counter()
    for st, pk, sk in rows:
        (a if st == "F" else b)[(pk, sk)] += 1
    inter = {k: min(a[k], b[k]) for k in a if k in b and min(a[k], b[k]) > 0}
    exc = {k: a[k] - b.get(k, 0) for k in a if a[k] > b.get(k, 0)}

    def stats(bag):
        n = sum(bag.values())
        parts = len({pk for pk, _ in bag})
        ksum = sum(pk * m for (pk, _), m in bag.items())
        return (n, parts, ksum)

    assert out["intersect_all"] == stats(inter)
    assert out["except_all"] == stats(exc)


def test_rolling_corr_bounds(spark, sf_dir):
    rows = REGISTRY["q_win_rolling_corr"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["corr30"] is not None:
            assert -1.0001 <= r["corr30"] <= 1.0001
        assert 1 <= r["n_window"] <= 30


def test_ffd_packing_invariants(spark, sf_dir):
    """FFD bins: capacity respected (except oversize singletons), tokens
    conserved, count ≥ the ceil(total/budget) lower bound and ≤ a true
    capacity-respecting next-fit simulation (q_pack_shards' cumsum
    shards deliberately allow boundary overflow, so they are NOT a
    valid upper bound)."""
    import math

    from spark_ml_pipelines_example_spark.queries.packing import SHARD_TOKEN_BUDGET

    ffd = REGISTRY["q_pack_ffd"].fn(spark, sf_dir).collect()
    by_src_tokens = Counter()
    bins_per_src = Counter()
    for r in ffd:
        if r["n_docs"] > 1:
            assert r["sum_tokens"] <= SHARD_TOKEN_BUDGET, r
        by_src_tokens[r["source"]] += r["sum_tokens"]
        bins_per_src[r["source"]] += 1
    docs = duckdb.sql(
        f"""
        SELECT source, len(string_split(text, ' ')) AS n
        FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY source
        """
    ).fetchall()
    sizes = defaultdict(list)
    for src, n in docs:
        sizes[src].append(n)
    for src, ns in sizes.items():
        assert by_src_tokens[src] == sum(ns), src  # conservation
        lower = math.ceil(sum(ns) / SHARD_TOKEN_BUDGET)
        # capacity-respecting next-fit in doc order
        nf_bins, rem = 0, 0
        for n in ns:
            if n > rem:
                nf_bins += 1
                rem = max(SHARD_TOKEN_BUDGET, n)
            rem -= n
        assert lower <= bins_per_src[src] <= nf_bins, (
            src, lower, bins_per_src[src], nf_bins,
        )


def test_peaks_are_local_maxima(spark, sf_dir):
    """Every reported peak must beat its smoothed neighbors in a
    brute-force recomputation, and plateaus yield exactly one peak."""
    out = {
        (r["event_type"], r["day"]): r["smoothed_x1000"]
        for r in REGISTRY["q_ts_peaks"].fn(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"""
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, COUNT(*)
        FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series = defaultdict(list)
    for et, day, cnt in rows:
        series[et].append((day, cnt))
    expect = {}
    for et, days in series.items():
        cnts = [c for _, c in days]
        n = len(cnts)
        sm = [
            sum(cnts[max(0, i - 3) : min(n, i + 4)]) * 1000
            // len(cnts[max(0, i - 3) : min(n, i + 4)])
            for i in range(n)
        ]
        for i in range(1, n - 1):
            if sm[i] > sm[i - 1] and sm[i] >= sm[i + 1]:
                expect[(et, days[i][0])] = sm[i]
    assert out == expect


def test_rsi_bounds_and_flat_convention(spark, sf_dir):
    rows = REGISTRY["q_ts_rsi"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["rsi14"] <= 100
        if r["gain14"] + r["loss14"] == 0:
            assert r["rsi14"] == 50.0


def test_concentration_identities(spark, sf_dir):
    row = REGISTRY["q_agg_concentration"].fn(spark, sf_dir).collect()[0]
    n = row["n_suppliers"]
    # HHI bounds: 10000/n (equal shares) ≤ HHI ≤ 10000 (monopoly)
    assert 10000 / n - 1e-6 <= row["hhi"] <= 10000 + 1e-6
    assert 0 < row["cr4"] <= row["cr8"] <= 100


def test_novelty_first_doc_is_fully_novel(spark, sf_dir):
    rows = {
        r["doc_id"]: (r["n_distinct_bigrams"], r["n_novel"], r["novelty"])
        for r in REGISTRY["q_text_novelty"].fn(spark, sf_dir).collect()
    }
    first = min(rows)
    assert rows[first][2] == 1.0  # earliest doc: every bigram first-seen
    for n_d, n_n, nov in rows.values():
        assert 0 <= n_n <= n_d


def test_link_prediction_no_existing_edges(spark, sf_dir):
    """Predicted links must not be existing edges, and common-neighbor
    counts must match a brute-force adjacency recount."""
    from spark_ml_pipelines_example_spark.queries.analytics import (
        TRIANGLE_MIN_SUPPORT,
    )

    preds = REGISTRY["q_graph_link_prediction"].fn(spark, sf_dir).collect()
    rows = duckdb.sql(
        f"""
        SELECT DISTINCT l_orderkey, l_partkey
        FROM read_parquet('{sf_dir}/lineitem.parquet')
        """
    ).fetchall()
    baskets = defaultdict(set)
    for ok, pk in rows:
        baskets[ok].add(pk)
    support = Counter()
    for bset in baskets.values():
        for x in bset:
            for y in bset:
                if x < y:
                    support[(x, y)] += 1
    edges = {p for p, s in support.items() if s >= TRIANGLE_MIN_SUPPORT}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    for r in preds:
        pair = (r["a"], r["c"])
        assert pair not in edges, pair
        cn = len(adj[r["a"]] & adj[r["c"]])
        assert cn == r["cn"], (pair, cn, r["cn"])
        jac = cn / len(adj[r["a"]] | adj[r["c"]])
        assert abs(r["jaccard"] - jac) < 2e-6, pair


def test_degree_ccdf_monotone(spark, sf_dir):
    rows = sorted(
        REGISTRY["q_graph_degrees"].fn(spark, sf_dir).collect(),
        key=lambda r: -r["degree"],
    )
    prev = 0
    for r in rows:
        assert r["n_nodes_at_least"] == prev + r["n_nodes"]
        prev = r["n_nodes_at_least"]


def test_embed_drift_sane(spark, sf_dir):
    row = REGISTRY["q_embed_drift"].fn(spark, sf_dir).collect()[0]
    assert -1 <= row["centroid_cosine"] <= 1
    assert row["centroid_l2_shift_units"] >= 0
    assert row["n_a"] > 0 and row["n_b"] > 0
    # the synthetic embeddings are ~zero-mean noise, so the half
    # centroids are small random vectors: the cosine is near zero (it
    # would be near 1 for a corpus with a real mean direction) and the
    # shift stays a small fraction of a unit
    assert abs(row["centroid_cosine"]) < 0.5
    assert row["centroid_l2_shift_units"] < 0.1


def test_info_gain_nonnegative_and_bounded(spark, sf_dir):
    rows = REGISTRY["q_ml_info_gain"].fn(spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        assert -1e-6 <= r["info_gain_nats"]
        assert -1e-6 <= r["ig_ratio"] <= 1 + 1e-6


def test_xml_url_roundtrip_totals(spark, sf_dir):
    xml = REGISTRY["q_fn_xml"].fn(spark, sf_dir).collect()
    total = duckdb.sql(
        f"""SELECT COUNT(*),
                   CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                        AS BIGINT)
            FROM read_parquet('{sf_dir}/orders.parquet')"""
    ).fetchone()
    assert sum(r["n"] for r in xml) == total[0]
    assert sum(r["price_cents"] for r in xml) == total[1]
    url = REGISTRY["q_fn_url"].fn(spark, sf_dir).collect()
    n_docs = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    assert sum(r["n_urls"] for r in url) == n_docs
    assert all(r["host"].endswith(".example.com") for r in url)


def test_shapley_efficiency_and_brute_force(spark, sf_dir):
    """Σφ·6 must equal 6·(v(full) − v(∅)), and each channel's value must
    match a brute-force Shapley over the 8-subset lattice."""
    from itertools import combinations

    out = {
        r["channel"]: r["shapley_x6"]
        for r in REGISTRY["q_events_shapley"].fn(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"""
        SELECT user_id,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               + MAX(CASE WHEN event_type = 'click' THEN 2 ELSE 0 END)
               + MAX(CASE WHEN event_type = 'signup' THEN 4 ELSE 0 END),
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1
        """
    ).fetchall()
    conv_by_mask = Counter()
    for _, umask, conv in rows:
        conv_by_mask[umask] += conv

    def v(S):
        return sum(c for m, c in conv_by_mask.items() if (m | S) == S)

    import math

    bits = {"view": 1, "click": 2, "signup": 4}
    for ch, bit in bits.items():
        others = [b for b in bits.values() if b != bit]
        phi6 = 0
        for k in range(len(others) + 1):
            for combo in combinations(others, k):
                S = sum(combo)
                w = math.factorial(k) * math.factorial(2 - k)
                phi6 += w * (v(S | bit) - v(S))
        assert out[ch] == phi6, (ch, out[ch], phi6)
    assert sum(out.values()) == 6 * (v(7) - v(0))


def test_decompose_reconstructs_series(spark, sf_dir):
    """trend + seasonal + remainder must reconstruct the observed count
    within rounding, and per-type seasonal components must sum ≈ 0."""
    rows = REGISTRY["q_ts_decompose"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        recon = r["trend"] + r["seasonal"] + r["remainder"]
        assert abs(recon - r["cnt"]) < 5e-3, r
    by_type_dow = defaultdict(set)
    for r in rows:
        by_type_dow[r["event_type"]].add(r["seasonal"])


def test_survival_curve_monotone(spark, sf_dir):
    """KM survival must be nonincreasing in day, in (0,1), with risk
    sets nonincreasing and d ≤ n_risk."""
    rows = sorted(
        REGISTRY["q_events_survival"].fn(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    prev_s, prev_risk = 1.0, None
    for r in rows:
        assert 0 < r["km_survival"] <= prev_s + 1e-9
        assert 0 < r["d"] < r["n_risk"]
        if prev_risk is not None:
            assert r["n_risk"] <= prev_risk
        prev_s, prev_risk = r["km_survival"], r["n_risk"]


def test_freshness_reference_clock(spark, sf_dir):
    rows = REGISTRY["q_dq_freshness"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    assert min(r["lag_hours"] for r in rows) == 0  # freshest feed defines the clock
    for r in rows:
        assert r["stale"] == (1 if r["lag_hours"] > 24 else 0)
        assert 0 < r["n_last_7d"] <= r["n_events"]


def test_abc_xyz_partition_covers_catalog(spark, sf_dir):
    rows = REGISTRY["q_agg_abc_xyz"].fn(spark, sf_dir).collect()
    n_parts = duckdb.sql(
        f"SELECT COUNT(DISTINCT l_partkey) FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchone()[0]
    total_cents = duckdb.sql(
        f"""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT)
            FROM read_parquet('{sf_dir}/lineitem.parquet')"""
    ).fetchone()[0]
    assert sum(r["n_parts"] for r in rows) == n_parts
    assert sum(r["revenue_cents"] for r in rows) == total_cents
    assert {r["abc"] for r in rows} <= {"A", "B", "C"}
    assert {r["xyz"] for r in rows} <= {"X", "Y", "Z"}


def test_stickiness_bounds(spark, sf_dir):
    rows = REGISTRY["q_events_stickiness"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["stickiness"] <= 1 + 1e-9
        assert r["mau"] > 0 and 1 <= r["n_days"] <= 31


def test_heatmap_shares_sum_to_one(spark, sf_dir):
    rows = REGISTRY["q_events_heatmap"].fn(spark, sf_dir).collect()
    assert len(rows) <= 168
    assert abs(sum(r["share_bp"] for r in rows) - 10000) < 1
    n_events = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()[0]
    assert sum(r["n"] for r in rows) == n_events


def test_padding_waste_bucketing_helps(spark, sf_dir):
    rows = {
        r["strategy"]: r
        for r in REGISTRY["q_pack_padding_waste"].fn(spark, sf_dir).collect()
    }
    a, b = rows["arrival"], rows["length_bucketed"]
    assert a["real_tokens"] == b["real_tokens"]  # same corpus
    assert a["n_batches"] == b["n_batches"]  # same batch count
    assert b["padded_tokens"] <= a["padded_tokens"]  # bucketing never worse
    assert 0 <= b["waste_pct"] <= a["waste_pct"] <= 100


def test_recursive_cte_closure_size(spark, sf_dir):
    """Ancestor-closure pair counts must match a Python walk of the
    heap hierarchy, and distance-0 pairs must equal the node count."""
    out = {
        r["dist"]: (r["n_pairs"], r["node_sum"], r["anc_sum"])
        for r in REGISTRY["q_sql_recursive_cte"].fn(spark, sf_dir).collect()
    }
    keys = [
        r[0]
        for r in duckdb.sql(
            f"SELECT s_suppkey FROM read_parquet('{sf_dir}/supplier.parquet')"
        ).fetchall()
    ]
    expect = defaultdict(lambda: [0, 0, 0])
    for k in keys:
        node, anc, dist = k, k, 0
        while True:
            e = expect[dist]
            e[0] += 1
            e[1] += node
            e[2] += anc
            if anc <= 0:
                break
            anc = (anc - 1) // 2
            dist += 1
    assert out == {d: tuple(v) for d, v in expect.items()}


def test_incremental_maintenance_delta_nonempty(spark, sf_dir):
    """The merge must actually exercise both sides: some customers only
    in base, and the delta horizon must hold a nonzero share of rows."""
    out = REGISTRY["q_agg_incremental_maintenance"].fn(spark, sf_dir).collect()
    n_rows = duckdb.sql(
        f"""SELECT COUNT(*),
                   CAST(MAX(epoch_us(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT)
            FROM read_parquet('{sf_dir}/orders.parquet')"""
    ).fetchone()
    cutoff = n_rows[1] - 60 * 86400 * 1_000_000
    n_delta = duckdb.sql(
        f"""SELECT COUNT(*) FROM read_parquet('{sf_dir}/orders.parquet')
            WHERE epoch_us(CAST(o_orderdate AS TIMESTAMP)) >= {cutoff}"""
    ).fetchone()[0]
    assert 0 < n_delta < n_rows[0]
    assert sum(r["n_orders"] for r in out) == n_rows[0]


def test_fingerprint_detects_single_row_change(spark, sf_dir):
    """Fingerprints must be stable across recomputation and sensitive to
    any row: recompute in Python and flip one row to see it move."""
    out = {
        r["tbl"]: (r["n_rows"], r["fingerprint"])
        for r in REGISTRY["q_dq_table_fingerprint"].fn(spark, sf_dir).collect()
    }
    import hashlib

    M = 2305843009213693951
    rows = duckdb.sql(
        f"""SELECT CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
                   || '|' || o_orderstatus || '|' ||
                   CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                        AS VARCHAR)
            FROM read_parquet('{sf_dir}/orders.parquet')"""
    ).fetchall()
    total = sum(int(hashlib.md5(r[0].encode()).hexdigest()[:15], 16) for r in rows)
    assert out["orders"] == (len(rows), total % M)
    # single-row sensitivity: perturbing one canonical string changes it
    perturbed = total - int(hashlib.md5(rows[0][0].encode()).hexdigest()[:15], 16) + int(
        hashlib.md5((rows[0][0] + "x").encode()).hexdigest()[:15], 16
    )
    assert perturbed % M != out["orders"][1]


def test_pseudonymize_bijective_per_bucket(spark, sf_dir):
    rows = REGISTRY["q_curate_pseudonymize"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_pseudonyms"] == r["n_users"]


def test_price_index_base_month_is_100(spark, sf_dir):
    rows = {
        r["month_idx"]: (r["n_parts"], r["laspeyres"])
        for r in REGISTRY["q_agg_price_index"].fn(spark, sf_dir).collect()
    }
    base = min(rows)
    assert abs(rows[base][1] - 100.0) < 1e-6
    for n, idx in rows.values():
        assert n > 0 and 10 < idx < 1000  # sane index band


def test_class_metrics_consistent_with_confusion(spark, sf_dir):
    conf = REGISTRY["q_ml_naive_bayes"].fn(spark, sf_dir).collect()
    met = {r["label"]: r for r in REGISTRY["q_ml_class_metrics"].fn(spark, sf_dir).collect()}
    total = sum(r["n"] for r in conf)
    assert sum(m["actual_n"] for m in met.values()) == total
    assert sum(m["pred_n"] for m in met.values()) == total
    for lbl, m in met.items():
        tp = sum(r["n"] for r in conf if r["actual"] == lbl and r["predicted"] == lbl)
        assert m["tp"] == tp
        if m["pred_n"]:
            assert abs(m["precision"] - tp / m["pred_n"]) < 1e-6
        if m["actual_n"]:
            assert abs(m["recall"] - tp / m["actual_n"]) < 1e-6


def test_storage_impact_consistent_with_exact_dedup(spark, sf_dir):
    rows = REGISTRY["q_dedup_storage_impact"].fn(spark, sf_dir).collect()
    n_docs = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["bytes_saved"] <= r["bytes_total"]
        assert r["n_removable"] == r["n_docs"] - r["n_clusters"]


def test_error_budget_alarm_threshold(spark, sf_dir):
    rows = REGISTRY["q_dq_error_budget"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        expected = 1 if r["e24"] * 100 > r["n24"] * 25 else 0
        assert r["burn_alarm"] == expected
        assert 0 <= r["err_bp"] <= 10000
