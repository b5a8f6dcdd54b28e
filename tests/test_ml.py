"""Tests for the supervised MLlib pipeline (operators/ml.py)."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from time_series_spark_spark.operators.ml import (
    daily_user_features,
    purchase_propensity_auc,
)


def _synthetic_events(spark, n_users=40, n_days=40, seed=5):
    """Users whose clicks TODAY strongly predict a purchase TOMORROW."""
    rng = np.random.default_rng(seed)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(n_users):
        for day in range(n_days):
            base = t0 + dt.timedelta(days=day)
            n_clicks = int(rng.poisson(1.5))
            for _ in range(n_clicks):
                rows.append(
                    (eid, base + dt.timedelta(hours=int(rng.integers(0, 23))),
                     u, "click", float(rng.uniform(1, 10)))
                )
                eid += 1
            # purchase tomorrow with prob sigmoid-ish in today's clicks
            if rng.random() < min(0.9, 0.05 + 0.25 * n_clicks):
                rows.append(
                    (eid, base + dt.timedelta(days=1, hours=12),
                     u, "purchase", float(rng.uniform(20, 50)))
                )
                eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double"
    )


def test_feature_frame_shape_and_labels(spark):
    ev = _synthetic_events(spark, n_users=5, n_days=10)
    feats = daily_user_features(ev)
    rows = feats.collect()
    # dense grid minus the unlabelable trailing day
    n_days_grid = feats.select("d").distinct().count()
    assert all(r["label"] in (0.0, 1.0) for r in rows)
    assert len(rows) == 5 * n_days_grid


def test_propensity_auc_beats_chance_on_planted_signal(spark):
    ev = _synthetic_events(spark)
    m = purchase_propensity_auc(ev, cutoff="2024-02-01")
    assert m["n_train"] > 0 and m["n_test"] > 0
    assert 0 < m["pos_rate_test"] < 1
    assert m["auc"] > 0.75, m


def test_als_recovers_planted_block_preferences(spark):
    """Two user groups with disjoint item tastes: every recommendation
    stays inside the user's own block (held-out items included)."""
    rng = np.random.default_rng(11)
    rows = []
    for u in range(40):
        block = 0 if u < 20 else 1
        items = range(0, 30) if block == 0 else range(30, 60)
        for it in rng.choice(list(items), 12, replace=False):
            rows.append((u, int(it), float(rng.integers(1, 5))))
    inter = spark.createDataFrame(rows, "user long, item long, strength float")
    from time_series_spark_spark.operators.ml import als_recommend

    recs = als_recommend(inter, n_users=40, k=3).collect()
    assert len(recs) == 120
    for r in recs:
        if r["user"] < 20:
            assert r["item"] < 30, r
        else:
            assert r["item"] >= 30, r


def test_purchase_matrix_shape(spark):
    from time_series_spark_spark.operators.ml import purchase_matrix
    from time_series_spark_spark.sources.io import load

    sf = "/root/testdata/sf0.001"
    m = purchase_matrix(load(spark, sf, "lineitem"), load(spark, sf, "orders"))
    row = m.first()
    assert row["strength"] > 0
    assert m.groupBy("user", "item").count().filter("count > 1").count() == 0


def test_prefixspan_finds_planted_sequence(spark):
    """Every user does view -> click -> purchase (with noise between);
    the gapped pattern must surface with full support."""
    import datetime as dt

    rng = np.random.default_rng(13)
    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for u in range(20):
        t = t0
        for step in ["view", "error", "click", "signup", "purchase"]:
            t += dt.timedelta(minutes=int(rng.integers(1, 30)))
            rows.append((eid, t, u, step, 1.0))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double"
    )
    from time_series_spark_spark.operators.ml import frequent_event_sequences

    out = {
        r["pattern"]: r["freq"]
        for r in frequent_event_sequences(ev, min_support=0.9).collect()
    }
    assert out["view -> click -> purchase"] == 20
    assert out["view"] == 20 and out["purchase"] == 20


def test_fpgrowth_finds_planted_basket(spark):
    """Items 1 and 2 always co-occur: the {1,2} itemset and the 1=>2
    rule (confidence 1.0) must be mined."""
    rng = np.random.default_rng(17)
    rows = []
    for o in range(50):
        rows.append((o, 1, 1.0))
        rows.append((o, 2, 1.0))
        for it in rng.choice(range(10, 40), 3, replace=False):
            rows.append((o, int(it), 1.0))
    li = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_quantity double"
    )
    from time_series_spark_spark.operators.ml import frequent_itemsets

    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("items")
    )
    itemsets, rules = frequent_itemsets(
        baskets, min_support=0.5, min_confidence=0.5
    )
    iset = {r["itemset"]: r["freq"] for r in itemsets.collect()}
    assert iset.get("1,2") == 50
    rdict = {
        (r["antecedent"], r["consequent"]): r["confidence"]
        for r in rules.collect()
    }
    assert rdict.get(("1", "2")) == 1.0


def test_als_precision_at_k_on_planted_blocks(spark):
    """Held-out items come from the user's own taste block, so block-
    structured recommendations must score far above the random-chance
    precision (k/|catalog|)."""
    rng = np.random.default_rng(23)
    rows = []
    for u in range(40):
        items = range(0, 30) if u < 20 else range(30, 60)
        for it in rng.choice(list(items), 16, replace=False):
            rows.append((u, int(it), float(rng.integers(1, 5))))
    inter = spark.createDataFrame(rows, "user long, item long, strength float")
    from time_series_spark_spark.operators.ml import als_precision_at_k

    m = als_precision_at_k(inter, cutoff_frac=0.75, k=5)
    assert m["n_users"] == 40
    # each user: 4 held-out of 18 unseen in-block items; perfect block
    # structure gives E[precision@5] ≈ 4/18 ≈ 0.22 vs ≈ 0.08 chance over
    # all unseen items — assert comfortably above chance
    assert m["precision_at_k"] > 0.12, m
    assert 0 < m["recall_at_k"] <= 1


def test_quality_classifier_learns_planted_gate(spark):
    """N6: synthetic corpus where half the docs fall inside the K6 gate
    (20-80 diverse tokens) and half outside (repetitive or too short);
    the distilled model must reproduce the gate far above chance, and
    the deterministic md5 split must be stable across invocations."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(300)]
    rows = []
    for i in range(400):
        if i % 2 == 0:  # inside the gate: 30-60 distinct-ish tokens
            n = int(rng.integers(30, 60))
            words = rng.choice(vocab, n, replace=False)
        elif i % 4 == 1:  # repetitive: fails distinct_ratio
            words = ["spam"] * int(rng.integers(30, 60))
        else:  # too short
            words = rng.choice(vocab, 5, replace=False)
        rows.append((i, " ".join(words), "en", "web", 0))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    from time_series_spark_spark.operators.ml import text_quality_classifier_auc

    m1 = text_quality_classifier_auc(docs)
    m2 = text_quality_classifier_auc(docs)
    assert m1["auc"] > 0.9, m1
    assert (m1["n_train"], m1["n_test"]) == (m2["n_train"], m2["n_test"])
    assert m1["n_train"] + m1["n_test"] == 400
    # the md5 holdout is a fixed ~1/5 slice, not a random one
    assert 40 <= m1["n_test"] <= 140


def test_aft_session_lifetime_orders_planted_durations(spark):
    """N7: planted sessions where event count drives duration — the AFT
    fit must learn a positive event coefficient, predict long sessions
    longer than short ones, and count the horizon-censored session."""
    rows = []
    base = 1_700_000_000_000_000  # µs epoch
    eid = 0
    for u in range(30):
        long_sess = u % 2 == 0
        n, dur_min = (12, 60) if long_sess else (3, 4)
        step = dur_min * 60_000_000 // (n - 1)
        for k in range(n):
            rows.append(
                (eid, base + u * 10_000_000_000 + k * step, u, "click", 1.0, "{}")
            )
            eid += 1
    # one session still open at the horizon: ends exactly at max ts
    tail = max(r[1] for r in rows)
    rows.append((eid, tail + 3_600_000_000, 99, "click", 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts_us long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    from time_series_spark_spark.operators.ml import aft_session_lifetime

    m = aft_session_lifetime(df)
    assert m["n_sessions"] == 31
    assert m["n_censored"] == 1  # the session at the corpus horizon
    assert m["coef_events"] > 0, m
    # reconstruct per-session predictions implicitly: ended-group mean
    # must sit between the planted 4-min and 60-min levels
    assert 3 < m["mean_pred_ended"] < 70, m


# ---------------------------------------------------------------------------
# N8 deterministic CV tuning + N9 isotonic calibration
# ---------------------------------------------------------------------------

def test_cv_tuning_selects_weak_regularization(spark):
    from time_series_spark_spark.operators.ml import cv_tune_quality_lr
    from time_series_spark_spark.sources.io import load

    docs = load(spark, "/root/testdata/sf0.01", "documents")
    rows = cv_tune_quality_lr(docs)
    assert len(rows) == 3
    assert sum(r["is_best"] for r in rows) == 1
    best = next(r for r in rows if r["is_best"])
    worst = min(rows, key=lambda r: r["avg_auc"])
    # the planted gate is learnable: tuning must find a clearly better
    # grid point than the over-regularized extreme
    assert best["reg_param"] == 0.001
    assert best["avg_auc"] > worst["avg_auc"] + 0.1
    assert best["avg_auc"] > 0.9


def test_cv_fold_assignment_deterministic(spark):
    from pyspark.sql import functions as F
    from time_series_spark_spark.sources.io import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    fold = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
        ).cast("int")
        % 3
    )
    a = {r["doc_id"]: r["f"] for r in docs.select("doc_id", fold.alias("f")).collect()}
    b = {r["doc_id"]: r["f"] for r in docs.repartition(7).select("doc_id", fold.alias("f")).collect()}
    assert a == b  # pure function of the data, invariant to layout
    assert set(a.values()) == {0, 1, 2}


def test_isotonic_calibration_monotone_and_complete(spark):
    from time_series_spark_spark.operators.ml import isotonic_calibration
    from time_series_spark_spark.sources.io import load

    docs = load(spark, "/root/testdata/sf0.01", "documents")
    rows = isotonic_calibration(docs).collect()
    assert 2 <= len(rows) <= 10
    cal = [r["mean_p_calibrated"] for r in rows]  # ordered by decile
    assert all(x <= y + 1e-9 for x, y in zip(cal, cal[1:]))  # monotone
    n = sum(r["n_docs"] for r in rows)
    assert n > 0
    for r in rows:
        assert 0.0 <= r["frac_positive"] <= 1.0
        assert 0.0 <= r["mean_p_calibrated"] <= 1.0


def test_target_encode_oof_excludes_own_fold(spark):
    """N10: enc(key, fold) is the mean over the OTHER folds exactly —
    verified against a by-hand computation with known folds."""
    from pyspark.sql import functions as F

    from time_series_spark_spark.operators.ml import target_encode_oof

    rows = [(i, "k1" if i < 40 else "k2", float(i)) for i in range(60)]
    df = spark.createDataFrame(rows, ["id", "key", "t"])
    enc = target_encode_oof(df, "key", "id", "t", n_folds=3, salt="s")
    # reconstruct folds with the same md5 formula
    folds = {
        r["id"]: r["fold"]
        for r in df.select(
            "id",
            F.expr(
                "CAST(conv(substring(md5(concat('s:', CAST(id AS STRING))),"
                " 1, 8), 16, 10) % 3 AS INT)"
            ).alias("fold"),
        ).collect()
    }
    by_kf = {}
    for i, k, t in rows:
        by_kf.setdefault((k, folds[i]), []).append(t)
    for r in enc.collect():
        other = [
            t
            for (k, f), ts in by_kf.items()
            if k == r["key"] and f != r["fold"]
            for t in ts
        ]
        assert abs(r["oof_mean"] - round(sum(other) / len(other), 4)) < 1e-9
        assert r["n_rows"] == len(by_kf[(r["key"], r["fold"])])


def test_target_encode_oof_deterministic(spark):
    from time_series_spark_spark.operators.ml import target_encode_oof

    rows = [(i, "k", float(i % 7)) for i in range(50)]
    df = spark.createDataFrame(rows, ["id", "key", "t"])
    a = sorted(map(tuple, target_encode_oof(df, "key", "id", "t").collect()))
    b = sorted(map(tuple, target_encode_oof(df, "key", "id", "t").collect()))
    assert a == b


def test_target_encode_oof_single_fold_category_gets_prior(spark):
    """A category whose rows all land in ONE fold has no out-of-fold rows;
    its encoding must fall back to the global prior mean, not null from a
    0/0 division (ADVICE round-5 item)."""
    from pyspark.sql import functions as F

    from time_series_spark_spark.operators.ml import target_encode_oof

    # id=1000 is a singleton category: exactly one row -> one fold only
    rows = [(i, "big", float(i % 10)) for i in range(100)] + [
        (1000, "solo", 42.0)
    ]
    df = spark.createDataFrame(rows, ["id", "key", "t"])
    enc = target_encode_oof(df, "key", "id", "t", n_folds=5, salt="s")
    solo = [r for r in enc.collect() if r["key"] == "solo"]
    assert len(solo) == 1
    prior = sum(t for _, _, t in rows) / len(rows)
    assert solo[0]["oof_mean"] == round(prior, 4)
    # multi-fold categories are untouched by the fallback
    big = [r for r in enc.collect() if r["key"] == "big"]
    assert all(r["oof_mean"] is not None for r in big)


def test_rank_auc_exact_with_ties(spark):
    """rank_auc equals the hand-computed tie-averaged Mann-Whitney AUC
    (= sklearn roc_auc_score semantics) and handles degenerate input."""
    import math

    from time_series_spark_spark.operators.ml import rank_auc

    # scores: pos at {0.9, 0.8, 0.5}, neg at {0.5, 0.3, 0.1}
    # ranks asc: 0.1->1, 0.3->2, 0.5->avg(3,4)=3.5, 0.8->5, 0.9->6
    # R+ = 6 + 5 + 3.5 = 14.5; AUC = (14.5 - 3*4/2) / (3*3) = 8.5/9
    rows = [(0.9, 1.0), (0.8, 1.0), (0.5, 1.0),
            (0.5, 0.0), (0.3, 0.0), (0.1, 0.0)]
    df = spark.createDataFrame(rows, ["p", "label"])
    got = rank_auc(df, label_col="label", score_col="p")
    assert abs(got - 8.5 / 9.0) < 1e-12

    # perfect separation -> 1.0; single class -> nan
    perfect = spark.createDataFrame(
        [(0.9, 1.0), (0.8, 1.0), (0.2, 0.0)], ["p", "label"]
    )
    assert rank_auc(perfect, score_col="p") == 1.0
    onecls = spark.createDataFrame([(0.9, 1.0), (0.1, 1.0)], ["p", "label"])
    assert math.isnan(rank_auc(onecls, score_col="p"))
    # empty test split -> nan, never a TypeError on NULL aggregates
    empty = spark.createDataFrame([], "p double, label double")
    assert math.isnan(rank_auc(empty, score_col="p"))


def test_classifier_survives_observation_in_session(spark):
    """Session-ordering regression (round-6 sweep find): running the A8
    Observation quality gate FIRST used to crash every later
    BinaryClassificationEvaluator.evaluate with 'Task not serializable:
    ObservationManager'. rank_auc is pure DataFrame — immune."""
    from time_series_spark_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    REGISTRY["docs_quality_gate"].fn(spark, sf).collect()
    out = REGISTRY["docs_quality_classifier"].fn(spark, sf).collect()
    assert len(out) == 1 and out[0]["auc"] is not None


def test_kmeans_lloyd_exact_matches_numpy_replica(spark):
    """N11: assignments agree 100% with a plain-numpy implementation of
    the same algorithm (same md5 init, same quantization, same exact
    integer centroid sums) — bit-level determinism, the property MLlib
    KMeans cannot give; clusters beat the random-label baseline."""
    import hashlib

    import numpy as np
    import pandas as pd

    from time_series_spark_spark.operators.ml import kmeans_lloyd_exact
    from time_series_spark_spark.sources.io import load

    sf = "/root/testdata/sf0.01"
    emb = load(spark, sf, "embeddings")
    assigned, cents = kmeans_lloyd_exact(emb, k=10, iters=5)
    got = assigned.toPandas().set_index("vec_id")

    raw = pd.read_parquet(f"{sf}/embeddings.parquet")
    q = np.round(
        np.stack(raw["embedding"].to_numpy()) * 1_000_000
    ).astype(np.int64)
    ids = raw["vec_id"].to_numpy()
    h = np.array([hashlib.md5(str(i).encode()).hexdigest() for i in ids])
    C = q[np.argsort(h)[:10]].astype(float)
    for _ in range(5):
        d = ((q[:, None, :].astype(float) - C[None, :, :]) ** 2).sum(axis=2)
        cid = d.argmin(axis=1)
        for c in range(10):
            m = cid == c
            if m.sum():
                C[c] = q[m].sum(axis=0) / m.sum()
    d = ((q[:, None, :].astype(float) - C[None, :, :]) ** 2).sum(axis=2)
    ref = pd.Series(d.argmin(axis=1), index=ids)
    # align by vec_id: the operator hash-repartitions its cached frame
    # (round-9 parallelism fix), so toPandas row ORDER is not file order
    # — the invariant is per-id assignment equality, not ordering
    assert (got["cid"].reindex(ref.index) == ref).all()
    # final centroids match too (original units)
    assert np.allclose(np.array(cents), C / 1_000_000, atol=1e-9)

    # planted 10-label structure: majority-label purity beats random (0.1)
    pdf = got.join(raw.set_index("vec_id")["label"])
    purity = (
        pdf.groupby("cid")["label"].agg(lambda s: s.value_counts().iloc[0])
    ).sum() / len(pdf)
    assert purity > 0.13

    # two runs are identical (determinism end to end)
    again, _ = kmeans_lloyd_exact(emb, k=10, iters=5)
    a = sorted(map(tuple, assigned.select("vec_id", "cid").collect()))
    b = sorted(map(tuple, again.select("vec_id", "cid").collect()))
    assert a == b
