"""spark.ml training bridge (M1-M4) + MERGE-style upsert semantics."""

from pyspark.sql import functions as F
from lakehouse_architecture_spark.operators.upsert import merge_upsert, touched_partitions
from lakehouse_architecture_spark.pipeline.medallion import silver_to_gold
from lakehouse_architecture_spark.pipeline.ml import train_price_model


def test_train_price_model(spark):
    import random

    random.seed(42)
    rows = [
        (
            str(i),
            random.choice(["HCM", "HN", "DN"]),
            float(random.randint(30, 200)),
            random.randint(1, 5),
            None,
        )
        for i in range(300)
    ]
    # price correlated with area so the model has signal
    rows = [(i, loc, a, b, a * 50.0 + b * 10.0) for (i, loc, a, b, _) in rows]
    silver = spark.createDataFrame(
        rows, "id string, location string, area double, bedrooms int, price double"
    )
    gold = silver_to_gold(silver)
    res = train_price_model(gold, n_trees=20)
    assert res.n_train + res.n_test == 300
    assert res.r2 > 0.8  # near-linear target must be easy for a forest


def test_merge_upsert(spark):
    target = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-01"), (3, "c", "2024-01-02")],
        "id int, v string, dt string",
    )
    updates = spark.createDataFrame(
        [(2, "B", "2024-01-01"), (4, "d", "2024-01-03")], "id int, v string, dt string"
    )
    merged = {(r["id"], r["v"]) for r in merge_upsert(target, updates, ["id"]).collect()}
    assert merged == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}

    # insert-only = the reference's seen-ID ledger: first writer wins
    ledger = {
        (r["id"], r["v"])
        for r in merge_upsert(target, updates, ["id"], insert_only=True).collect()
    }
    assert ledger == {(1, "a"), (2, "b"), (3, "c"), (4, "d")}

    assert sorted(touched_partitions(updates, "dt")) == ["2024-01-01", "2024-01-03"]


def test_text_classifier_learns_separable_vocab(spark):
    import random

    from lakehouse_architecture_spark.pipeline.ml import train_text_classifier

    rnd = random.Random(3)
    pos_vocab = ["alpha", "beta", "gamma", "delta"]
    neg_vocab = ["omega", "sigma", "kappa", "theta"]
    rows = []
    for i in range(200):
        vocab = pos_vocab if i % 2 == 0 else neg_vocab
        text = " ".join(rnd.choice(vocab) for _ in range(8))
        rows.append((text, i % 2 == 0))
    df = spark.createDataFrame(rows, "text string, is_pos boolean").withColumn(
        "label", F.col("is_pos").cast("int")
    )
    r = train_text_classifier(df, "text", "label", n_features=256)
    # disjoint vocabularies: the hashed-BoW model must beat the prior big.
    # 256 features keeps cross-class hash collisions out of the picture;
    # the margin (0.85 not 1.0) absorbs split composition, not model skill
    assert r.accuracy > max(r.majority_baseline, 0.85), (
        r.accuracy, r.majority_baseline, r.n_train, r.n_test
    )
    assert r.n_train + r.n_test == 200


def test_text_classifier_survives_prior_observation(spark):
    """Regression: Spark 4.1 fails any action on model.transform() output
    in a session that ever ran DataFrame.observe (the model's training
    summary drags the non-serializable ObservationManager into the task
    closure). The classifier scores via coefficients to avoid that."""
    from lakehouse_architecture_spark.pipeline.expectations import (
        apply_expectations,
        expect,
    )
    from lakehouse_architecture_spark.pipeline.ml import train_text_classifier

    df0 = spark.createDataFrame([(1, 5.0), (2, -1.0)], "id long, amount double")
    enforced, metrics = apply_expectations(
        df0, [expect("nonneg", "amount >= 0", "drop")]
    )
    enforced.collect()
    metrics.counts()

    rows = [("alpha beta", 1), ("omega sigma", 0)] * 30
    df = spark.createDataFrame(rows, "text string, label int")
    r = train_text_classifier(df, "text", "label", n_features=64)
    assert r.accuracy > 0.9
