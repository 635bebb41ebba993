"""Scheduler adapter: DAG mechanics + the 4-stage reference pipeline on
fixtures (mirrors airflow/dags/realestate_pipeline.py:256-280 without the
Airflow dependency)."""

from lakehouse_architecture_spark.pipeline.scheduler import (
    Dag,
    TaskSpec,
    describe,
    realestate_dag,
    run_dag,
)


def _fake_api(n=30):
    listings = [{"list_id": str(i)} for i in range(n)]

    def fetch_page(offset, limit):
        return listings[offset : offset + limit]

    def fetch_detail(lid):
        i = int(lid)
        return {
            "list_id": lid,
            "title": f"t{lid}",
            "price": f"{1 + i % 5} tỷ",
            "address": "HCM" if i % 2 else "HN",
            "images": [],
            "attrs": {
                "Diện tích đất": f"{40 + i} m2",
                "Số phòng ngủ": str(1 + i % 4),
            },
        }

    return fetch_page, fetch_detail


def test_dag_topo_skip_and_retry():
    calls = {"flaky": 0}

    def flaky():
        calls["flaky"] += 1
        if calls["flaky"] < 2:
            raise RuntimeError("transient")
        return "ok"

    def boom():
        raise RuntimeError("permanent")

    dag = Dag("t")
    dag.add(TaskSpec("a", lambda: 1))
    dag.add(TaskSpec("flaky", flaky, ("a",), retries=2))
    dag.add(TaskSpec("boom", boom, ("a",)))
    dag.add(TaskSpec("after_boom", lambda: 2, ("boom",)))
    dag.add(TaskSpec("after_flaky", lambda: 3, ("flaky",)))
    assert dag.topo_order() == ["a", "flaky", "boom", "after_boom", "after_flaky"]

    runs = run_dag(dag)
    assert runs["a"].state == "success"
    assert runs["flaky"].state == "success" and runs["flaky"].attempts == 2
    assert runs["boom"].state == "failed"
    # downstream of the failure skips; the healthy branch still ran
    assert runs["after_boom"].state == "skipped"
    assert runs["after_flaky"].state == "success"
    assert "boom: failed" in describe(runs)


def test_dag_rejects_cycles_and_unknown_upstream():
    import pytest

    dag = Dag("t")
    dag.add(TaskSpec("a", lambda: 1))
    with pytest.raises(ValueError):
        dag.add(TaskSpec("b", lambda: 2, ("nope",)))


def test_realestate_pipeline_four_stages(spark, tmp_path):
    fetch_page, fetch_detail = _fake_api(30)
    dag = realestate_dag(
        spark,
        fetch_page,
        fetch_detail,
        bronze_dir=str(tmp_path / "bronze"),
        silver_dir=str(tmp_path / "silver"),
        gold_dir=str(tmp_path / "gold"),
    )
    assert dag.topo_order() == [
        "ingest",
        "bronze_to_silver",
        "silver_to_gold",
        "train",
    ]
    runs = run_dag(dag)
    assert all(r.state == "success" for r in runs.values()), describe(runs)
    assert runs["ingest"].result.n_fetched == 30
    assert runs["bronze_to_silver"].result == 30
    assert runs["silver_to_gold"].result == 30
    assert isinstance(runs["train"].result, float)  # an R², whatever its value

    gold = spark.read.parquet(str(tmp_path / "gold"))
    assert {"location_encoded", "price_per_m2"} <= set(gold.columns)
    # HCM→2 / HN→1 encoding made it through the whole chain
    assert {r["location_encoded"] for r in gold.select("location_encoded").distinct().collect()} == {1, 2}
