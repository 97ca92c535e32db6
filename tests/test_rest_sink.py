"""aleph_* upload pattern: injectable-transport REST emitter with
retry/backoff, tag-cached skip across runs, outcomes as a DataFrame
(reference memorious/operations/aleph.py:54-102 semantics)."""

import json
import os

from memorious_spark.operators.rest_sink import (
    aleph_emit_documents, rest_emit,
)
from memorious_spark.plans.storage import RunStore

_API_DIR = "/tmp/fake_aleph_api"


def _make_fake_send(api_dir):
    """Filesystem-backed fake Aleph, defined as a closure so cloudpickle
    ships it by value to executors (the test module itself is not on
    the executor path — exactly like a user's injected HTTP client).
    Flaky ids succeed on the 2nd attempt; 'bad' ids hard-fail."""

    def fake_send(rec):
        from memorious_spark.operators.rest_sink import TransientApiError

        os.makedirs(api_dir, exist_ok=True)
        fid = (rec["foreign_id"] + "." + (rec.get("content_hash") or "")).replace("/", "_")
        if "bad" in fid:
            raise ValueError("permanent rejection")
        if "flaky" in fid:
            marker = os.path.join(api_dir, f"{fid}.attempt")
            if not os.path.exists(marker):
                with open(marker, "w") as fh:
                    fh.write("1")
                raise TransientApiError("try again")
        with open(os.path.join(api_dir, f"{fid}.json"), "w") as fh:
            # map-typed columns arrive as numpy arrays through Arrow
            json.dump(rec, fh, default=list)
        return {"id": f"doc-{fid}"}

    return fake_send


def _no_sleep():
    def f(_s):
        return None
    return f


def test_rest_emit_retry_and_failure(spark):
    import shutil

    shutil.rmtree(_API_DIR, ignore_errors=True)
    rows = spark.createDataFrame(
        [("ok1", "h1"), ("flaky1", "h2"), ("bad1", "h3")],
        "foreign_id string, content_hash string",
    )
    out = {
        r["foreign_id"]: r
        for r in rest_emit(
            rows, _make_fake_send(_API_DIR), retries=3, sleep=_no_sleep()
        ).collect()
    }
    assert out["ok1"]["status"] == "uploaded" and out["ok1"]["attempts"] == 1
    assert out["flaky1"]["status"] == "uploaded" and out["flaky1"]["attempts"] == 2
    assert out["bad1"]["status"] == "error" and out["bad1"]["remote_id"] is None
    assert os.path.exists(f"{_API_DIR}/flaky1.h2.json")


def test_aleph_emit_skips_cached_across_runs(spark, tmp_path):
    import shutil

    shutil.rmtree(_API_DIR, ignore_errors=True)
    send = _make_fake_send(_API_DIR)
    store = RunStore(tmp_path, "alephc", "r1")
    results = spark.createDataFrame(
        [
            ("https://a/1", "h1", "T1", "text/html"),
            ("https://a/2", "h2", "T2", "application/pdf"),
        ],
        "url string, content_hash string, title string, content_type string",
    )
    out1 = aleph_emit_documents(
        spark, store, results, send, "coll", sleep=_no_sleep()
    )
    assert {r["status"] for r in out1.collect()} == {"uploaded"}

    # run 2: one unchanged row (skipped, no API call), one new content
    results2 = spark.createDataFrame(
        [
            ("https://a/1", "h1", "T1", "text/html"),       # cached
            ("https://a/1", "h1b", "T1v2", "text/html"),    # content changed
        ],
        "url string, content_hash string, title string, content_type string",
    )
    os.remove(f"{_API_DIR}/https:__a_1.h1.json")  # prove no re-upload happens
    out2 = {
        (r["foreign_id"], r["content_hash"]): r["status"]
        for r in aleph_emit_documents(
            spark, store, results2, send, "coll", sleep=_no_sleep()
        ).collect()
    }
    assert out2[("https://a/1", "h1")] == "skipped_cached"
    assert out2[("https://a/1", "h1b")] == "uploaded"
    assert not os.path.exists(f"{_API_DIR}/https:__a_1.h1.json")
    assert os.path.exists(f"{_API_DIR}/https:__a_1.h1b.json")
    # uploaded table now carries all three upload records
    assert store.read_shared(spark, "uploaded_coll").count() == 3

def test_aleph_folders_cache_replays_folder_id(spark, tmp_path):
    """aleph_folder (aleph.py:105-137): folder docs keyed by bare
    foreign_id; a second run skips the API but REPLAYS the cached
    folder id (children must still be able to parent against it)."""
    import shutil

    shutil.rmtree(_API_DIR, ignore_errors=True)
    from memorious_spark.operators.rest_sink import aleph_folders

    send = _make_fake_send(_API_DIR)
    store = RunStore(tmp_path, "alephf", "r1")
    folders = spark.createDataFrame(
        [("dir-a", "Folder A"), ("dir-b", "Folder B")],
        "foreign_id string, title string",
    )
    out1 = {
        r["foreign_id"]: r
        for r in aleph_folders(spark, store, folders, send, "col1").collect()
    }
    assert out1["dir-a"]["status"] == "uploaded"
    fid_a = out1["dir-a"]["remote_id"]
    assert fid_a is not None
    # payload was a folder shape: no content_hash key needed, folder flag
    with open(f"{_API_DIR}/dir-a..json") as fh:
        payload = json.load(fh)
    assert payload["folder"] is True and payload["title"] == "Folder A"

    out2 = {
        r["foreign_id"]: r
        for r in aleph_folders(
            spark, RunStore(tmp_path, "alephf", "r2"), folders, send, "col1"
        ).collect()
    }
    assert out2["dir-a"]["status"] == "skipped_cached"
    assert out2["dir-a"]["remote_id"] == fid_a  # cached id replayed


def test_aleph_emit_entities_keyed_by_entity_id(spark, tmp_path):
    """aleph_emit_entity (aleph.py:139-190): FtM entity payloads keyed
    (foreign_id, entity_id); cached entities skip with stored id."""
    import shutil

    shutil.rmtree(_API_DIR, ignore_errors=True)
    from memorious_spark.operators.rest_sink import aleph_emit_entities

    send = _make_fake_send(_API_DIR)
    store = RunStore(tmp_path, "alephe", "r1")
    ents = spark.createDataFrame(
        [
            ("https://a/1", "e1", "Person", {"name": ["Jane"]}),
            ("https://a/2", "e2", "Company", {"name": ["Acme"]}),
        ],
        "foreign_id string, entity_id string, schema string, "
        "properties map<string, array<string>>",
    )
    out1 = {
        r["entity_id"]: r
        for r in aleph_emit_entities(spark, store, ents, send, "colE").collect()
    }
    assert out1["e1"]["status"] == "uploaded"
    out2 = {
        r["entity_id"]: r
        for r in aleph_emit_entities(
            spark, RunStore(tmp_path, "alephe", "r2"), ents, send, "colE"
        ).collect()
    }
    assert out2["e1"]["status"] == "skipped_cached"
    assert out2["e1"]["remote_id"] == out1["e1"]["remote_id"]


def test_rest_emit_waves_backoff_on_driver(spark):
    """The no-executor-sleeps variant: transient rows re-emit in later
    WAVES with the backoff slept once per wave on the DRIVER; outcome
    contract (statuses, attempt counts, exhaustion) matches
    rest_emit's in-executor loop."""
    import shutil

    from memorious_spark.operators.rest_sink import rest_emit_waves

    api = "/tmp/fake_aleph_api_waves"
    shutil.rmtree(api, ignore_errors=True)
    rows = spark.createDataFrame(
        [("ok1", "h1"), ("flaky1", "h2"), ("bad1", "h3")],
        "foreign_id string, content_hash string",
    )
    driver_sleeps = []
    out = {
        r["foreign_id"]: r
        for r in rest_emit_waves(
            rows, _make_fake_send(api), retries=3,
            sleep=driver_sleeps.append,
        ).collect()
    }
    assert out["ok1"]["status"] == "uploaded" and out["ok1"]["attempts"] == 1
    assert out["flaky1"]["status"] == "uploaded"
    assert out["flaky1"]["attempts"] == 2  # succeeded in wave 2
    assert out["bad1"]["status"] == "error" and out["bad1"]["attempts"] == 1
    # exactly one driver-side backoff (before wave 2), 2.0**1 seconds
    assert driver_sleeps == [2.0]

    # exhaustion parity: an always-transient id surfaces after
    # retries+1 waves with transient_exhausted
    def always_transient(rec):
        from memorious_spark.operators.rest_sink import TransientApiError

        raise TransientApiError("down")

    sleeps2 = []
    out2 = rest_emit_waves(
        spark.createDataFrame([("t1", "h")], "foreign_id string, content_hash string"),
        always_transient, retries=2, sleep=sleeps2.append,
    ).collect()
    assert [(r["status"], r["attempts"]) for r in out2] == [
        ("transient_exhausted", 3)
    ]
    assert sleeps2 == [2.0, 4.0]
